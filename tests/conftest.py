"""Test env: force the jax CPU backend with 8 virtual devices so real
pjit/Mesh code runs in CI without a pod (SURVEY.md section 4.5).

Must run before any module imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pre-registers the TPU plugin and pins
# JAX_PLATFORMS=axon before conftest runs; override via jax.config too.
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the compile-heavy smoke tests dominate suite
# time; cached reruns are ~5x faster
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform == "cpu" and jax.device_count() == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_data_dir(tmp_path_factory):
    """Small synthetic multi-accent dataset shared across tests."""
    from metaasr_tpu.data.synthetic import generate_dataset

    d = tmp_path_factory.mktemp("synth")
    generate_dataset(str(d), accents=("alpha", "bravo", "echo", "delta"),
                     utts_per_accent=12, words_per_utt=(1, 2), seed=0)
    return str(d)
