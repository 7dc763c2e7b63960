"""Multi-host initialization (SURVEY.md section 5.8; BASELINE.json:11).

The reference has no distributed backend. Pod-scale runs here need exactly
one call per process before any jax op:

    from metaasr_tpu.parallel.distributed import initialize
    initialize()   # no-op single-host; env/TPU-metadata driven on pods

After it, ``jax.devices()`` spans the slice and the ('task','data') mesh
from parallel/mesh.py covers all chips; pjit handles cross-host ICI/DCN
collectives transparently. Data loading: each host feeds its addressable
shard — ``host_local_slice`` computes which meta-batch rows this host owns,
and ``jax.make_array_from_process_local_data`` assembles the global array.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding


def _multihost_env_present() -> bool:
    import os

    return bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")) or \
        os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Idempotent jax.distributed.initialize with single-host fallback.

    When the environment says this IS a multi-host pod (explicit coordinator
    args, or MEGASCALE/TPU_WORKER_HOSTNAMES env), a failed rendezvous is
    FATAL: swallowing it would silently degrade an N-host run into N
    independent single-host replicas training divergently.
    """
    if jax.process_count() > 1:
        return  # already initialized
    expected_multihost = bool(coordinator_address or num_processes) or \
        _multihost_env_present()
    try:
        if coordinator_address or num_processes:
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id)
        elif _multihost_env_present():
            # TPU pods: auto-detected from the metadata server / env
            jax.distributed.initialize()
    except Exception as e:
        if expected_multihost:
            raise RuntimeError(
                "multi-host environment detected (coordinator args or "
                "MEGASCALE/TPU_WORKER_HOSTNAMES set) but "
                "jax.distributed.initialize failed — refusing to continue "
                "as divergent single-host replicas") from e
        # genuinely single host: nothing to initialize
    else:
        if expected_multihost:
            import logging

            logging.getLogger(__name__).info(
                "jax.distributed: process %d/%d",
                jax.process_index(), jax.process_count())


def host_local_slice(global_rows: int) -> slice:
    """Rows of the leading (task) axis owned by this host for data feeding."""
    per = global_rows // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def make_global_meta_batch(mesh: Mesh, local_batch: dict, sharding_fn) -> dict:
    """Assemble a globally-sharded meta batch from per-host local arrays
    (multi-host pods; single-host this is just device_put)."""
    def put(x):
        sh: NamedSharding = sharding_fn(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    out = {}
    for side in ("support", "query"):
        out[side] = {k: put(v) for k, v in local_batch[side].items()
                     if k != "texts"}
    return out
