"""M7: scale-path pieces — grain loader iterator state, distributed
helpers, mesh factory, sharded ASR meta-step on 8 CPU devices."""

import jax
import numpy as np
import pytest

from metaasr_tpu.data.dataset import load_accent_datasets
from metaasr_tpu.data.tokenizer import CharTokenizer


def test_grain_loader_checkpointable(synthetic_data_dir):
    pytest.importorskip("grain")
    from metaasr_tpu.data.grain_loader import (
        make_grain_loader,
        restore_iterator_state,
        save_iterator_state,
    )

    tok = CharTokenizer.ascii_default()
    dsets = load_accent_datasets(synthetic_data_dir, tok)
    it = make_grain_loader(list(dsets.values()), 4, 32000, 16, seed=0)
    _ = next(it)
    state = save_iterator_state(it)
    nxt = next(it)
    it2 = make_grain_loader(list(dsets.values()), 4, 32000, 16, seed=0)
    restore_iterator_state(it2, state)
    nxt2 = next(it2)
    assert np.array_equal(nxt["audio"], nxt2["audio"])
    assert nxt["texts"] == nxt2["texts"]


def test_distributed_helpers_single_host():
    from metaasr_tpu.parallel.distributed import host_local_slice, initialize

    initialize()  # no-op single host
    assert jax.process_count() == 1
    s = host_local_slice(8)
    assert (s.start, s.stop) == (0, 8)


def test_mesh_shapes():
    from metaasr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # all 8 cpu devices on task axis
    assert mesh.shape == {"task": 8, "data": 1}
    mesh = make_mesh(num_task=2)
    assert mesh.shape == {"task": 2, "data": 4}
    with pytest.raises(ValueError):
        make_mesh(num_task=3)


def test_sharded_asr_meta_step_runs():
    """The full ASR FOMAML step executes on a real (4,2) CPU mesh via the
    driver-entry code path."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
