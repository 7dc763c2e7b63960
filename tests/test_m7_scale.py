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


@pytest.mark.slow
def test_meta_trainer_with_mesh(synthetic_data_dir, tmp_path):
    """MetaASRTrainer end-to-end on a real (4,2) mesh: task-sharded meta
    batches, replicated state, 2 optimizer steps."""
    from metaasr_tpu.config import Config
    from metaasr_tpu.parallel.mesh import make_mesh
    from metaasr_tpu.train.meta_train import MetaASRTrainer
    from metaasr_tpu.train.task import ASRTask

    tok = CharTokenizer.ascii_default()
    cfg = Config()
    cfg.model.arch = "transformer"
    cfg.model.vocab_size = tok.vocab_size
    cfg.model.d_model = 32
    cfg.model.num_heads = 2
    cfg.model.d_ff = 64
    cfg.model.num_encoder_layers = 2
    cfg.model.num_decoder_layers = 2
    cfg.model.dtype = "float32"
    cfg.meta.tasks_per_batch = 4
    cfg.meta.k_support = 2
    cfg.meta.k_query = 2
    cfg.meta.inner_steps = 2
    cfg.data.max_frames = 100
    cfg.data.max_tokens = 16
    cfg.frontend.use_pallas = False
    cfg.train.log_every = 10**9
    cfg.train.eval_every = 10**9
    cfg.train.ckpt_every = 10**9
    dsets = load_accent_datasets(synthetic_data_dir, tok)
    mesh = make_mesh(num_task=4)
    trainer = MetaASRTrainer(cfg, ASRTask(cfg, tok.sos_eos_id), dsets, {},
                             tok, str(tmp_path), mesh=mesh)
    state = trainer.meta_train(max_steps=2)
    assert int(state.step) == 2


def test_true_multiprocess_feeding_matches_single_process():
    """Spawns 2 REAL processes (4 virtual CPU devices each) joined by
    jax.distributed.initialize into one 8-device mesh; each process feeds
    only its own meta-batch rows (host_local_slice +
    make_array_from_process_local_data). FOMAML losses must equal the
    single-process 8-device run bit-for-bit (scripts/multihost_smoke.py)."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "multihost_smoke.py")
    out = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout
