"""Optimizer schedule, checkpoint best/latest, logger."""

import json

import jax.numpy as jnp
import numpy as np

from metaasr_tpu.config import OptimizerConfig
from metaasr_tpu.train.checkpoint import CheckpointManager
from metaasr_tpu.train.logging import MetricLogger
from metaasr_tpu.train.optimizer import make_optimizer, noam_schedule


def test_noam_schedule_shape():
    sched = noam_schedule(1.0, d_model=256, warmup_steps=100)
    lrs = [float(sched(s)) for s in [0, 50, 99, 100, 400, 10000]]
    # rises during warmup
    assert lrs[0] < lrs[1] < lrs[2]
    # decays after warmup
    assert lrs[3] > lrs[4] > lrs[5]
    # peak approx at warmup boundary: d^-0.5 * warmup^-0.5
    np.testing.assert_allclose(lrs[3], 256 ** -0.5 * 100 ** -0.5, rtol=0.05)


def test_make_optimizer_variants():
    import optax

    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.full(3, 0.1)}
    for name, sched in [("adam", "noam"), ("adam", "constant"),
                        ("adadelta", "constant"), ("sgd", "constant")]:
        opt = make_optimizer(OptimizerConfig(name=name, schedule=sched, lr=0.1))
        state = opt.init(params)
        updates, state = opt.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert np.all(np.isfinite(np.asarray(new["w"])))


def test_checkpoint_best_and_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
    state = {"w": jnp.zeros(4), "step": jnp.asarray(0)}
    mgr.save(1, {"w": jnp.ones(4), "step": jnp.asarray(1)}, is_best=True)
    mgr.save(2, {"w": jnp.full(4, 2.0), "step": jnp.asarray(2)}, is_best=False)
    mgr.wait()
    latest, step = mgr.restore(state)
    assert step == 2 and float(latest["w"][0]) == 2.0
    best = mgr.restore_best(state)
    assert best is not None and float(best["w"][0]) == 1.0
    mgr.close()


def test_metric_logger_jsonl(tmp_path):
    lg = MetricLogger(str(tmp_path))
    lg.log(1, {"loss": 1.5})
    lg.log_text(1, "sample", "hyp vs ref")
    lg.close()
    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[1]["tag"] == "sample"


def test_average_checkpoints(tmp_path):
    from flax import struct

    from metaasr_tpu.train.checkpoint import average_checkpoints

    @struct.dataclass
    class S:
        params: dict
        step: int

    mgr = CheckpointManager(str(tmp_path / "avg"), keep=5)
    for i, v in enumerate([1.0, 2.0, 6.0]):
        mgr.save(i + 1, S(params={"w": jnp.full(3, v)}, step=i + 1))
    mgr.wait()
    tmpl = S(params={"w": jnp.zeros(3)}, step=0)
    avg = average_checkpoints(mgr, tmpl)
    np.testing.assert_allclose(np.asarray(avg["w"]), 3.0)
    avg2 = average_checkpoints(mgr, tmpl, last_n=2)
    np.testing.assert_allclose(np.asarray(avg2["w"]), 4.0)
    mgr.close()


def test_checkpoint_keep_ring(tmp_path):
    """keep=N retains the last N latest checkpoints (needed for
    --avg-last N model averaging; train.keep_ckpts config)."""
    mgr = CheckpointManager(str(tmp_path / "ring"), keep=3)
    for i in range(1, 6):
        mgr.save(i, {"w": jnp.full(2, float(i))})
    mgr.wait()
    steps = sorted(mgr._mgr.all_steps())
    assert steps == [3, 4, 5]
    mgr.close()


def test_ctc_pallas_batch_block_selection():
    """pick_batch_block: sublane-aligned, capped, VMEM-bounded."""
    from metaasr_tpu.ops.ctc_pallas import (
        BATCH_BLOCK,
        MAX_BATCH_BLOCK,
        fits_vmem,
        pick_batch_block,
    )

    assert pick_batch_block(3, 100, 128) == 8
    assert pick_batch_block(16, 100, 128) == 16
    assert pick_batch_block(40, 100, 128) == 32   # pad 40 -> 64, 2 blocks
    assert pick_batch_block(1000, 100, 128) == MAX_BATCH_BLOCK
    # long T: wide blocks exceed VMEM, shrinks toward the sublane block
    assert pick_batch_block(32, 500, 128) == 16
    assert pick_batch_block(32, 700, 128) == BATCH_BLOCK
    assert fits_vmem(700, 128, BATCH_BLOCK)
    # extreme T: even the minimum block overflows VMEM -> caller falls
    # back to the scan backend (ctc_forward_pallas checks fits_vmem)
    assert not fits_vmem(7000, 128)


def test_nan_check_raises_on_nan():
    """--debug-nans (SURVEY.md section 5.2): jax_debug_nans must surface a
    NaN produced inside jitted compute as an exception, and switch off
    cleanly."""
    import jax
    import pytest

    from metaasr_tpu.utils.profiling import nan_check

    nan_check(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(
                jax.jit(lambda x: jnp.log(x) * 0.0 + x)(jnp.zeros(3) - 1.0)
                * jnp.nan)
    finally:
        nan_check(False)
