"""Inner-loop gating (meta.inner_start_step): before the gate the meta
step must reduce EXACTLY to query-batch training; after it, to the
standard meta step. Analytic on the quadratic family + trainer wiring.
Motivation: docs/DESIGN.md section 8 (the conformer's inner loop is
chaotic at init; inner_lr=0 trains fine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaasr_tpu.meta.maml import MetaAlgoConfig, maml_grads
from tests.test_m5_meta import _setup, quad_loss


def _batch(c_s, c_q):
    return {"support": {"c": c_s[None]}, "query": {"c": c_q[None]}}


def test_scale_zero_is_plain_query_grad():
    w, c_s, c_q, _ = _setup()
    for first_order in (True, False):
        cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=3,
                             first_order=first_order)
        grads, _ = maml_grads(quad_loss, cfg)(
            {"w": w}, _batch(c_s, c_q), jax.random.PRNGKey(0),
            inner_scale=jnp.float32(0.0))
        # inner loop gated off -> d/dw 0.5||w - c_q||^2 = w - c_q, both orders
        np.testing.assert_allclose(np.asarray(grads["w"]),
                                   np.asarray(w - c_q), rtol=1e-6)


def test_scale_one_matches_ungated():
    w, c_s, c_q, w_k = _setup()
    cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=3, first_order=True)
    g_gated, _ = maml_grads(quad_loss, cfg)(
        {"w": w}, _batch(c_s, c_q), jax.random.PRNGKey(0),
        inner_scale=jnp.float32(1.0))
    g_plain, _ = maml_grads(quad_loss, cfg)(
        {"w": w}, _batch(c_s, c_q), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(g_gated["w"]),
                               np.asarray(g_plain["w"]), rtol=1e-6)
    # and both are the FOMAML analytic value (w_k - c_q)
    np.testing.assert_allclose(np.asarray(g_gated["w"]),
                               np.asarray(w_k - c_q), rtol=1e-5)


def test_gate_is_jittable_switch():
    """One compiled function, the gate flips with the traced step value —
    exactly how the trainer uses it (no retrace at the boundary)."""
    w, c_s, c_q, w_k = _setup()
    cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=3, first_order=True)
    grad_fn = maml_grads(quad_loss, cfg)

    @jax.jit
    def step_grad(step):
        scale = (step >= 5).astype(jnp.float32)
        g, _ = grad_fn({"w": w}, _batch(c_s, c_q), jax.random.PRNGKey(0),
                       inner_scale=scale)
        return g["w"]

    np.testing.assert_allclose(np.asarray(step_grad(jnp.int32(2))),
                               np.asarray(w - c_q), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(step_grad(jnp.int32(7))),
                               np.asarray(w_k - c_q), rtol=1e-5)


def test_trainer_inner_scale_and_reptile_guard():
    from metaasr_tpu.config import Config
    from metaasr_tpu.train.meta_train import MetaASRTrainer, algo_config

    cfg = Config()
    cfg.meta.algo = "reptile"
    cfg.meta.inner_start_step = 100
    with pytest.raises(ValueError, match="inner_start_step is incompatible"):
        algo_config(cfg)
    cfg.meta.algo = "fomaml"
    scale_fn = MetaASRTrainer._inner_scale
    fake = type("T", (), {"cfg": cfg})()
    assert float(scale_fn(fake, jnp.int32(99))) == 0.0
    assert float(scale_fn(fake, jnp.int32(100))) == 1.0
    cfg.meta.inner_start_step = 0
    assert scale_fn(fake, jnp.int32(0)) is None


@pytest.mark.slow
def test_gated_meta_trainer_end_to_end(synthetic_data_dir, tmp_path):
    """Trainer-level: with the gate beyond max_steps, the meta params
    after N steps are IDENTICAL to a run whose inner_lr is 0 — the gate
    really reduces the step to query-batch training."""
    from tests.test_m5_meta_asr import _make_trainer

    def run(tag, **cfg_edits):
        trainer, _ = _make_trainer(synthetic_data_dir, tmp_path / tag,
                                   "fomaml", arch="transformer",
                                   meta_overrides=cfg_edits)
        return trainer.meta_train(max_steps=3)

    s_gated = run("gated", inner_start_step=1000)
    s_ilr0 = run("ilr0", inner_lr=0.0)
    for a, b in zip(jax.tree_util.tree_leaves(s_gated.params),
                    jax.tree_util.tree_leaves(s_ilr0.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
