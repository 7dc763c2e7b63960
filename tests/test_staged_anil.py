"""Staged ANIL (meta.adapt_widen_step): the inner loop adapts only the
adapt_filter leaves until a chosen outer step, then widens to all leaves
— composing the two working conformer fixes (decoder-only ANIL + the
inner_start warm gate; docs/DESIGN.md section 8). Analytic checks on the
two-leaf quadratic family pin both endpoints of the gate: widen=0 IS
plain ANIL, widen=1 IS the unfiltered inner loop (SURVEY.md section 4.3
methodology)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaasr_tpu.meta.maml import (
    MetaAlgoConfig,
    make_inner_adapt,
    maml_grads,
    wrap_lr,
)
from tests.test_anil import _setup, two_leaf_loss


def _cfgs(lr=0.1, k=3, first_order=True, learn_inner_lr=False):
    common = dict(inner_lr=lr, inner_steps=k, first_order=first_order,
                  learn_inner_lr=learn_inner_lr)
    return (MetaAlgoConfig(adapt_filter=("head",), **common),
            MetaAlgoConfig(**common))  # (filtered, unfiltered)


def test_widen_zero_is_plain_anil_and_one_is_unfiltered():
    w, v, c_s, c2_s, *_ , w_k = _setup()
    filt, full = _cfgs()
    params = {"head": {"w": w}, "body": {"v": v}}
    batch = {"c": c_s, "c2": c2_s}
    key = jax.random.PRNGKey(0)

    gated = make_inner_adapt(two_leaf_loss, filt)
    # widen gate OFF: frozen leaf bit-identical (p - lr*0*g == p exactly)
    a0, _ = gated(params, batch, key, widen_scale=jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(a0["body"]["v"]),
                                  np.asarray(v))
    np.testing.assert_allclose(np.asarray(a0["head"]["w"]),
                               np.asarray(w_k), rtol=1e-5)
    # widen gate ON: bit-identical to the unfiltered inner loop
    # (multiplying the update by float 1.0 is exact)
    a1, _ = gated(params, batch, key, widen_scale=jnp.float32(1.0))
    ref, _ = make_inner_adapt(two_leaf_loss, full)(params, batch, key)
    for got, want in zip(jax.tree_util.tree_leaves(a1),
                         jax.tree_util.tree_leaves(ref)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("first_order", [True, False])
def test_staged_meta_gradient_matches_both_endpoints(first_order):
    """maml_grads under the widen gate equals ANIL's meta-gradient at 0
    and the unfiltered algorithm's at 1 — for FOMAML and full MAML."""
    w, v, c_s, c2_s, c_q, c2_q, _ = _setup()
    filt, full = _cfgs(first_order=first_order)
    params = {"head": {"w": w}, "body": {"v": v}}
    batch = {"support": {"c": c_s[None], "c2": c2_s[None]},
             "query": {"c": c_q[None], "c2": c2_q[None]}}
    key = jax.random.PRNGKey(0)

    staged = maml_grads(two_leaf_loss, filt)
    for scale, ref_cfg in ((0.0, filt), (1.0, full)):
        got, _ = staged(params, batch, key,
                        widen_scale=jnp.float32(scale))
        ref_fn = maml_grads(two_leaf_loss, ref_cfg)
        want, _ = ref_fn(params, batch, key)
        for g, r in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-6)


def test_widen_trains_learned_rates_of_widened_leaves():
    """Meta-SGD x staged ANIL: while the gate is closed the body's learned
    rate gets ZERO outer gradient (its update is gated off and the rate
    rides only the gated term); once open, the rate gradient flows."""
    w, v, c_s, c2_s, c_q, c2_q, _ = _setup()
    filt, _ = _cfgs(learn_inner_lr=True)
    grad_fn = maml_grads(two_leaf_loss, filt)
    params = wrap_lr({"head": {"w": w}, "body": {"v": v}}, 0.1)
    batch = {"support": {"c": c_s[None], "c2": c2_s[None]},
             "query": {"c": c_q[None], "c2": c2_q[None]}}
    g0, _ = grad_fn(params, batch, jax.random.PRNGKey(0),
                    widen_scale=jnp.float32(0.0))
    assert float(np.abs(np.asarray(g0["inner_lr"]["body"]["v"]))) == 0.0
    g1, _ = grad_fn(params, batch, jax.random.PRNGKey(0),
                    widen_scale=jnp.float32(1.0))
    assert float(np.abs(np.asarray(g1["inner_lr"]["body"]["v"]))) > 0.0


def test_algo_config_widen_requires_filter():
    from metaasr_tpu.config import Config
    from metaasr_tpu.train.meta_train import algo_config

    cfg = Config()
    cfg.meta.algo = "fomaml"
    cfg.meta.adapt_widen_step = 100
    with pytest.raises(ValueError, match="requires meta.adapt_filter"):
        algo_config(cfg)
    cfg.meta.adapt_filter = "ctc_head"
    algo_config(cfg)  # valid once the filter exists


def test_trainer_widen_scale_schedule():
    from metaasr_tpu.train.meta_train import MetaASRTrainer

    class Stub:
        class cfg:
            class meta:
                adapt_widen_step = 5

    fn = MetaASRTrainer._widen_scale
    assert float(fn(Stub(), jnp.int32(4))) == 0.0
    assert float(fn(Stub(), jnp.int32(5))) == 1.0
    Stub.cfg.meta.adapt_widen_step = 0
    assert fn(Stub(), jnp.int32(4)) is None


@pytest.mark.slow
def test_staged_anil_trainer_end_to_end(synthetic_data_dir, tmp_path):
    """Trainer-level: widen mid-run, and meta-test adaptation uses the
    END-state inner loop — the encoder MOVES under meta_adapt (contrast
    test_anil_meta_trainer_end_to_end, where it stays frozen)."""
    from tests.test_m5_meta_asr import _make_trainer

    trainer, cfg = _make_trainer(
        synthetic_data_dir, tmp_path, "fomaml", arch="transformer",
        adapt_filter="ctc_head,decoder",
        meta_overrides={"adapt_widen_step": 2})
    state = trainer.meta_train(max_steps=4)
    assert int(state.step) == 4
    heldout = next(iter(trainer.heldout_datasets.values()))
    adapted, _ = trainer.meta_adapt(state.params, heldout)
    enc_moved = any(
        not np.array_equal(np.asarray(b), np.asarray(a))
        for b, a in zip(jax.tree_util.tree_leaves(state.params["encoder"]),
                        jax.tree_util.tree_leaves(adapted["encoder"])))
    assert enc_moved
