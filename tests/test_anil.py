"""ANIL partial inner adaptation (meta.adapt_filter): analytic meta-
gradients on a two-leaf quadratic family, mask/path semantics, the
inner-clip interaction, config plumbing, and the trainer end-to-end
freeze guarantee. Motivation and the conformer dissection that led here:
docs/DESIGN.md section 8 (SURVEY.md section 4.3 methodology)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaasr_tpu.meta.maml import (
    MetaAlgoConfig,
    adapt_mask,
    make_inner_adapt,
    maml_grads,
)


def two_leaf_loss(params, batch, rng, train):
    """0.5||w - c||^2 + 0.5||v - c2||^2 — separable, so the filtered
    inner SGD has a closed form per leaf."""
    del rng, train
    dw = params["head"]["w"] - batch["c"]
    dv = params["body"]["v"] - batch["c2"]
    return 0.5 * jnp.sum(dw * dw) + 0.5 * jnp.sum(dv * dv), {}


def _setup(d=4, k=3, lr=0.1, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal(d).astype(np.float32))
    w, v, c_s, c2_s, c_q, c2_q = (mk() for _ in range(6))
    w_k = c_s + (1 - lr) ** k * (w - c_s)  # adapted leaf, closed form
    return w, v, c_s, c2_s, c_q, c2_q, w_k


def test_adapt_mask_paths_and_no_match_raises():
    tree = {"encoder": {"layer_0": {"kernel": jnp.ones(2)}},
            "ctc_head": {"bias": jnp.ones(2)}}
    m = adapt_mask(tree, ("ctc_head",))
    assert m["ctc_head"]["bias"] is True
    assert m["encoder"]["layer_0"]["kernel"] is False
    # patterns are path substrings, not just top-level keys
    m2 = adapt_mask(tree, ("layer_0",))
    assert m2["encoder"]["layer_0"]["kernel"] is True
    assert m2["ctc_head"]["bias"] is False
    with pytest.raises(ValueError, match="matches no parameter leaf"):
        adapt_mask(tree, ("decoder",))


def test_inner_adapt_filter_freezes_leaves():
    w, v, c_s, c2_s, *_, w_k = _setup()
    cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=3, first_order=True,
                         adapt_filter=("head",))
    inner = make_inner_adapt(two_leaf_loss, cfg)
    adapted, _ = inner({"head": {"w": w}, "body": {"v": v}},
                       {"c": c_s, "c2": c2_s}, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(adapted["head"]["w"]),
                               np.asarray(w_k), rtol=1e-5)
    # the frozen leaf is BIT-identical, not merely close
    np.testing.assert_array_equal(np.asarray(adapted["body"]["v"]),
                                  np.asarray(v))


def test_fomaml_anil_gradient_analytic():
    """Adapted leaf: query grad at the adapted point (w_k - c_q).
    Frozen leaf: identity Jacobian + direct use in the query loss
    -> plain query grad at the UN-adapted value (v - c2_q)."""
    w, v, c_s, c2_s, c_q, c2_q, w_k = _setup()
    cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=3, first_order=True,
                         adapt_filter=("head",))
    grad_fn = maml_grads(two_leaf_loss, cfg)
    batch = {"support": {"c": c_s[None], "c2": c2_s[None]},
             "query": {"c": c_q[None], "c2": c2_q[None]}}
    grads, _ = grad_fn({"head": {"w": w}, "body": {"v": v}}, batch,
                       jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(grads["head"]["w"]),
                               np.asarray(w_k - c_q), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["body"]["v"]),
                               np.asarray(v - c2_q), rtol=1e-5)


def test_maml_anil_second_order_gradient_analytic():
    """Full MAML through the filtered inner loop: dq/dw picks up the
    (1-lr)^k Jacobian of the adapted leaf; dq/dv stays the plain query
    grad (the frozen leaf's inner Jacobian is exactly identity)."""
    k, lr = 3, 0.1
    w, v, c_s, c2_s, c_q, c2_q, w_k = _setup(k=k, lr=lr)
    cfg = MetaAlgoConfig(inner_lr=lr, inner_steps=k, first_order=False,
                         adapt_filter=("head",))
    grad_fn = maml_grads(two_leaf_loss, cfg)
    batch = {"support": {"c": c_s[None], "c2": c2_s[None]},
             "query": {"c": c_q[None], "c2": c2_q[None]}}
    grads, _ = grad_fn({"head": {"w": w}, "body": {"v": v}}, batch,
                       jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(grads["head"]["w"]),
                               (1 - lr) ** k * np.asarray(w_k - c_q),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["body"]["v"]),
                               np.asarray(v - c2_q), rtol=1e-5)


def test_inner_clip_norm_over_adapted_leaves_only():
    """A frozen leaf's (unused) huge gradient must not shrink the clip
    scale of the adapted leaves."""
    w, v, c_s, _, *_ = _setup()
    c2_far = v + 1e4  # frozen leaf's gradient norm ~1e4
    clip = 1e3  # far above the adapted leaf's grad norm (~O(1))
    cfg = MetaAlgoConfig(inner_lr=0.1, inner_steps=1, first_order=True,
                         adapt_filter=("head",), inner_clip=clip)
    inner = make_inner_adapt(two_leaf_loss, cfg)
    adapted, _ = inner({"head": {"w": w}, "body": {"v": v}},
                       {"c": c_s, "c2": -c2_far}, jax.random.PRNGKey(0))
    # unclipped single SGD step on w (scale must be exactly 1)
    np.testing.assert_allclose(np.asarray(adapted["head"]["w"]),
                               np.asarray(w - 0.1 * (w - c_s)), rtol=1e-5)


def test_algo_config_adapt_filter_plumbing():
    from metaasr_tpu.config import Config
    from metaasr_tpu.train.meta_train import algo_config

    cfg = Config()
    cfg.meta.algo = "fomaml"
    cfg.meta.adapt_filter = " ctc_head, decoder "
    assert algo_config(cfg).adapt_filter == ("ctc_head", "decoder")
    cfg.meta.adapt_filter = ""
    assert algo_config(cfg).adapt_filter is None
    cfg.meta.adapt_filter = "ctc_head"
    cfg.meta.algo = "reptile"
    with pytest.raises(ValueError, match="adapt_filter is incompatible"):
        algo_config(cfg)


@pytest.mark.slow
def test_anil_meta_trainer_end_to_end(synthetic_data_dir, tmp_path):
    """Trainer-level: FOMAML+ANIL trains, and meta_adapt with the filter
    returns params whose encoder subtree is bit-identical to the meta
    params (frozen) while the heads moved."""
    from tests.test_m5_meta_asr import _make_trainer

    # the filter goes in BEFORE construction: the trainer builds its
    # grad_fn in __init__, so training itself runs ANIL (not just adapt)
    trainer, cfg = _make_trainer(synthetic_data_dir, tmp_path, "fomaml",
                                 arch="transformer",
                                 adapt_filter="ctc_head,decoder")
    state = trainer.meta_train(max_steps=4)
    assert int(state.step) == 4
    heldout = next(iter(trainer.heldout_datasets.values()))
    adapted, _ = trainer.meta_adapt(state.params, heldout)
    enc_before = jax.tree_util.tree_leaves(state.params["encoder"])
    enc_after = jax.tree_util.tree_leaves(adapted["encoder"])
    for b, a in zip(enc_before, enc_after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    head_moved = any(
        not np.array_equal(np.asarray(b), np.asarray(a))
        for b, a in zip(jax.tree_util.tree_leaves(state.params["ctc_head"]),
                        jax.tree_util.tree_leaves(adapted["ctc_head"])))
    assert head_moved
