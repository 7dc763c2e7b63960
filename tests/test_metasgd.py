"""Meta-SGD / MAML++-LSLR learnable inner learning rates
(meta.learn_inner_lr): analytic rate-gradients on the quadratic family
(SURVEY.md section 4.3 methodology), trainer integration, and the
reptile guard.

Analytic derivation for loss(p,c) = 0.5||p-c||^2, grad = p-c, k inner
steps at learned rate a (one leaf):

  w_k = c_s + (1-a)^k (w - c_s)                          (inner closed form)
  q   = 0.5 ||w_k - c_q||^2

FOMAML (input-side stop_gradient: every inner grad g_i is a constant,
w_k = w - a * sum_i g_i with sum_i g_i = (1-(1-a)^k)/a * (w - c_s)):
  dq/dw = (w_k - c_q)
  dq/da = -(w_k - c_q) . (w - c_s) * (1-(1-a)^k)/a

Full MAML (differentiate the closed form):
  dq/dw = (1-a)^k (w_k - c_q)
  dq/da = -k (1-a)^(k-1) (w - c_s) . (w_k - c_q)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaasr_tpu.meta.maml import (
    MetaAlgoConfig,
    maml_grads,
    split_lr,
    wrap_lr,
)


def quad_loss(params, batch, rng, train):
    del rng, train
    diff = params["w"] - batch["c"]
    return 0.5 * jnp.sum(diff * diff), {}


def _setup(d=5, a=0.1, k=3, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    c_s = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    c_q = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    w_k = c_s + (1 - a) ** k * (w - c_s)
    return w, c_s, c_q, w_k


def test_wrap_split_roundtrip_and_passthrough():
    w = jnp.ones(3)
    wrapped = wrap_lr({"w": w}, 0.05)
    model, lr = split_lr(wrapped)
    assert float(lr["w"]) == pytest.approx(0.05)
    np.testing.assert_array_equal(np.asarray(model["w"]), np.asarray(w))
    # unwrapped trees pass through untouched
    m2, lr2 = split_lr({"w": w})
    assert lr2 is None and m2["w"] is w


def test_metasgd_fomaml_gradient_analytic():
    a, k = 0.1, 3
    w, c_s, c_q, w_k = _setup(a=a, k=k)
    cfg = MetaAlgoConfig(inner_lr=0.999, inner_steps=k, first_order=True,
                         learn_inner_lr=True)  # inner_lr must be ignored
    grad_fn = maml_grads(quad_loss, cfg)
    params = {"model": {"w": w}, "inner_lr": {"w": jnp.asarray(a)}}
    mb = {"support": {"c": c_s[None]}, "query": {"c": c_q[None]}}
    grads, metrics = grad_fn(params, mb, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(grads["model"]["w"]),
                               np.asarray(w_k - c_q), rtol=1e-5)
    expect_da = -float(jnp.dot(w_k - c_q, w - c_s)) * (1 - (1 - a) ** k) / a
    np.testing.assert_allclose(float(grads["inner_lr"]["w"]), expect_da,
                               rtol=1e-5)
    # the meta loss is evaluated on the MODEL leaves of the adapted tree
    np.testing.assert_allclose(float(metrics["meta_loss"]),
                               0.5 * float(jnp.sum((w_k - c_q) ** 2)),
                               rtol=1e-5)


def test_metasgd_full_maml_gradient_analytic():
    a, k = 0.1, 3
    w, c_s, c_q, w_k = _setup(a=a, k=k)
    for remat in (False, True):
        cfg = MetaAlgoConfig(inner_lr=0.999, inner_steps=k,
                             first_order=False, remat_inner=remat,
                             learn_inner_lr=True)
        grad_fn = maml_grads(quad_loss, cfg)
        params = {"model": {"w": w}, "inner_lr": {"w": jnp.asarray(a)}}
        mb = {"support": {"c": c_s[None]}, "query": {"c": c_q[None]}}
        grads, _ = grad_fn(params, mb, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.asarray(grads["model"]["w"]),
            np.asarray((1 - a) ** k * (w_k - c_q)), rtol=1e-5)
        expect_da = (-k * (1 - a) ** (k - 1)
                     * float(jnp.dot(w - c_s, w_k - c_q)))
        np.testing.assert_allclose(float(grads["inner_lr"]["w"]), expect_da,
                                   rtol=1e-5)


def test_metasgd_rates_can_diverge_per_leaf():
    """Two leaves with different curvatures get different rate gradients —
    the per-tensor resolution is real, not a broadcast scalar."""
    w, c_s, c_q, _ = _setup()

    def two_leaf_loss(params, batch, rng, train):
        del rng, train
        d1 = params["w1"] - batch["c"]
        d2 = params["w2"] - 3.0 * batch["c"]   # different optimum
        return 0.5 * jnp.sum(d1 * d1) + 2.0 * jnp.sum(d2 * d2), {}

    cfg = MetaAlgoConfig(inner_steps=2, first_order=True,
                         learn_inner_lr=True)
    params = wrap_lr({"w1": w, "w2": w}, 0.05)
    mb = {"support": {"c": c_s[None]}, "query": {"c": c_q[None]}}
    grads, _ = maml_grads(two_leaf_loss, cfg)(params, mb,
                                              jax.random.PRNGKey(0))
    g1 = float(grads["inner_lr"]["w1"])
    g2 = float(grads["inner_lr"]["w2"])
    assert abs(g1 - g2) > 1e-3


def test_metasgd_grad_dtype_bf16_keeps_fp32_rate_masters():
    a, k = 0.1, 2
    w, c_s, c_q, _ = _setup(a=a, k=k)
    cfg = MetaAlgoConfig(inner_steps=k, first_order=True,
                         learn_inner_lr=True, grad_dtype="bfloat16")
    params = {"model": {"w": w}, "inner_lr": {"w": jnp.asarray(a)}}
    mb = {"support": {"c": c_s[None]}, "query": {"c": c_q[None]}}
    grads, _ = maml_grads(quad_loss, cfg)(params, mb, jax.random.PRNGKey(0))
    assert grads["model"]["w"].dtype == jnp.float32
    assert grads["inner_lr"]["w"].dtype == jnp.float32
    # bf16 internals: rate grad within bf16 tolerance of the analytic value
    w_k = c_s + (1 - a) ** k * (w - c_s)
    expect_da = -float(jnp.dot(w_k - c_q, w - c_s)) * (1 - (1 - a) ** k) / a
    np.testing.assert_allclose(float(grads["inner_lr"]["w"]), expect_da,
                               rtol=0.05)


def test_metasgd_reptile_rejected():
    from metaasr_tpu.config import Config
    from metaasr_tpu.train.meta_train import algo_config

    cfg = Config()
    cfg.meta.algo = "reptile"
    cfg.meta.learn_inner_lr = True
    with pytest.raises(ValueError, match="learn_inner_lr"):
        algo_config(cfg)


def test_metasgd_trainer_end_to_end(tmp_path):
    """meta_train with meta.learn_inner_lr: rates live in state.params,
    move under training, adapt uses them, decode gets a plain model tree,
    and checkpoint resume round-trips the wrapped structure exactly."""
    from metaasr_tpu.config import Config
    from metaasr_tpu.data.dataset import load_accent_datasets
    from metaasr_tpu.data.synthetic import generate_dataset
    from metaasr_tpu.data.tokenizer import CharTokenizer
    from metaasr_tpu.train.meta_train import MetaASRTrainer
    from metaasr_tpu.train.task import ASRTask

    data_dir = str(tmp_path / "synth")
    generate_dataset(data_dir, accents=("alpha", "bravo", "charlie"),
                     utts_per_accent=8, seed=0)
    tok = CharTokenizer.ascii_default()
    cfg = Config()
    cfg.model.arch = "transformer"
    cfg.model.d_model, cfg.model.num_heads, cfg.model.d_ff = 32, 2, 64
    cfg.model.num_encoder_layers = cfg.model.num_decoder_layers = 2
    cfg.model.dtype = "float32"
    cfg.model.vocab_size = tok.vocab_size
    cfg.frontend.use_pallas = False
    cfg.meta.learn_inner_lr = True
    cfg.meta.tasks_per_batch = 2
    cfg.meta.k_support = cfg.meta.k_query = 2
    cfg.meta.inner_steps = 2
    cfg.data.data_dir = data_dir
    cfg.data.max_frames, cfg.data.max_tokens, cfg.data.batch_size = 100, 16, 4
    cfg.train.max_steps, cfg.train.eval_every = 2, 10 ** 9
    cfg.train.ckpt_every, cfg.train.log_every = 2, 1

    dsets = load_accent_datasets(data_dir, tok)
    heldout = {"charlie": dsets.pop("charlie")}
    task = ASRTask(cfg, tok.sos_eos_id)
    tr = MetaASRTrainer(cfg, task, dsets, heldout, tok,
                        str(tmp_path / "wd"))
    state = tr.meta_train(max_steps=2)

    lr_leaves = jax.tree_util.tree_leaves(state.params["inner_lr"])
    init_lr = cfg.meta.inner_lr
    moved = [abs(float(x) - init_lr) for x in lr_leaves]
    assert max(moved) > 0, "outer loop never updated any learned rate"

    # adapt consumes the learned rates, returns a plain model tree
    adapted, test_idx = tr.meta_adapt(state.params, heldout["charlie"],
                                      adapt_steps=2, seed=0)
    assert split_lr(adapted)[1] is None
    scores = tr.decode(state.params, heldout["charlie"], test_idx,
                       max_utts=2)
    assert 0.0 <= scores["wer"]

    # exact resume of the wrapped structure: 2 + 2 == 4
    tr2 = MetaASRTrainer(cfg, task, dsets, heldout, tok,
                         str(tmp_path / "wd"))
    state4 = tr2.meta_train(max_steps=4)
    tr3 = MetaASRTrainer(cfg, task, dsets, heldout, tok,
                         str(tmp_path / "wd2"))
    state4b = tr3.meta_train(max_steps=4)
    for a, b in zip(jax.tree_util.tree_leaves(state4.params),
                    jax.tree_util.tree_leaves(state4b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
