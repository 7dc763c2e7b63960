"""M3: Pallas kernels (interpret mode on the CPU test backend) vs the
jax reference paths."""

import jax
import jax.numpy as jnp
import numpy as np

from metaasr_tpu.frontend.fbank import log_mel_fbank
from metaasr_tpu.frontend.pallas_fbank import pallas_log_mel_fbank


def test_pallas_fbank_matches_jax_path(rng):
    bsz, s = 3, 16000
    audio = jnp.asarray((0.3 * rng.standard_normal((bsz, s))).astype(np.float32))
    lens = jnp.array([16000, 9000, 401])
    for cmvn, nv in [("utterance", False), ("utterance", True), ("none", False)]:
        f1, l1 = log_mel_fbank(audio, lens, cmvn=cmvn, cmvn_norm_var=nv)
        f2, l2 = pallas_log_mel_fbank(audio, lens, cmvn=cmvn, cmvn_norm_var=nv)
        assert list(np.asarray(l1)) == list(np.asarray(l2))
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_fbank_under_vmap(rng):
    audio = jnp.asarray((0.3 * rng.standard_normal((2, 2, 8000))).astype(np.float32))
    lens = jnp.full((2, 2), 8000, jnp.int32)
    f_v = jax.vmap(lambda a, l: pallas_log_mel_fbank(a, l)[0])(audio, lens)
    f_ref = jax.vmap(lambda a, l: log_mel_fbank(a, l)[0])(audio, lens)
    np.testing.assert_allclose(np.asarray(f_v), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_ctc_matches_scan(rng):
    from metaasr_tpu.ops.ctc import ctc_forward
    from metaasr_tpu.ops.ctc_pallas import ctc_forward_pallas

    bsz, t_len, u_len, vocab = 5, 24, 6, 9
    logits = rng.standard_normal((bsz, t_len, vocab)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    tlens = jnp.asarray(rng.integers(u_len * 2 + 1, t_len + 1, bsz).astype(np.int32))
    labels = jnp.asarray(rng.integers(1, vocab, (bsz, u_len)).astype(np.int32))
    ulens = jnp.asarray(rng.integers(1, u_len + 1, bsz).astype(np.int32))
    ref = ctc_forward(lp, tlens, labels, ulens)
    got = ctc_forward_pallas(lp, tlens, labels, ulens)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5,
                               atol=1e-5)
    g_ref = jax.grad(lambda x: ctc_forward(jax.nn.log_softmax(x, -1), tlens,
                                           labels, ulens).sum())(jnp.asarray(logits))
    g_got = jax.grad(lambda x: ctc_forward_pallas(jax.nn.log_softmax(x, -1),
                                                  tlens, labels, ulens).sum())(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_got),
                               rtol=1e-4, atol=1e-5)


def test_pallas_ctc_empty_and_edge(rng):
    from metaasr_tpu.ops.ctc import ctc_forward
    from metaasr_tpu.ops.ctc_pallas import ctc_forward_pallas

    lp = jax.nn.log_softmax(jnp.asarray(
        rng.standard_normal((2, 8, 5)).astype(np.float32)), -1)
    labels = jnp.asarray([[0, 0, 0], [2, 2, 0]], dtype=jnp.int32)
    ulens = jnp.array([0, 2])
    tlens = jnp.array([8, 6])
    ref = ctc_forward(lp, tlens, labels, ulens)
    got = ctc_forward_pallas(lp, tlens, labels, ulens)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5)


def test_pallas_ctc_second_order_matches_scan(rng):
    """r5: the custom-JVP rework makes the Pallas CTC twice-differentiable
    (full MAML's grad-over-grad, VERDICT r4 item 2). HVP and
    reverse-over-reverse must match the scan backend."""
    from metaasr_tpu.ops.ctc import ctc_forward
    from metaasr_tpu.ops.ctc_pallas import ctc_forward_pallas

    bsz, t_len, u_len, vocab = 4, 16, 5, 8
    logits = jnp.asarray(
        rng.standard_normal((bsz, t_len, vocab)).astype(np.float32))
    tlens = jnp.asarray(
        rng.integers(u_len * 2 + 1, t_len + 1, bsz).astype(np.int32))
    labels = jnp.asarray(
        rng.integers(1, vocab, (bsz, u_len)).astype(np.int32))
    ulens = jnp.asarray(rng.integers(1, u_len + 1, bsz).astype(np.int32))
    v = jnp.asarray(rng.standard_normal(logits.shape).astype(np.float32))

    def loss_p(x):
        return ctc_forward_pallas(jax.nn.log_softmax(x, -1), tlens, labels,
                                  ulens).sum()

    def loss_s(x):
        return ctc_forward(jax.nn.log_softmax(x, -1), tlens, labels,
                           ulens).sum()

    hvp_p = jax.jvp(jax.grad(loss_p), (logits,), (v,))[1]
    hvp_s = jax.jvp(jax.grad(loss_s), (logits,), (v,))[1]
    np.testing.assert_allclose(np.asarray(hvp_p), np.asarray(hvp_s),
                               rtol=1e-3, atol=1e-5)
    # reverse-over-reverse — the exact trace shape of MAML's outer grad
    rr_p = jax.grad(lambda x: (jax.grad(loss_p)(x) * v).sum())(logits)
    rr_s = jax.grad(lambda x: (jax.grad(loss_s)(x) * v).sum())(logits)
    np.testing.assert_allclose(np.asarray(rr_p), np.asarray(rr_s),
                               rtol=1e-3, atol=1e-5)


def test_pallas_ctc_second_order_vmap_remat(rng):
    """The MAML inner-step composition: vmap over tasks x jax.checkpoint
    around inner SGD steps x grad-of-grad through the Pallas CTC."""
    from metaasr_tpu.ops.ctc import ctc_forward
    from metaasr_tpu.ops.ctc_pallas import ctc_forward_pallas

    bsz, t_len, u_len, vocab = 3, 12, 4, 7
    tlens = jnp.full((bsz,), t_len, jnp.int32)
    labels = jnp.asarray(
        rng.integers(1, vocab, (bsz, u_len)).astype(np.int32))
    ulens = jnp.full((bsz,), u_len, jnp.int32)

    def make_meta(loss_core):
        def task_loss(x):
            return loss_core(jax.nn.log_softmax(x, -1), tlens, labels,
                             ulens).mean()

        step = jax.checkpoint(lambda x: x - 0.1 * jax.grad(task_loss)(x))
        return lambda x: task_loss(step(step(x)))

    xb = jnp.asarray(
        rng.standard_normal((2, bsz, t_len, vocab)).astype(np.float32))
    g_p = jax.vmap(jax.grad(make_meta(ctc_forward_pallas)))(xb)
    g_s = jax.vmap(jax.grad(make_meta(ctc_forward)))(xb)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_s),
                               rtol=1e-3, atol=1e-5)


def test_maml_meta_grads_pallas_vs_scan_ctc(rng):
    """Full second-order MAML meta-gradients on a tiny VGG-BLSTM-free
    linear CTC model: pallas CTC backend == scan CTC backend."""
    from metaasr_tpu.meta.maml import MetaAlgoConfig, maml_grads
    from metaasr_tpu.ops.ctc import ctc_loss
    from metaasr_tpu.ops.ctc_pallas import ctc_loss_pallas

    bsz, t_len, feat, vocab, u_len = 2, 10, 6, 7, 3

    def make_loss(ctc_fn):
        def loss_fn(params, batch, rng_, train):
            logits = batch["feats"] @ params["w"] + params["b"]
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = ctc_fn(lp, batch["feat_lens"], batch["tokens"],
                         batch["token_lens"])
            return nll.mean(), {}

        return loss_fn

    params = {
        "w": jnp.asarray(
            0.3 * rng.standard_normal((feat, vocab)).astype(np.float32)),
        "b": jnp.zeros((vocab,), jnp.float32),
    }

    def batch(m):
        return {
            "feats": jnp.asarray(rng.standard_normal(
                (m, bsz, t_len, feat)).astype(np.float32)),
            "feat_lens": jnp.full((m, bsz), t_len, jnp.int32),
            "tokens": jnp.asarray(rng.integers(
                1, vocab, (m, bsz, u_len)).astype(np.int32)),
            "token_lens": jnp.full((m, bsz), u_len, jnp.int32),
        }

    mb = {"support": batch(2), "query": batch(2)}
    cfg = MetaAlgoConfig(inner_lr=0.05, inner_steps=2, first_order=False,
                         remat_inner=True)
    key = jax.random.PRNGKey(0)
    g_p, m_p = maml_grads(make_loss(ctc_loss_pallas), cfg)(params, mb, key)
    g_s, m_s = maml_grads(make_loss(ctc_loss), cfg)(params, mb, key)
    np.testing.assert_allclose(float(m_p["meta_loss"]),
                               float(m_s["meta_loss"]), rtol=1e-5)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(g_p[k]), np.asarray(g_s[k]),
                                   rtol=1e-3, atol=1e-5)


def test_pallas_lstm_matches_scan(rng):
    """Pallas LSTM kernel (fwd + custom-VJP BPTT) vs the lax.scan LSTM."""
    from metaasr_tpu.ops.lstm_pallas import lstm_scan_reference, pallas_lstm

    t_len, bsz, hidden = 37, 5, 24  # unaligned on purpose (padding paths)
    gx = jnp.asarray(0.5 * rng.standard_normal((t_len, bsz, 4 * hidden))
                     .astype(np.float32))
    u = jnp.asarray(0.3 * rng.standard_normal((hidden, 4 * hidden))
                    .astype(np.float32))
    ref = lstm_scan_reference(gx, u)
    got = pallas_lstm(gx, u, True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-6)
    w = jnp.arange(1, t_len + 1, dtype=jnp.float32)[:, None, None]
    gp = jax.grad(lambda g, uu: (pallas_lstm(g, uu, True) * w).sum(),
                  argnums=(0, 1))(gx, u)
    gs = jax.grad(lambda g, uu: (lstm_scan_reference(g, uu) * w).sum(),
                  argnums=(0, 1))(gx, u)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]),
                               rtol=1e-3, atol=1e-3)


def test_pallas_fbank_jit_two_shapes_no_tracer_leak():
    """Regression (found by scripts/kernel_check.py on chip): the padded
    DFT/mel matrix cache stored jnp values — when the first call happened
    inside a jit trace, a tracer was cached and leaked into the next
    distinct-shape trace (UnexpectedTracerError). The cache must hold host
    arrays."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from metaasr_tpu.frontend import pallas_fbank as pf
    from metaasr_tpu.frontend.fbank import FbankParams

    params = FbankParams.create()
    pf._matrix_cache.pop(id(params), None)  # force first build inside jit
    rng = np.random.default_rng(0)
    for n in (8000, 12800):  # two distinct shapes -> two traces
        audio = jnp.asarray(0.1 * rng.standard_normal((2, n)), jnp.float32)
        lens = jnp.full((2,), n, jnp.int32)
        feats, flens = jax.jit(
            lambda a, l: pf.pallas_log_mel_fbank(a, l, params))(audio, lens)
        assert np.isfinite(np.asarray(feats)).all()
    assert all(isinstance(m, np.ndarray)
               for m in pf._matrix_cache[id(params)])
