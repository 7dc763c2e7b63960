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
