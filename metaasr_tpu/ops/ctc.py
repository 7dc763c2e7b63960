"""CTC loss — log-space alpha recursion under ``lax.scan``.

The reference wraps cuDNN's CTC (``torch.nn.CTCLoss``; R: src/model/ctc.py,
SURVEY.md section 2.1 #10, #N2). This is the TPU-native equivalent, spec in
SURVEY.md section 3.2:

    extended labels z = [b, y1, b, y2, ..., yU, b],  S = 2U+1, blank b=0
    alpha[0, 0] = logp_0(b);  alpha[0, 1] = logp_0(y1)
    alpha[t, s] = logp_t(z_s) + LSE(alpha[t-1, s], alpha[t-1, s-1],
                                    alpha[t-1, s-2] if z_s != b and z_s != z_{s-2})
    loss = -LSE(alpha[T-1, S-1], alpha[T-1, S-2])

TPU shaping decisions:
- label emissions logp_t(z_s) are gathered ONCE up front into [B, T, S]
  (one ``take_along_axis``), so the scan body is pure VPU elementwise work
  with no per-step gathers;
- ragged T is handled by freezing alpha past each utterance's length
  (``jnp.where`` on a length mask) — shapes stay static;
- ragged U needs no masking: the recursion only moves forward in s, so
  states past S_b = 2*len_b+1 can never flow back into read positions.

Gradients flow through the scan by reverse-mode autodiff (XLA rematerializes
cheaply: the body is elementwise). The Pallas alpha/beta kernel with a custom
VJP lives in ops/ctc_pallas.py behind the same signature.

Infeasible alignments (T_b < required frames) produce +inf loss; like the
reference's ``zero_infinity=True``, they are zeroed (with zero gradient).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from metaasr_tpu.constants import BLANK_ID, LOG_EPS


def extend_labels(labels: jax.Array, blank: int = BLANK_ID) -> jax.Array:
    """[B, U] labels -> [B, 2U+1] blank-interleaved extended labels."""
    bsz, u = labels.shape
    z = jnp.full((bsz, 2 * u + 1), blank, dtype=labels.dtype)
    return z.at[:, 1::2].set(labels)


def _lse3(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, LOG_EPS)  # avoid (-inf) - (-inf)
    return m + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe))


def _lse2(a: jax.Array, b: jax.Array) -> jax.Array:
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, LOG_EPS)
    return m + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))


def ctc_forward(log_probs: jax.Array, logit_lens: jax.Array, labels: jax.Array,
                label_lens: jax.Array, blank: int = BLANK_ID) -> jax.Array:
    """Per-utterance negative log likelihood, shape [B].

    log_probs: [B, T, V] log-softmaxed frame posteriors
    logit_lens: [B] valid frame counts
    labels: [B, U] zero-padded target ids (no blanks)
    label_lens: [B] valid label counts
    """
    bsz, t_len, _ = log_probs.shape
    z = extend_labels(labels, blank)                       # [B, S]
    s_len = z.shape[1]

    # Pre-gather label emissions: [B, T, S]. One gather, then pure elementwise.
    logp_z = jnp.take_along_axis(
        log_probs, z[:, None, :].astype(jnp.int32), axis=2)

    # Skip-transition mask: allowed into s if z_s != blank and z_s != z_{s-2}.
    z_prev2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=blank)[:, :s_len]
    can_skip = (z != blank) & (z != z_prev2)               # [B, S]
    skip_bias = jnp.where(can_skip, 0.0, LOG_EPS).astype(log_probs.dtype)

    neg = jnp.asarray(LOG_EPS, log_probs.dtype)
    alpha0 = jnp.full((bsz, s_len), neg)
    alpha0 = alpha0.at[:, 0].set(logp_z[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lens > 0, logp_z[:, 0, 1], neg))
    # Utterances with T_b == 0 contribute nothing valid; handled at readout.

    def step(alpha, inputs):
        logp_t, t = inputs                                  # [B, S], scalar
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=LOG_EPS)[:, :s_len]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=LOG_EPS)[:, :s_len]
        new = logp_t + _lse3(alpha, a1, a2 + skip_bias)
        # freeze alpha for finished utterances (t >= T_b)
        active = (t < logit_lens)[:, None]
        return jnp.where(active, new, alpha), None

    xs = (jnp.moveaxis(logp_z, 1, 0), jnp.arange(1, t_len))
    alpha_final, _ = jax.lax.scan(step, alpha0, (xs[0][1:], xs[1]))

    # Readout at s = 2*label_lens and 2*label_lens - 1 (0-indexed S_b-1, S_b-2).
    end = (2 * label_lens.astype(jnp.int32))[:, None]       # [B, 1]
    last = jnp.take_along_axis(alpha_final, end, axis=1)[:, 0]
    prev_idx = jnp.maximum(end - 1, 0)
    prev = jnp.take_along_axis(alpha_final, prev_idx, axis=1)[:, 0]
    prev = jnp.where(label_lens > 0, prev, neg)             # empty label: only blank path
    nll = -_lse2(last, prev)

    # Empty target special case: loss = -sum_t logp_t(blank).
    # (The recursion above already handles it: with U=0, S=1, only s=0 exists.)
    return nll


def ctc_loss(log_probs: jax.Array, logit_lens: jax.Array, labels: jax.Array,
             label_lens: jax.Array, blank: int = BLANK_ID,
             zero_infinity: bool = True) -> jax.Array:
    """[B] CTC negative log likelihoods (un-normalized, like the reference's
    per-utterance losses before averaging)."""
    nll = ctc_forward(log_probs, logit_lens, labels, label_lens, blank)
    if zero_infinity:
        # Infeasible (T too short) => alpha readout stayed at LOG_EPS =>
        # enormous nll. Zero it, including its gradient.
        bad = nll > -0.5 * LOG_EPS
        nll = jnp.where(bad, 0.0, nll)
    return nll


def ctc_loss_normalized(log_probs, logit_lens, labels, label_lens,
                        blank: int = BLANK_ID) -> jax.Array:
    """Scalar: batch mean of per-utterance NLL (reference's per-utt
    normalization, SURVEY.md section 2.1 #10)."""
    nll = ctc_loss(log_probs, logit_lens, labels, label_lens, blank)
    return nll.mean()
