"""Pallas CTC forward-backward kernel (SURVEY.md section 2.2 #N2/#N3,
BASELINE.json:5 "Pallas CTC forward-backward (alpha/beta recursion) loss").

The scan-based loss (ops/ctc.py) differentiates by reverse-mode autodiff
through ``lax.scan`` — correct, but it materializes per-step residuals in
HBM and runs T sequential XLA loop iterations for forward AND backward.
This kernel runs the whole alpha/beta recursion on-chip:

- the label-gathered emissions logp_z [T, BB, S_pad] stream into VMEM once;
- the alpha pass stores rows in a VMEM scratch (never HBM);
- the beta pass runs backward over the same VMEM data, emitting the
  posterior gradient  d nll / d logp_z[t,s] = -exp(alpha + beta + nll)
  directly — one kernel, one HBM write of the gradient;
- a custom JVP hands jax the [B, T, S] gradient, which is scattered back
  to [B, T, V] by a one-hot matmul at the jax level (MXU, not scatter).

Second-order capable (full MAML's grad-over-grad, BASELINE.json:10): the
posterior-gradient computation is itself wrapped in a custom JVP whose
tangent rule runs forward-over-reverse through a differentiable
``lax.scan`` replica of the same recursion (``_scan_nll_gathered``). So
every PRIMAL loss/gradient — including the inner-loop gradients inside a
full-MAML meta-step — rides the VMEM kernel; only the outer backward's
Hessian-vector products ride the scan. Third-order is unsupported.

Lane shifts (alpha[s-1], alpha[s-2]) are circular ``pltpu.roll`` ops with
iota masks on the wrapped lanes. Ragged T freezes the alpha carry per row;
ragged U needs no masking (the recursion never reads s > current).

Batch is processed in blocks sized so 3 x [T, BB, S_pad] fp32 fits VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metaasr_tpu.constants import BLANK_ID, LOG_EPS
from metaasr_tpu.ops.ctc import extend_labels

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_lanes(x: jax.Array, k: int, s_pad: int) -> jax.Array:
    """shift values toward higher lane index by k (x[s] <- x[s-k]),
    filling vacated lanes with LOG_EPS."""
    rolled = pltpu.roll(x, shift=k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], s_pad), 1)
    return jnp.where(lane >= k, rolled, LOG_EPS)


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, LOG_EPS)
    return m + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
                       + jnp.exp(c - m_safe))


def _ctc_kernel(logp_ref, skip_ref, lens_ref, end_ref, nll_ref, grad_ref,
                alpha_scr, *, t_len: int, s_pad: int, bb: int):
    """One batch block: logp_ref [T, BB, S_pad]; skip_ref [BB, S_pad];
    lens/end [BB, 1] i32 in VMEM; outputs nll [BB, 1], grad [T, BB, S_pad];
    alpha scratch [T, BB, S_pad]."""
    lens = lens_ref[:]                                       # [BB, 1]
    end = end_ref[:]                                         # [BB, 1]
    skip = skip_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bb, s_pad), 1)

    # ---- alpha pass ----
    lp0 = logp_ref[0]
    alpha0 = jnp.where(lane == 0, lp0, LOG_EPS)
    alpha0 = jnp.where((lane == 1) & (end > 0), lp0, alpha0)

    alpha_scr[0] = alpha0

    def fwd(t, alpha):
        lp = logp_ref[t]
        a1 = _shift_lanes(alpha, 1, s_pad)
        a2 = _shift_lanes(alpha, 2, s_pad)
        new = lp + _lse3(alpha, a1, a2 + skip)
        active = t < lens                                    # [BB, 1]
        alpha = jnp.where(active, new, alpha)
        alpha_scr[t] = alpha
        return alpha

    alpha_f = jax.lax.fori_loop(1, t_len, fwd, alpha0)

    # ---- nll from final alpha at end positions ----
    pick = (lane == end) | ((lane == end - 1) & (end > 0))
    a_end = jnp.where(pick, alpha_f, LOG_EPS)
    m = jnp.max(a_end, axis=1, keepdims=True)
    m_safe = jnp.maximum(m, LOG_EPS)
    lse = m + jnp.log(jnp.sum(jnp.exp(a_end - m_safe), axis=1, keepdims=True))
    nll = -lse                                               # [BB, 1]
    nll_ref[:] = nll

    # ---- beta pass, writing grad rows ----
    # beta[t, s] = log P(complete z_{s..} over frames t+1..T_b-1 | state s
    # at frame t); beta[T_b-1] = end indicator. The loop runs t descending;
    # rows still in their padded region (t >= T_b-1) re-assert the
    # indicator, so the recursion starts exactly at each row's own T_b-1.
    beta_init = jnp.where(pick, 0.0, LOG_EPS)                # [BB, S_pad]
    skip2 = pltpu.roll(skip, shift=s_pad - 2, axis=1)

    def bwd(i, carry):
        t = t_len - 1 - i
        at_last = t >= (lens - 1)
        beta_t = jnp.where(at_last, beta_init, carry)
        grad_ref[t] = jnp.where(
            t < lens, -jnp.exp(alpha_scr[t] + beta_t + nll), 0.0)
        # beta[t-1] from beta[t]: next states {s, s+1, s+2}, emissions at t
        lp = logp_ref[t]
        b0 = beta_t + lp
        b1 = pltpu.roll(beta_t + lp, shift=s_pad - 1, axis=1)
        b1 = jnp.where(lane < s_pad - 1, b1, LOG_EPS)
        lp2 = pltpu.roll(lp, shift=s_pad - 2, axis=1)
        b2 = pltpu.roll(beta_t, shift=s_pad - 2, axis=1) + lp2 + skip2
        b2 = jnp.where(lane < s_pad - 2, b2, LOG_EPS)
        return _lse3(b0, b1, b2)

    jax.lax.fori_loop(0, t_len, bwd, beta_init)


def _scan_nll_gathered(logp_z, skip_bias, lens_f, end_f):
    """Differentiable alpha recursion over GATHERED emissions — the exact
    math of ``_ctc_kernel``'s forward pass, as ``lax.scan`` of standard
    primitives. Never runs on the first-order path; it exists so the
    custom-JVP rules below can express second-order tangents (grad-of-grad
    for full MAML, BASELINE.json:10) through ordinary autodiff while the
    primal values keep riding the Pallas kernel.

    logp_z [B, T, S_pad]; skip_bias [B, S_pad]; lens_f/end_f [B, 1] float.
    Returns nll [B]."""
    lens = lens_f.astype(jnp.int32)
    end = end_f.astype(jnp.int32)
    bsz, t_len, s_pad = logp_z.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bsz, s_pad), 1)

    lp0 = logp_z[:, 0]
    alpha0 = jnp.where(lane == 0, lp0, LOG_EPS)
    alpha0 = jnp.where((lane == 1) & (end > 0), lp0, alpha0)

    def step(alpha, inputs):
        lp_t, t = inputs
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)),
                     constant_values=LOG_EPS)[:, :s_pad]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)),
                     constant_values=LOG_EPS)[:, :s_pad]
        # Clamp at LOG_EPS: padded lanes (emission = LOG_EPS) would
        # otherwise accumulate -1e30 per frame into -inf, which poisons
        # the tangent rules (0*inf). The clamp binds only on impossible
        # states whose true posterior gradient is zero, and jnp.maximum
        # routes their tangents to the constant branch — exactly the
        # kernel's -exp(alpha+beta+nll) = 0 semantics. (The kernel itself
        # needs no clamp: it is primal-only and exp(-inf) is a clean 0.)
        new = jnp.maximum(lp_t + _lse3(alpha, a1, a2 + skip_bias), LOG_EPS)
        return jnp.where(t < lens, new, alpha), None

    xs = (jnp.moveaxis(logp_z, 1, 0)[1:], jnp.arange(1, t_len))
    alpha_f, _ = jax.lax.scan(step, alpha0, xs)

    pick = (lane == end) | ((lane == end - 1) & (end > 0))
    a_end = jnp.where(pick, alpha_f, LOG_EPS)
    m = jnp.max(a_end, axis=1, keepdims=True)
    m_safe = jnp.maximum(m, LOG_EPS)
    lse = m + jnp.log(jnp.sum(jnp.exp(a_end - m_safe), axis=1,
                              keepdims=True))
    return -lse[:, 0]


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def _ctc_pair(t_len: int, interpret: bool, logp_z, skip_bias, lens_f, end_f):
    """(nll [B], posterior grad [B, T, S_pad]) from ONE Pallas kernel call.

    Differentiable once more (its JVP rule below routes tangents through
    ``_scan_nll_gathered``), which is what makes the loss as a whole
    second-order capable: the outer (MAML) backward differentiates the
    inner-loop gradient ``g`` — i.e. this function — while every PRIMAL
    alpha/beta recursion, at both orders, still runs in VMEM."""
    return _ctc_run(logp_z, skip_bias, lens_f, end_f, t_len, interpret)


@_ctc_pair.defjvp
def _ctc_pair_jvp(t_len, interpret, primals, tangents):
    logp_z, skip_bias, lens_f, end_f = primals
    d_logp = tangents[0]
    # Primal from the kernel (fast path even inside a grad-of-grad trace).
    nll, g = _ctc_pair(t_len, interpret, *primals)
    # Tangents via the differentiable scan: nll_dot is exactly <g, d_logp>
    # (cheap, uses the kernel's g); g_dot is the CTC Hessian-vector product,
    # forward-over-reverse through the scan recursion. Third-order
    # differentiation is unsupported (the scan-grad inside this rule is
    # ordinary autodiff, but the kernel call above is not differentiable
    # a second time) — full MAML needs exactly two orders.
    nll_dot = jnp.sum(g * d_logp, axis=(1, 2))
    _, g_dot = jax.jvp(
        jax.grad(lambda lp: _scan_nll_gathered(
            lp, skip_bias, lens_f, end_f).sum()),
        (logp_z,), (d_logp,))
    return (nll, g), (nll_dot, g_dot)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def _ctc_pallas(t_len: int, interpret: bool, logp_z, skip_bias, lens_f,
                end_f):
    """All-float autodiff boundary: integer inputs break the custom-rule x
    vmap x jax.checkpoint composition (symbolic-zero bookkeeping), so
    lens/end travel as float32 and are cast inside. skip/lens/end tangents
    are structurally zero in every real use (they derive from integer
    label data) and are ignored by the rules, matching the old custom-VJP
    semantics."""
    nll, _ = _ctc_run(logp_z, skip_bias, lens_f, end_f, t_len, interpret)
    return nll


@_ctc_pallas.defjvp
def _ctc_pallas_jvp(t_len, interpret, primals, tangents):
    d_logp = tangents[0]
    nll, g = _ctc_pair(t_len, interpret, *primals)
    # Linear in d_logp; transposes to the first-order cotangent g * ct with
    # g held as a residual — identical cost/semantics to the previous
    # custom VJP. Differentiating through it (outer MAML grad) reaches g
    # via _ctc_pair's own JVP rule.
    return nll, jnp.sum(g * d_logp, axis=(1, 2))


BATCH_BLOCK = 8  # fp32 sublane size — middle block dim must be 8-divisible
MAX_BATCH_BLOCK = 32
VMEM_BUDGET = 12 * 1024 * 1024


def fits_vmem(t_len: int, s_pad: int, bb: int = BATCH_BLOCK) -> bool:
    """3 copies of [T, bb, S_pad] fp32 (logp block, alpha scratch, grad
    block) must fit the VMEM budget."""
    return 3 * t_len * bb * s_pad * 4 <= VMEM_BUDGET


def pick_batch_block(bsz: int, t_len: int, s_pad: int) -> int:
    """Largest batch block (multiple of the fp32 sublane 8, capped) that
    fits VMEM. Grid steps run SEQUENTIALLY on a TPU core and each runs
    2*T loop iterations, so fewer/wider blocks win: the per-iteration
    [bb, S_pad] VPU ops pipeline without loop overhead (measured 2.0x
    kernel speedup for bb 8 -> 16 at the bench shapes, 1.23 -> 0.63 ms
    for fwd+bwd at [16, 99, 30]). Wider blocks can
    pad the batch (ceil division) — still fewer total iterations."""
    bb = min(MAX_BATCH_BLOCK, _round_up(bsz, BATCH_BLOCK))
    while bb > BATCH_BLOCK and not fits_vmem(t_len, s_pad, bb):
        bb -= BATCH_BLOCK
    return bb


def _ctc_run(logp_z, skip_bias, lens_f, end_f, t_len: int, interpret: bool):
    """logp_z [B, T, S_pad] -> (nll [B], grad [B, T, S_pad])."""
    lens = lens_f.astype(jnp.int32)
    end = end_f.astype(jnp.int32)
    bsz, t_dim, s_pad = logp_z.shape
    assert t_dim == t_len
    bb = pick_batch_block(bsz, t_len, s_pad)
    lp_t = jnp.moveaxis(logp_z, 1, 0)                        # [T, B, S_pad]
    b_pad = _round_up(bsz, bb)
    if b_pad != bsz:
        # padded rows: lens=0 (alpha frozen), outputs sliced away below
        lp_t = jnp.pad(lp_t, ((0, 0), (0, b_pad - bsz), (0, 0)),
                       constant_values=LOG_EPS)
        skip_bias = jnp.pad(skip_bias, ((0, b_pad - bsz), (0, 0)))
        lens = jnp.pad(lens, ((0, b_pad - bsz), (0, 0)))
        end = jnp.pad(end, ((0, b_pad - bsz), (0, 0)))

    nll, grad = pl.pallas_call(
        functools.partial(_ctc_kernel, t_len=t_len, s_pad=s_pad, bb=bb),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((t_len, bb, s_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, bb, s_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((t_len, b_pad, s_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((t_len, bb, s_pad), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b_pad * t_len * s_pad,
            bytes_accessed=2 * b_pad * t_len * s_pad * 4,
            transcendentals=6 * b_pad * t_len * s_pad,
        ),
    )(lp_t, skip_bias, lens, end)
    return nll[:bsz, 0], jnp.moveaxis(grad[:, :bsz], 0, 1)


def ctc_forward_pallas(log_probs: jax.Array, logit_lens: jax.Array,
                       labels: jax.Array, label_lens: jax.Array,
                       blank: int = BLANK_ID,
                       interpret: bool | None = None) -> jax.Array:
    """Drop-in for ops.ctc.ctc_forward (per-utterance NLL [B]), with the
    alpha/beta recursion in one Pallas kernel and a custom VJP."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, t_len, vocab = log_probs.shape
    z = extend_labels(labels, blank)                          # [B, S]
    s_len = z.shape[1]
    s_pad = _round_up(max(s_len, LANE), LANE)
    if not fits_vmem(t_len, s_pad):
        # very long T x wide S: the on-chip alpha scratch would exceed
        # VMEM; fall back to the scan backend (same numerics)
        from metaasr_tpu.ops.ctc import ctc_forward

        return ctc_forward(log_probs, logit_lens, labels, label_lens, blank)
    zp = jnp.pad(z, ((0, 0), (0, s_pad - s_len)), constant_values=blank)

    lp32 = log_probs.astype(jnp.float32)
    logp_z = jnp.take_along_axis(lp32, zp[:, None, :].astype(jnp.int32), 2)
    # padding lanes get LOG_EPS emissions so they can never win
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_pad), 2)
    logp_z = jnp.where(lane < s_len, logp_z, LOG_EPS)

    z_prev2 = jnp.pad(zp, ((0, 0), (2, 0)), constant_values=blank)[:, :s_pad]
    can_skip = (zp != blank) & (zp != z_prev2)
    skip_bias = jnp.where(can_skip, 0.0, LOG_EPS).astype(jnp.float32)

    lens = logit_lens.astype(jnp.float32)[:, None]
    end = (2 * label_lens.astype(jnp.int32)).astype(jnp.float32)[:, None]

    # Gradients: the custom JVP rules return d nll / d logp_z [B, T, S_pad]
    # (first order: the kernel's posterior grad; second order: scan-HVP
    # tangents); jax chains them through take_along_axis's VJP
    # (scatter-add back to [B, T, V]) automatically.
    return _ctc_pallas(t_len, interpret, logp_z, skip_bias, lens, end)


def ctc_loss_pallas(log_probs, logit_lens, labels, label_lens,
                    blank: int = BLANK_ID, zero_infinity: bool = True,
                    interpret: bool | None = None) -> jax.Array:
    nll = ctc_forward_pallas(log_probs, logit_lens, labels, label_lens,
                             blank, interpret)
    if zero_infinity:
        bad = nll > -0.5 * LOG_EPS
        nll = jnp.where(bad, 0.0, nll)
    return nll
