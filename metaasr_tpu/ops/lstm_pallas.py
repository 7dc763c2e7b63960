"""Pallas LSTM kernel — the recurrent loop on-chip (SURVEY.md section 2.2
#N6: the reference leans on cuDNN LSTM; profiling here shows the
``lax.scan`` BLSTM is dispatch/HBM-bound, so this kernel keeps the
recurrent weights and the (h, c) carry in VMEM across the whole sequence).

Design:
- the big input projection gx = x @ W + b stays OUTSIDE (one MXU matmul
  over all timesteps — models/vgg_blstm.py already hoists it);
- forward: grid over T-chunks; per step  g = gx[t] + h @ U  (MXU),
  gates on the VPU; h and c live in VMEM scratch that PERSISTS across
  sequential TPU grid steps; emits h_seq and c_seq (residuals);
- backward (custom VJP): reversed grid; standard BPTT recurrences
  entirely on-chip; dU accumulates directly into its output block
  (same-block revisiting keeps it in VMEM); emits dgx [T, B, 4H] and
  dU [H, 4H];
- fp32; gate order (i, f, g, o) with the +1 forget bias, matching the
  scan implementation bit-for-bit in interpret mode.

Length masking is NOT done in-kernel: padded timesteps sit after the
valid frames (callers mask outputs; upstream cotangents at padded steps
are zero, and zeros propagate cleanly through the backward recurrence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_CHUNK = 32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gates(g, hidden: int):
    i = jax.nn.sigmoid(g[:, :hidden])
    f = jax.nn.sigmoid(g[:, hidden: 2 * hidden] + 1.0)
    gg = jnp.tanh(g[:, 2 * hidden: 3 * hidden])
    o = jax.nn.sigmoid(g[:, 3 * hidden:])
    return i, f, gg, o


def _fwd_kernel(gx_ref, u_ref, h_out, c_out, h_scr, c_scr, *, tc: int,
                hidden: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    def step(t, _):
        h, c = h_scr[:], c_scr[:]
        g = gx_ref[t] + jnp.dot(h, u_ref[:],
                                preferred_element_type=jnp.float32)
        i, f, gg, o = _gates(g, hidden)
        c = f * c + i * gg
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        h_out[t] = h
        c_out[t] = c
        return 0

    jax.lax.fori_loop(0, tc, step, 0)


def _bwd_kernel(gx_ref, u_ref, hprev_ref, cprev_ref, c_ref, dout_ref,
                dgx_ref, du_ref, dh_scr, dc_scr, *, tc: int, hidden: int):
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        du_ref[:] = jnp.zeros_like(du_ref)

    def step(j, _):
        t = tc - 1 - j
        h_prev = hprev_ref[t]
        c_prev = cprev_ref[t]
        g = gx_ref[t] + jnp.dot(h_prev, u_ref[:],
                                preferred_element_type=jnp.float32)
        i, f, gg, o = _gates(g, hidden)
        tc_t = jnp.tanh(c_ref[t])
        dh_tot = dout_ref[t] + dh_scr[:]
        dc_tot = dh_tot * o * (1.0 - tc_t * tc_t) + dc_scr[:]
        do_pre = dh_tot * tc_t * o * (1.0 - o)
        df_pre = dc_tot * c_prev * f * (1.0 - f)
        di_pre = dc_tot * gg * i * (1.0 - i)
        dg_pre = dc_tot * i * (1.0 - gg * gg)
        dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=1)
        dgx_ref[t] = dgates
        # dh_{t-1} = dgates @ U^T ; dU += h_{t-1}^T @ dgates
        dh_scr[:] = jax.lax.dot_general(
            dgates, u_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dc_scr[:] = dc_tot * f
        du_ref[:] += jax.lax.dot_general(
            h_prev, dgates, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, tc, step, 0)


def _pad_tb(x, t_pad, b_pad):
    t, b = x.shape[0], x.shape[1]
    if t_pad == t and b_pad == b:
        return x
    return jnp.pad(x, ((0, t_pad - t), (0, b_pad - b), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_lstm(gx: jax.Array, u: jax.Array, interpret: bool = False):
    """gx [T, B, 4H] (input projections incl. bias), u [H, 4H] ->
    h_seq [T, B, H]. Zero initial state; gate order (i, f, g, o) with +1
    forget bias — identical to the scan LSTM in models/vgg_blstm.py."""
    h_seq, _ = _lstm_fwd_run(gx, u, interpret)
    return h_seq


def _lstm_fwd_run(gx, u, interpret: bool):
    t_len, bsz, h4 = gx.shape
    hidden = h4 // 4
    t_pad = _round_up(t_len, T_CHUNK)
    b_pad = _round_up(bsz, 8)
    gxp = _pad_tb(gx.astype(jnp.float32), t_pad, b_pad)
    h_seq, c_seq = pl.pallas_call(
        functools.partial(_fwd_kernel, tc=T_CHUNK, hidden=hidden),
        grid=(t_pad // T_CHUNK,),
        in_specs=[
            pl.BlockSpec((T_CHUNK, b_pad, h4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T_CHUNK, b_pad, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, b_pad, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b_pad, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, b_pad, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b_pad, hidden), jnp.float32),
                        pltpu.VMEM((b_pad, hidden), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * b_pad * hidden * h4,
            bytes_accessed=t_pad * b_pad * (h4 + 2 * hidden) * 4,
            transcendentals=4 * t_pad * b_pad * hidden,
        ),
    )(gxp, u.astype(jnp.float32))
    return h_seq[:t_len, :bsz], (gxp, u, h_seq, c_seq, t_len, bsz)


def _lstm_vjp_fwd(gx, u, interpret):
    h_seq, res = _lstm_fwd_run(gx, u, interpret)
    return h_seq, res


def _lstm_vjp_bwd(interpret, res, dout):
    gxp, u, h_seq, c_seq, t_len, bsz = res
    t_pad, b_pad, hidden = h_seq.shape
    h4 = 4 * hidden
    zeros_row = jnp.zeros((1, b_pad, hidden), jnp.float32)
    h_prev = jnp.concatenate([zeros_row, h_seq[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros_row, c_seq[:-1]], axis=0)
    dout_p = _pad_tb(dout.astype(jnp.float32), t_pad, b_pad)
    n_chunks = t_pad // T_CHUNK
    rev = lambda i: (n_chunks - 1 - i, 0, 0)  # noqa: E731
    dgx, du = pl.pallas_call(
        functools.partial(_bwd_kernel, tc=T_CHUNK, hidden=hidden),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((T_CHUNK, b_pad, h4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, b_pad, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, b_pad, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, b_pad, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, b_pad, hidden), rev,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T_CHUNK, b_pad, h4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b_pad, h4), jnp.float32),
            jax.ShapeDtypeStruct((hidden, h4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b_pad, hidden), jnp.float32),
                        pltpu.VMEM((b_pad, hidden), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * t_pad * b_pad * hidden * h4,
            bytes_accessed=t_pad * b_pad * (2 * h4 + 4 * hidden) * 4,
            transcendentals=4 * t_pad * b_pad * hidden,
        ),
    )(gxp, u.astype(jnp.float32), h_prev, c_prev, c_seq, dout_p)
    return dgx[:t_len, :bsz], du


pallas_lstm.defvjp(_lstm_vjp_fwd, _lstm_vjp_bwd)


def lstm_scan_reference(gx: jax.Array, u: jax.Array) -> jax.Array:
    """The lax.scan formulation (identical math) for tests/benchmarks."""
    t_len, bsz, h4 = gx.shape
    hidden = h4 // 4

    def step(carry, gx_t):
        h, c = carry
        g = gx_t + h @ u
        i, f, gg, o = (g[:, :hidden], g[:, hidden:2*hidden],
                       g[:, 2*hidden:3*hidden], g[:, 3*hidden:])
        c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((bsz, hidden), jnp.float32),
            jnp.zeros((bsz, hidden), jnp.float32))
    _, hs = jax.lax.scan(step, init, gx)
    return hs
