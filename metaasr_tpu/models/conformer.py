"""Conformer encoder — drop-in alternative to the transformer encoder.

The reference family is ESPnet-lineage (SURVEY.md section 2.1 #9); the
Conformer (Gulati et al. 2020) is that lineage's standard stronger encoder
and shares every interface with the transformer encoder here: the block is
macaron feed-forward (two half-step FFNs) around relative-position
self-attention and a depthwise-convolution module. Enabled with
``model.encoder = "conformer"`` — the decoder, CTC head, beam search and
meta-learning transforms are unchanged.

TPU-first design decisions:
- **Relative position attention** (Transformer-XL style) uses the
  pad-reshape skew: scores_bd is one einsum against a [2T-1, D] position
  table followed by a pad+reshape — static shapes, no gather, MXU-friendly
  (validated against a per-(q,k)-pair naive construction in tests).
- **No BatchNorm.** The conformer paper's conv module uses BatchNorm;
  running batch statistics are *state*, which breaks the functional
  meta-learning contract (task-vmapped fast weights must be pure
  parameter pytrees, and support/query statistics would leak across the
  inner/outer split). LayerNorm is the standard stateless substitution
  (used by wav2vec2-conformer for the same reason); documented here as a
  deliberate deviation, not an omission.
- **Masked depthwise conv.** Attention output at padded frames is
  garbage (masked *keys*, not queries); the conv module re-zeros padded
  frames before the depthwise conv so boundary windows of valid frames
  never read it. The depthwise conv is K static shifted multiply-adds,
  NOT ``feature_group_count=d`` — the grouped-conv primitive's vmapped
  gradient lowers incorrectly on TPU and silently corrupted every
  meta-gradient (see DepthwiseConv1d; docs/DESIGN.md section 8). At
  kernel 15 x d=256 it is a bandwidth-trivial op next to the FFN GEMMs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from metaasr_tpu.models.transformer import (
    Conv2dSubsampling,
    length_mask_bias,
    sinusoidal_positions,
)
from metaasr_tpu.utils.padding import make_non_pad_mask, subsampled_lengths


def relative_positions(max_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal table over relative offsets [max_len-1 .. -(max_len-1)],
    shape [2*max_len-1, d_model]; row i encodes offset (max_len-1-i)."""
    pos = np.arange(max_len - 1, -max_len, -1)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    pe = np.zeros((2 * max_len - 1, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def rel_shift(x: jax.Array) -> jax.Array:
    """[B, H, T, 2T-1] -> [B, H, T, T]: row t keeps columns so that output
    [..., t, s] = input[..., t, (T-1) + (s - t)] (offset t-s indexed from a
    [2T-1]-wide diagonal band). The Transformer-XL pad+reshape trick —
    static shapes only, no gather."""
    b, h, t, w = x.shape  # w == 2t-1
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B,H,T,2T]
    x = x.reshape(b, h, 2 * t, t)[:, :, 1:, :]  # drop the pad-induced row
    return x.reshape(b, h, t, 2 * t - 1)[..., :t]


class RelPosSelfAttention(nn.Module):
    """Multi-head self-attention with Transformer-XL relative positions.

    score(t,s) = (q_t + u)·k_s + (q_t + v)·r_{t-s}   (content + position),
    u/v learned per-head biases, r the sinusoidal relative table projected
    once per layer. Softmax in fp32 like the transformer path.
    """

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    def setup(self):
        dh = self.d_model // self.num_heads
        self.qkv = nn.DenseGeneral((3, self.num_heads, dh), dtype=self.dtype,
                                   name="qkv")
        self.pos_proj = nn.DenseGeneral((self.num_heads, dh), use_bias=False,
                                        dtype=self.dtype, name="pos")
        self.out = nn.DenseGeneral(self.d_model, axis=(-2, -1),
                                   dtype=self.dtype, name="out")
        init = nn.initializers.normal(0.02)
        self.u_bias = self.param("u_bias", init, (self.num_heads, dh),
                                 jnp.float32)
        self.v_bias = self.param("v_bias", init, (self.num_heads, dh),
                                 jnp.float32)

    def __call__(self, x: jax.Array, mask_bias: jax.Array) -> jax.Array:
        t = x.shape[1]
        dh = self.d_model // self.num_heads
        qkv = self.qkv(x)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        rel = jnp.asarray(relative_positions(t, self.d_model))  # [2T-1, D]
        r = self.pos_proj(rel.astype(self.dtype))  # [2T-1, H, Dh]
        qf = q.astype(jnp.float32)
        ac = jnp.einsum("bqhd,bkhd->bhqk", qf + self.u_bias[None, None], k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bqhd,phd->bhqp", qf + self.v_bias[None, None], r,
                        preferred_element_type=jnp.float32)
        scores = (ac + rel_shift(bd)) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        weights = jax.nn.softmax(scores + mask_bias, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(self.dtype),
                         v.astype(self.dtype))
        return self.out(out)


class DepthwiseConv1d(nn.Module):
    """Per-channel (depthwise) 1-D conv as K static shifted multiply-adds.

    Replaces ``nn.Conv(feature_group_count=d_model)``. The grouped-conv
    primitive's **vmapped gradient lowers incorrectly on TPU**: with the
    nn.Conv form, the FOMAML outer gradient computed through the task-vmapped
    meta loss diverged from an explicit per-task loop by ~1e3 relative
    (grad-norm 167–199 vmapped vs 64 looped, worst leaves all in the conv
    module's neighbors; measured on-chip at both fp32 and bf16 —
    scripts/vmap_parity_probe.py, docs/DESIGN.md section 8). That silently
    broke conformer meta-training (CTC head mode-collapsed, WER ~1.0) while
    the unvmapped multitask path — the only path the conv tests exercised —
    stayed correct.

    The shifted-sum form uses only pad/slice/FMA ops, whose batching and
    transpose rules are trivially correct, and is bandwidth-trivial next to
    the FFN GEMMs (K elementwise FMAs on [B, T, C]; K=15, C=256). Param
    layout matches the nn.Conv it replaces (kernel [K, 1, C], bias [C],
    lecun-normal / zeros init) so existing checkpoints load unchanged.
    """

    features: int
    kernel_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, 1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        w = kernel[:, 0, :].astype(self.dtype)
        t = x.shape[1]
        # TF/XLA "SAME" padding for stride 1: lo = (k-1)//2, hi = rest;
        # cross-correlation (no kernel flip), matching nn.Conv semantics:
        # out[t] = sum_i x[t - lo + i] * w[i]
        lo = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (lo, k - 1 - lo), (0, 0)))
        y = xp[:, :t] * w[0]
        for i in range(1, k):
            y = y + jax.lax.slice_in_dim(xp, i, i + t, axis=1) * w[i]
        return y + bias.astype(self.dtype)


class ConvModule(nn.Module):
    """Pointwise(2d)+GLU -> masked depthwise(kernel) -> LN -> swish ->
    pointwise(d). LayerNorm instead of the paper's BatchNorm (stateless —
    see module docstring)."""

    d_model: int
    kernel_size: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array, train: bool):
        # pad_mask [B, T, 1] True at valid frames
        x = nn.Dense(2 * self.d_model, dtype=self.dtype, name="pw1")(x)
        x = nn.glu(x, axis=-1)
        x = jnp.where(pad_mask, x, 0.0)  # conv windows must not read pad
        x = DepthwiseConv1d(self.d_model, self.kernel_size, self.dtype,
                            name="depthwise")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        x = nn.swish(x)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="pw2")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class ConformerFeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.d_ff, dtype=self.dtype)(x)
        x = nn.swish(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.d_model, dtype=self.dtype)(x)


class ConformerLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float
    kernel_size: int = 15
    dtype: Any = jnp.float32

    def setup(self):
        self.norm_ff1 = nn.LayerNorm(dtype=jnp.float32)
        self.norm_attn = nn.LayerNorm(dtype=jnp.float32)
        self.norm_conv = nn.LayerNorm(dtype=jnp.float32)
        self.norm_ff2 = nn.LayerNorm(dtype=jnp.float32)
        self.norm_out = nn.LayerNorm(dtype=jnp.float32)
        self.ff1 = ConformerFeedForward(self.d_model, self.d_ff, self.dropout,
                                        self.dtype)
        self.attn = RelPosSelfAttention(self.d_model, self.num_heads,
                                        self.dtype, name="self_attn")
        self.conv = ConvModule(self.d_model, self.kernel_size, self.dropout,
                               self.dtype)
        self.ff2 = ConformerFeedForward(self.d_model, self.d_ff, self.dropout,
                                        self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, mask_bias, pad_mask, train: bool):
        d = lambda y: self.drop(y, deterministic=not train)  # noqa: E731
        x = x + 0.5 * d(self.ff1(self.norm_ff1(x).astype(self.dtype), train))
        x = x + d(self.attn(self.norm_attn(x).astype(self.dtype), mask_bias))
        x = x + d(self.conv(self.norm_conv(x).astype(self.dtype), pad_mask,
                            train))
        x = x + 0.5 * d(self.ff2(self.norm_ff2(x).astype(self.dtype), train))
        return self.norm_out(x).astype(self.dtype)


class ConformerEncoder(nn.Module):
    """Same interface as models.transformer.Encoder:
    (feats, feat_lens, train) -> (enc [B, T', D], out_lens [B])."""

    d_model: int
    num_heads: int
    d_ff: int
    num_layers: int
    dropout: float
    kernel_size: int = 15
    max_len: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool):
        feats = jnp.where(
            make_non_pad_mask(feat_lens, feats.shape[1])[..., None], feats, 0.0)
        x = Conv2dSubsampling(self.d_model, self.dtype, name="subsample")(feats)
        out_lens = subsampled_lengths(feat_lens, 4)
        t_len = x.shape[1]
        # Absolute sinusoidal positions are added AS A VARIANCE FLOOR, not
        # for position information (the rel-attention term carries that
        # per-layer). Without them, a SpecAugment time-masked input region
        # maps (through the zero-init-bias subsampler) to an exactly-
        # constant feature vector at every masked frame; LayerNorm of a
        # constant vector has sigma=0 and its backward multiplies by
        # 1/sqrt(eps) ~ 1e3 — measured: the loss gradient at layer 0's
        # input was 1000x the gradient one LN downstream, the subsample
        # proj BIAS gradient hit rms 4.7e4 (kernel rms 0.15), and training
        # converged ~3x slower than the transformer encoder until this
        # floor was added. torch escapes the same trap only through its
        # nonzero default bias init; the PE floor also covers degenerate
        # inputs the init trick cannot (see docs/DESIGN.md section 7).
        pe = jnp.asarray(sinusoidal_positions(self.max_len, self.d_model))
        x = (x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
             + pe[None, :t_len].astype(x.dtype))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        bias = length_mask_bias(out_lens, t_len)
        pad_mask = make_non_pad_mask(out_lens, t_len)[..., None]
        for i in range(self.num_layers):
            x = ConformerLayer(self.d_model, self.num_heads, self.d_ff,
                               self.dropout, self.kernel_size, self.dtype,
                               name=f"layer_{i}")(x, bias, pad_mask, train)
        x = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(x)
        return jnp.where(pad_mask, x, 0.0), out_lens
