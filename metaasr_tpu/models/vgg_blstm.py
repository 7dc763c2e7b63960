"""VGG-BLSTM CTC phone recognizer (the reference's baseline model).

Reference behavior (R: src/model/vgg_blstm.py, SURVEY.md section 2.1 #8;
BASELINE.json:7): 2 VGG conv blocks (64 -> 128 channels, each 2x conv3x3 +
maxpool 2x2 => 4x time & freq downsample) -> multi-layer BLSTM (~320
units/dir) -> linear -> CTC softmax.

TPU-first design decisions:
- the BLSTM is NOT a cuDNN translation: the input projection for ALL
  timesteps is one large [B*T, D]x[D, 4H] matmul (MXU), and only the tiny
  recurrent h @ U matmul lives inside ``lax.scan`` (SURVEY.md section 2.2
  #N6 — XLA fuses the scan body; Pallas only if profiling demands);
- the backward direction uses a length-aware flip (gather by
  ``lens-1-t``) so padded frames sit AFTER the valid frames in scan order
  — padding can never contaminate valid outputs, matching the reference's
  pack_padded semantics without ragged shapes;
- convs run in NHWC ([B, T, freq, C]) which is XLA-TPU's native conv
  layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from metaasr_tpu.utils.padding import make_non_pad_mask, vgg_subsampled_lengths


def flip_padded(x: jax.Array, lens: jax.Array) -> jax.Array:
    """Reverse each sequence's valid prefix in place; padding stays at the end.

    [B, T, ...], lens [B]. Involution: applying twice restores the input
    on valid positions.
    """
    t_len = x.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], t_len), 1)
    idx = jnp.where(pos < lens[:, None], lens[:, None] - 1 - pos, pos)
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


class LSTMLayer(nn.Module):
    """Unidirectional LSTM over padded [B, T, D]; big input matmul hoisted
    out of the recurrence.

    ``impl``: "scan" (lax.scan; fully differentiable, any-order) or
    "pallas" (ops/lstm_pallas.py — recurrence on-chip with a custom BPTT
    VJP; first-order only) or "auto" (pallas on TPU fp32, scan elsewhere).
    """

    hidden: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32
    impl: str = "scan"

    @nn.compact
    def __call__(self, x: jax.Array, lens: jax.Array) -> jax.Array:
        bsz, t_len, _ = x.shape
        h4 = 4 * self.hidden
        if self.reverse:
            x = flip_padded(x, lens)
        # One MXU-sized matmul for all timesteps' input projections.
        gx = nn.Dense(h4, dtype=self.dtype, name="input_proj")(x)  # [B, T, 4H]
        u = self.param("recurrent", nn.initializers.orthogonal(),
                       (self.hidden, h4), jnp.float32)
        u = u.astype(self.dtype)

        impl = self.impl
        if impl == "auto":
            # Measured on v5e: the Pallas LSTM only ties the XLA scan loop
            # (XLA already keeps the recurrence on-device), and Mosaic
            # rejects the backward at non-128-aligned hidden sizes, so
            # "auto" resolves to scan; "pallas" stays available explicitly
            # for aligned shapes.
            impl = "scan"
        if impl == "pallas" and self.hidden % 128:
            impl = "scan"
        if impl == "pallas":
            from metaasr_tpu.ops.lstm_pallas import pallas_lstm

            hs = pallas_lstm(jnp.moveaxis(gx, 1, 0).astype(jnp.float32),
                             u.astype(jnp.float32),
                             jax.default_backend() != "tpu")
        else:
            def step(carry, gx_t):
                h, c = carry
                g = gx_t + h @ u
                i, f, gg, o = jnp.split(g, 4, axis=-1)
                # forget-gate bias +1 (standard LSTM training stability)
                c = (jax.nn.sigmoid(f + 1.0) * c
                     + jax.nn.sigmoid(i) * jnp.tanh(gg))
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            init = (jnp.zeros((bsz, self.hidden), self.dtype),
                    jnp.zeros((bsz, self.hidden), self.dtype))
            _, hs = jax.lax.scan(step, init, jnp.moveaxis(gx, 1, 0))
        out = jnp.moveaxis(hs, 0, 1)  # [B, T, H]
        if self.reverse:
            out = flip_padded(out, lens)
        return out


class BLSTM(nn.Module):
    """Stack of bidirectional LSTM layers with output masking."""

    hidden: int
    layers: int
    dtype: jnp.dtype = jnp.float32
    lstm_impl: str = "scan"

    @nn.compact
    def __call__(self, x: jax.Array, lens: jax.Array) -> jax.Array:
        mask = make_non_pad_mask(lens, x.shape[1])[..., None]
        for i in range(self.layers):
            fwd = LSTMLayer(self.hidden, reverse=False, dtype=self.dtype,
                            impl=self.lstm_impl, name=f"fwd_{i}")(x, lens)
            bwd = LSTMLayer(self.hidden, reverse=True, dtype=self.dtype,
                            impl=self.lstm_impl, name=f"bwd_{i}")(x, lens)
            x = jnp.concatenate([fwd, bwd], axis=-1)
            x = jnp.where(mask, x, 0.0)
        return x


class VGGExtractor(nn.Module):
    """Two VGG blocks: (conv3x3 xN, maxpool2x2) x2 => T/4, freq/4."""

    channels: tuple = (64, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        # [B, T, D] -> NHWC image [B, T, D, 1]
        x = feats[..., None].astype(self.dtype)
        for bi, ch in enumerate(self.channels):
            for ci in range(2):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{bi}_{ci}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        b, t, f, c = x.shape
        return x.reshape(b, t, f * c)  # [B, T/4, (D/4)*C]


class VGGBLSTMCTC(nn.Module):
    """feats [B, T, D], feat_lens -> (ctc_logits [B, T/4, V], out_lens)."""

    vocab_size: int
    blstm_hidden: int = 320
    blstm_layers: int = 4
    vgg_channels: tuple = (64, 128)
    dtype: jnp.dtype = jnp.float32
    lstm_impl: str = "auto"

    @nn.compact
    def __call__(self, feats: jax.Array, feat_lens: jax.Array,
                 train: bool = False):
        # Pin padding frames to zero so conv windows that straddle the valid
        # boundary see deterministic zeros (torch zero-pad semantics).
        feats = jnp.where(
            make_non_pad_mask(feat_lens, feats.shape[1])[..., None], feats, 0.0)
        x = VGGExtractor(self.vgg_channels, dtype=self.dtype)(feats)
        out_lens = vgg_subsampled_lengths(feat_lens, len(self.vgg_channels))
        x = BLSTM(self.blstm_hidden, self.blstm_layers, dtype=self.dtype,
                  lstm_impl=self.lstm_impl)(x, out_lens)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32, name="ctc_head")(x)
        return logits, out_lens

    def output_lengths(self, feat_lens: jax.Array) -> jax.Array:
        return vgg_subsampled_lengths(feat_lens, len(self.vgg_channels))
