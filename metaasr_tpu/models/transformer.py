"""Joint CTC-attention transformer ASR (ESPnet-lineage behavior).

Reference behavior (R: src/model/transformer/*.py, SURVEY.md section 2.1 #9;
BASELINE.json:5,8): Conv2dSubsampling (2x conv stride 2 => 4x time
downsample) -> N encoder layers (d_model~256, heads~4, ff~2048) -> (a) CTC
linear head, (b) transformer decoder with cross-attention; joint loss
lambda*CTC + (1-lambda)*label-smoothed KL.

TPU-first design decisions:
- attention is einsum-only (no torch-style reshape gymnastics); softmax in
  fp32, everything else in a configurable compute dtype (bfloat16 on TPU);
- the decoder supports a FUNCTIONAL fixed-shape KV cache (explicit arrays
  threaded through ``decode_step``), so batched beam search runs entirely
  on device under ``lax.while_loop``/``scan`` with static shapes
  (BASELINE.json:5 "on-device batched hypothesis state");
- masks are additive fp32 biases built from length vectors via iota
  comparisons — no boolean ragged shapes under jit.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from metaasr_tpu.utils.padding import make_non_pad_mask, subsampled_lengths

NEG_INF = -1e9  # additive mask bias (fp32-safe through softmax)


def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    pos = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def length_mask_bias(lens: jax.Array, max_len: int) -> jax.Array:
    """[B] -> [B, 1, 1, max_len] additive bias (0 valid / NEG_INF pad)."""
    valid = make_non_pad_mask(lens, max_len)
    return jnp.where(valid, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)


def causal_mask_bias(q_len: int, k_len: int, offset: int = 0) -> jax.Array:
    """[1, 1, q_len, k_len] additive causal bias; query t sees keys <= t+offset."""
    q = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    return jnp.where(k <= q + offset, 0.0, NEG_INF)[None, None].astype(jnp.float32)


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in: jax.Array, kv_in: jax.Array, mask_bias: jax.Array,
                 cache: dict | None = None, cache_index: jax.Array | None = None):
        """q_in [B, Q, D]; kv_in [B, K, D]; mask_bias broadcastable to
        [B, H, Q, K].

        Cache modes (decode):
        - self-attn append: ``cache={'k': [B, Kmax, H, Dh], 'v': ...}`` with
          ``cache_index`` = current step; the new K/V rows are written at
          that index and attention runs over the full fixed-size cache
          (mask_bias must hide future rows).
        - cross-attn reuse: pass precomputed k/v via cache with
          ``cache_index=None`` and kv_in=None.
        """
        dh = self.d_model // self.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (self.num_heads, dh), dtype=self.dtype, name=name)
        q = dense("q")(q_in)
        if cache is not None and cache_index is None:
            k, v = cache["k"], cache["v"]  # precomputed cross-attn K/V
        else:
            k = dense("k")(kv_in)
            v = dense("v")(kv_in)
            if cache is not None:
                # fixed-shape append at cache_index
                k = jax.lax.dynamic_update_slice_in_dim(
                    cache["k"], k.astype(cache["k"].dtype), cache_index, axis=1)
                v = jax.lax.dynamic_update_slice_in_dim(
                    cache["v"], v.astype(cache["v"].dtype), cache_index, axis=1)
                cache = {"k": k, "v": v}
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        weights = jax.nn.softmax(scores + mask_bias, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v.astype(self.dtype))
        out = nn.DenseGeneral(self.d_model, axis=(-2, -1), dtype=self.dtype,
                              name="out")(out)
        return out, cache

    @staticmethod
    def init_cache(bsz: int, max_len: int, num_heads: int, head_dim: int,
                   dtype=jnp.float32) -> dict:
        shape = (bsz, max_len, num_heads, head_dim)
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


class FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.d_ff, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.d_model, dtype=self.dtype)(x)


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, train: bool):
        # pre-LN (normalize_before) — the stable ESPnet configuration
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y, _ = MultiHeadAttention(self.d_model, self.num_heads, self.dtype,
                                  name="self_attn")(y, y, mask_bias)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = FeedForward(self.d_model, self.d_ff, self.dropout, self.dtype)(y, train)
        return x + nn.Dropout(self.dropout, deterministic=not train)(y)


class Conv2dSubsampling(nn.Module):
    """Two stride-2 3x3 convs over [B, T, D, 1] => T/4, D/4, then linear."""

    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats[..., None].astype(self.dtype)
        x = nn.Conv(self.d_model, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.d_model, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        b, t, f, c = x.shape
        return nn.Dense(self.d_model, dtype=self.dtype, name="proj")(
            x.reshape(b, t, f * c))


class Encoder(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    num_layers: int
    dropout: float
    max_len: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool):
        # zero padding frames: conv windows near the boundary see zeros
        feats = jnp.where(
            make_non_pad_mask(feat_lens, feats.shape[1])[..., None], feats, 0.0)
        x = Conv2dSubsampling(self.d_model, self.dtype, name="subsample")(feats)
        out_lens = subsampled_lengths(feat_lens, 4)
        t_len = x.shape[1]
        pe = jnp.asarray(sinusoidal_positions(self.max_len, self.d_model))
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype)) + pe[None, :t_len].astype(x.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        bias = length_mask_bias(out_lens, t_len)
        for i in range(self.num_layers):
            x = EncoderLayer(self.d_model, self.num_heads, self.d_ff,
                             self.dropout, self.dtype, name=f"layer_{i}")(x, bias, train)
        x = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(x)
        # zero padded frames so downstream heads see clean zeros
        x = jnp.where(make_non_pad_mask(out_lens, t_len)[..., None], x, 0.0)
        return x, out_lens


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, self_bias, enc, cross_bias, train: bool,
                 self_cache=None, cache_index=None, cross_cache=None):
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y, self_cache = MultiHeadAttention(
            self.d_model, self.num_heads, self.dtype, name="self_attn")(
            y, y, self_bias, cache=self_cache, cache_index=cache_index)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y, _ = MultiHeadAttention(
            self.d_model, self.num_heads, self.dtype, name="cross_attn")(
            y, enc, cross_bias, cache=cross_cache, cache_index=None)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = FeedForward(self.d_model, self.d_ff, self.dropout, self.dtype)(y, train)
        return x + nn.Dropout(self.dropout, deterministic=not train)(y), self_cache


class Decoder(nn.Module):
    vocab_size: int
    d_model: int
    num_heads: int
    d_ff: int
    num_layers: int
    dropout: float
    max_len: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model,
                              embedding_init=nn.initializers.normal(1.0),
                              name="embed")
        self.layers = [
            DecoderLayer(self.d_model, self.num_heads, self.d_ff, self.dropout,
                         self.dtype, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=jnp.float32, name="final_norm")
        self.out_proj = nn.Dense(self.vocab_size, dtype=jnp.float32, name="out_proj")

    def _embed_pos(self, tokens, start: int | jax.Array = 0):
        pe = jnp.asarray(sinusoidal_positions(self.max_len, self.d_model))
        x = self.embed(tokens) * jnp.sqrt(jnp.asarray(self.d_model, jnp.float32))
        if isinstance(start, int) and start == 0:
            x = x + pe[None, : tokens.shape[1]]
        else:
            x = x + jax.lax.dynamic_slice_in_dim(pe, start, tokens.shape[1], 0)[None]
        return x.astype(self.dtype)

    def __call__(self, tokens, token_lens, enc, enc_lens, train: bool = False):
        """Teacher-forced forward: tokens [B, U] (sos-prefixed),
        -> logits [B, U, V]."""
        u_len = tokens.shape[1]
        x = self._embed_pos(tokens)
        self_bias = causal_mask_bias(u_len, u_len) + length_mask_bias(token_lens, u_len)
        cross_bias = length_mask_bias(enc_lens, enc.shape[1])
        for layer in self.layers:
            x, _ = layer(x, self_bias, enc.astype(self.dtype), cross_bias, train)
        return self.out_proj(self.final_norm(x))

    def init_state(self, bsz: int, max_decode_len: int) -> list[dict]:
        dh = self.d_model // self.num_heads
        return [MultiHeadAttention.init_cache(bsz, max_decode_len,
                                              self.num_heads, dh, self.dtype)
                for _ in range(self.num_layers)]

    def decode_step(self, tokens, step, caches, enc, enc_lens):
        """One incremental step: tokens [B, 1] (the last emitted token),
        ``step`` scalar index, fixed-shape caches -> (log_probs [B, V],
        new caches)."""
        x = self._embed_pos(tokens, start=step)
        kmax = caches[0]["k"].shape[1]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, kmax), 3)
        self_bias = jnp.where(pos <= step, 0.0, NEG_INF).astype(jnp.float32)
        cross_bias = length_mask_bias(enc_lens, enc.shape[1])
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer(x, self_bias, enc.astype(self.dtype), cross_bias,
                             train=False, self_cache=cache, cache_index=step)
            new_caches.append(cache)
        logits = self.out_proj(self.final_norm(x))[:, 0]  # [B, V]
        return jax.nn.log_softmax(logits, axis=-1), new_caches


class TransformerASR(nn.Module):
    """Joint CTC-attention model: encoder + CTC head + attention decoder."""

    vocab_size: int
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048
    num_encoder_layers: int = 12
    num_decoder_layers: int = 6
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.d_model, self.num_heads, self.d_ff,
                               self.num_encoder_layers, self.dropout,
                               dtype=self.dtype, name="encoder")
        self.ctc_head = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                 name="ctc_head")
        self.decoder = Decoder(self.vocab_size, self.d_model, self.num_heads,
                               self.d_ff, self.num_decoder_layers, self.dropout,
                               dtype=self.dtype, name="decoder")

    def encode(self, feats, feat_lens, train: bool = False):
        return self.encoder(feats, feat_lens, train)

    def __call__(self, feats, feat_lens, tokens_in, token_in_lens,
                 train: bool = False):
        """tokens_in: sos-prefixed decoder inputs [B, U+1].

        Returns dict: ctc_logits [B, T', V], att_logits [B, U+1, V],
        enc_lens [B].
        """
        enc, enc_lens = self.encode(feats, feat_lens, train)
        ctc_logits = self.ctc_head(enc)
        att_logits = self.decoder(tokens_in, token_in_lens, enc, enc_lens, train)
        return {"ctc_logits": ctc_logits, "att_logits": att_logits,
                "enc_lens": enc_lens, "encoder_out": enc}

    def ctc_logits_only(self, feats, feat_lens, train: bool = False):
        enc, enc_lens = self.encode(feats, feat_lens, train)
        return self.ctc_head(enc), enc_lens

    def decoder_init_state(self, bsz: int, max_decode_len: int):
        return self.decoder.init_state(bsz, max_decode_len)

    def decoder_step(self, tokens, step, caches, enc, enc_lens):
        return self.decoder.decode_step(tokens, step, caches, enc, enc_lens)
