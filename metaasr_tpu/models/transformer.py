"""Joint CTC-attention transformer ASR (ESPnet-lineage behavior).

Reference behavior (R: src/model/transformer/*.py, SURVEY.md section 2.1 #9;
BASELINE.json:5,8): Conv2dSubsampling (2x conv stride 2 => 4x time
downsample) -> N encoder layers (d_model~256, heads~4, ff~2048) -> (a) CTC
linear head, (b) transformer decoder with cross-attention; joint loss
lambda*CTC + (1-lambda)*label-smoothed KL.

TPU-first design decisions:
- attention is einsum-only; softmax in fp32, everything else in a
  configurable compute dtype (bfloat16 on TPU);
- self-attention uses ONE fused QKV matmul (at d_model ~256 the MXU is
  launch-bound, so 3 projections -> 1 matters);
- cross-attention exposes a ``kv()`` method so decoding projects the
  encoder K/V ONCE per utterance instead of once per decode step;
- the decoder supports a FUNCTIONAL fixed-shape KV cache (explicit arrays
  threaded through ``decode_step``), so batched beam search runs entirely
  on device under ``lax.scan`` with static shapes (BASELINE.json:5
  "on-device batched hypothesis state");
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


def _attend(q, k, v, mask_bias, dtype, return_weights: bool = False):
    """Core attention: fp32 scores/softmax, compute-dtype everything else."""
    dh = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    weights = jax.nn.softmax(scores + mask_bias, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(dtype),
                     v.astype(dtype))
    if return_weights:
        return out, weights  # weights fp32 [B, H, Q, K]
    return out


def init_kv_cache(bsz: int, max_len: int, num_heads: int, head_dim: int,
                  dtype=jnp.float32) -> dict:
    shape = (bsz, max_len, num_heads, head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


class SelfAttention(nn.Module):
    """Fused-QKV multi-head self-attention with optional append cache."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    def setup(self):
        dh = self.d_model // self.num_heads
        self.qkv = nn.DenseGeneral((3, self.num_heads, dh), dtype=self.dtype,
                                   name="qkv")
        self.out = nn.DenseGeneral(self.d_model, axis=(-2, -1),
                                   dtype=self.dtype, name="out")

    def __call__(self, x: jax.Array, mask_bias: jax.Array,
                 cache: dict | None = None,
                 cache_index: jax.Array | None = None):
        """x [B, Q, D]. Decode mode: ``cache={'k','v': [B, Kmax, H, Dh]}``
        with ``cache_index`` = write position; attention runs over the full
        fixed-size cache (mask_bias must hide future rows)."""
        qkv = self.qkv(x)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        if cache is not None:
            k = jax.lax.dynamic_update_slice_in_dim(
                cache["k"], k.astype(cache["k"].dtype), cache_index, axis=1)
            v = jax.lax.dynamic_update_slice_in_dim(
                cache["v"], v.astype(cache["v"].dtype), cache_index, axis=1)
            cache = {"k": k, "v": v}
        return self.out(_attend(q, k, v, mask_bias, self.dtype)), cache


class CrossAttention(nn.Module):
    """Decoder->encoder attention; K/V precomputable per utterance."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    def setup(self):
        dh = self.d_model // self.num_heads
        proj = lambda name: nn.DenseGeneral(  # noqa: E731
            (self.num_heads, dh), dtype=self.dtype, name=name)
        self.q_proj = proj("q")
        self.k_proj = proj("k")
        self.v_proj = proj("v")
        self.out = nn.DenseGeneral(self.d_model, axis=(-2, -1),
                                   dtype=self.dtype, name="out")

    def kv(self, enc: jax.Array) -> dict:
        """Project encoder K/V once (reused across all decode steps)."""
        return {"k": self.k_proj(enc), "v": self.v_proj(enc)}

    def __call__(self, q_in: jax.Array, enc: jax.Array | None,
                 mask_bias: jax.Array, kv_cache: dict | None = None,
                 return_weights: bool = False):
        q = self.q_proj(q_in)
        kv = kv_cache if kv_cache is not None else self.kv(enc)
        if return_weights:
            att, w = _attend(q, kv["k"], kv["v"], mask_bias, self.dtype,
                             return_weights=True)
            return self.out(att), w
        return self.out(_attend(q, kv["k"], kv["v"], mask_bias, self.dtype))


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

    def setup(self):
        # pre-LN (normalize_before) — the stable ESPnet configuration
        self.norm1 = nn.LayerNorm(dtype=jnp.float32)
        self.norm2 = nn.LayerNorm(dtype=jnp.float32)
        self.attn = SelfAttention(self.d_model, self.num_heads, self.dtype,
                                  name="self_attn")
        self.ff = FeedForward(self.d_model, self.d_ff, self.dropout, self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, mask_bias, train: bool):
        y, _ = self.attn(self.norm1(x), mask_bias)
        x = x + self.drop(y, deterministic=not train)
        y = self.ff(self.norm2(x), train)
        return x + self.drop(y, deterministic=not train)


class Conv2dSubsampling(nn.Module):
    """Two stride-2 3x3 convs over [B, T, D, 1] => T/4, D/4, then linear.

    Kept as XLA's native convolution: two rewrites were benchmarked on a
    real v5e against the FOMAML grad-eval (16 utts, 4 s audio, d=256) and
    BOTH lost — tap-sum-of-9-matmuls (6.46 -> 9.08 ms: the slice VJPs
    emit 9 full-size pad ops) and space-to-depth phase packing into a
    dense 2x2 stride-1 conv (6.46 -> 8.11 ms: the pack/unpack transposes
    plus XLA's own re-layout outweigh the MXU-friendlier K). XLA's
    stride-2 conv lowering is already near the shape's roofline here.
    """

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

    def setup(self):
        self.norm1 = nn.LayerNorm(dtype=jnp.float32)
        self.norm2 = nn.LayerNorm(dtype=jnp.float32)
        self.norm3 = nn.LayerNorm(dtype=jnp.float32)
        self.self_attn = SelfAttention(self.d_model, self.num_heads,
                                       self.dtype, name="self_attn")
        self.cross_attn = CrossAttention(self.d_model, self.num_heads,
                                         self.dtype, name="cross_attn")
        self.ff = FeedForward(self.d_model, self.d_ff, self.dropout, self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, self_bias, enc, cross_bias, train: bool,
                 self_cache=None, cache_index=None, cross_kv=None,
                 return_cross_attn: bool = False):
        y, self_cache = self.self_attn(self.norm1(x), self_bias,
                                       cache=self_cache,
                                       cache_index=cache_index)
        x = x + self.drop(y, deterministic=not train)
        cross_w = None
        if return_cross_attn:
            y, cross_w = self.cross_attn(self.norm2(x), enc, cross_bias,
                                         kv_cache=cross_kv,
                                         return_weights=True)
        else:
            y = self.cross_attn(self.norm2(x), enc, cross_bias,
                                kv_cache=cross_kv)
        x = x + self.drop(y, deterministic=not train)
        y = self.ff(self.norm3(x), train)
        out = x + self.drop(y, deterministic=not train)
        if return_cross_attn:
            return out, self_cache, cross_w
        return out, self_cache

    def cross_kv(self, enc):
        return self.cross_attn.kv(enc.astype(self.dtype))


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
        return [init_kv_cache(bsz, max_decode_len, self.num_heads, dh,
                              self.dtype)
                for _ in range(self.num_layers)]

    def precompute_cross(self, enc) -> list[dict]:
        """Per-layer encoder K/V, projected once per utterance."""
        return [layer.cross_kv(enc) for layer in self.layers]

    def decode_step(self, tokens, step, caches, enc, enc_lens,
                    cross_caches=None, return_attn: bool = False):
        """One incremental step: tokens [B, 1] (the last emitted token),
        ``step`` scalar index, fixed-shape caches -> (log_probs [B, V],
        new caches). ``cross_caches`` (from precompute_cross) makes ``enc``
        optional; enc_lens is always required for the cross mask.

        ``return_attn``: additionally return the FINAL decoder layer's
        cross-attention distribution, head-averaged, [B, T_enc] — the
        coverage signal for the beam search's coverage penalty
        (SURVEY.md section 2.1 #11 '+ length penalty / coverage')."""
        x = self._embed_pos(tokens, start=step)
        kmax = caches[0]["k"].shape[1]
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, kmax), 3)
        self_bias = jnp.where(pos <= step, 0.0, NEG_INF).astype(jnp.float32)
        t_enc = (cross_caches[0]["k"].shape[1] if cross_caches is not None
                 else enc.shape[1])
        cross_bias = length_mask_bias(enc_lens, t_enc)
        enc_c = enc.astype(self.dtype) if enc is not None else None
        new_caches = []
        cross_w = None
        last = len(self.layers) - 1
        for i, (layer, cache) in enumerate(zip(self.layers, caches)):
            want_attn = return_attn and i == last
            out = layer(
                x, self_bias, enc_c, cross_bias, train=False,
                self_cache=cache, cache_index=step,
                cross_kv=None if cross_caches is None else cross_caches[i],
                return_cross_attn=want_attn)
            if want_attn:
                x, cache, cross_w = out
            else:
                x, cache = out
            new_caches.append(cache)
        logits = self.out_proj(self.final_norm(x))[:, 0]  # [B, V]
        logp = jax.nn.log_softmax(logits, axis=-1)
        if return_attn:
            return logp, new_caches, cross_w.mean(axis=1)[:, 0]  # [B, T_enc]
        return logp, new_caches


class TransformerASR(nn.Module):
    """Joint CTC-attention model: encoder + CTC head + attention decoder."""

    vocab_size: int
    d_model: int = 256
    num_heads: int = 4
    d_ff: int = 2048
    num_encoder_layers: int = 12
    num_decoder_layers: int = 6
    dropout: float = 0.1
    encoder_type: str = "transformer"  # "transformer" | "conformer"
    conformer_kernel: int = 15
    dtype: Any = jnp.float32

    def setup(self):
        if self.encoder_type == "conformer":
            from metaasr_tpu.models.conformer import ConformerEncoder

            self.encoder = ConformerEncoder(
                self.d_model, self.num_heads, self.d_ff,
                self.num_encoder_layers, self.dropout,
                kernel_size=self.conformer_kernel, dtype=self.dtype,
                name="encoder")
        else:
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

    def apply_ctc_head(self, enc):
        return self.ctc_head(enc)

    def decoder_init_state(self, bsz: int, max_decode_len: int):
        return self.decoder.init_state(bsz, max_decode_len)

    def decoder_precompute_cross(self, enc):
        return self.decoder.precompute_cross(enc)

    def decoder_step(self, tokens, step, caches, enc, enc_lens,
                     cross_caches=None, return_attn: bool = False):
        return self.decoder.decode_step(tokens, step, caches, enc, enc_lens,
                                        cross_caches, return_attn)
