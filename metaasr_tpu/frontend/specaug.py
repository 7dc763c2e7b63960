"""SpecAugment — on-device, batched, jit-friendly.

The reference applies SpecAugment on the host per utterance at load time
(R: src/specaug.py, SURVEY.md section 2.1 #17): mF freq masks of width
U[0, F), mT time masks of width U[0, T) capped at a ratio of the utterance
length. Here masks are sampled with the jax PRNG and applied as boolean
iota-range comparisons over the whole padded batch — no host work, fuses
into the front-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_axis(rng: jax.Array, length: int, valid: jax.Array, num_masks: int,
               max_width: jax.Array) -> jax.Array:
    """[B] valid lengths -> [B, length] bool keep-mask (False = masked)."""
    bsz = valid.shape[0]
    k_w, k_s = jax.random.split(rng)
    # width ~ U[0, max_width]; start ~ U[0, max(valid - width, 1))
    w = jax.random.randint(k_w, (bsz, num_masks), 0, 1 << 30)
    w = w % (jnp.maximum(max_width, 0)[..., None].astype(jnp.int32) + 1)
    s_range = jnp.maximum(valid[:, None] - w, 1)
    s = jax.random.randint(k_s, (bsz, num_masks), 0, 1 << 30) % s_range
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, length), 2)
    masked = (pos >= s[..., None]) & (pos < (s + w)[..., None])  # [B, M, L]
    return ~jnp.any(masked, axis=1)


def time_warp(rng: jax.Array, feats: jax.Array, feat_lens: jax.Array,
              warp: int) -> jax.Array:
    """SpecAugment time warping (W≈5, often disabled — SURVEY.md section
    2.1 #17): pick a center c ~ U[W, L-W) along the valid frames, shift it
    by d ~ U[-W, W], and piecewise-linearly resample the time axis so frame
    c lands at c+d. Batched: one interpolated gather per batch, no host
    work. Utterances too short to warp (L <= 2W+2) and padding frames pass
    through unchanged."""
    bsz, t_len, _ = feats.shape
    k_c, k_d = jax.random.split(rng)
    lens = feat_lens.astype(jnp.float32)
    lo = float(warp)
    hi = jnp.maximum(lens - warp, lo + 1.0)
    c = lo + jax.random.uniform(k_c, (bsz,)) * (hi - lo)
    shift = jax.random.randint(k_d, (bsz,), -warp, warp + 1).astype(jnp.float32)
    cw = jnp.clip(c + shift, 1.0, jnp.maximum(lens - 1.0, 1.0))
    t = jnp.arange(t_len, dtype=jnp.float32)[None, :]            # [B, T]
    src_left = t * (c / cw)[:, None]
    src_right = (c[:, None]
                 + (t - cw[:, None])
                 * ((lens - c) / jnp.maximum(lens - cw, 1e-3))[:, None])
    src = jnp.where(t < cw[:, None], src_left, src_right)
    warpable = (lens > 2.0 * warp + 2.0)[:, None]
    src = jnp.where(warpable & (t < lens[:, None]), src, t)
    src = jnp.clip(src, 0.0, float(t_len - 1))
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, t_len - 1)
    frac = (src - i0.astype(jnp.float32))[..., None]
    f0 = jnp.take_along_axis(feats, i0[..., None], axis=1)
    f1 = jnp.take_along_axis(feats, i1[..., None], axis=1)
    return f0 * (1.0 - frac) + f1 * frac


_time_warp = time_warp  # the spec_augment kwarg below shadows the name


def spec_augment(rng: jax.Array, feats: jax.Array, feat_lens: jax.Array,
                 num_freq_masks: int = 2, freq_mask_width: int = 27,
                 num_time_masks: int = 2, time_mask_width: int = 70,
                 time_mask_max_ratio: float = 0.2,
                 time_warp: int = 0) -> jax.Array:
    """[B, T, D] log-mel feats -> masked feats (masked regions set to 0,
    i.e. the per-utterance CMVN mean). ``time_warp``: warp window W
    (0 = disabled, the common setting)."""
    bsz, t_len, d = feats.shape
    k_f, k_t, k_w = jax.random.split(rng, 3)
    if time_warp:
        feats = _time_warp(k_w, feats, feat_lens, time_warp)
    full = jnp.full((bsz,), d, dtype=jnp.int32)
    keep_f = _mask_axis(k_f, d, full, num_freq_masks,
                        jnp.full((bsz,), freq_mask_width, jnp.int32))
    t_cap = jnp.minimum(
        jnp.full((bsz,), time_mask_width, jnp.int32),
        (time_mask_max_ratio * feat_lens.astype(jnp.float32)).astype(jnp.int32),
    )
    keep_t = _mask_axis(k_t, t_len, feat_lens.astype(jnp.int32), num_time_masks, t_cap)
    keep = keep_t[:, :, None] & keep_f[:, None, :]
    return jnp.where(keep, feats, 0.0)
