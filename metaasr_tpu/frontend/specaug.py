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


def spec_augment(rng: jax.Array, feats: jax.Array, feat_lens: jax.Array,
                 num_freq_masks: int = 2, freq_mask_width: int = 27,
                 num_time_masks: int = 2, time_mask_width: int = 70,
                 time_mask_max_ratio: float = 0.2) -> jax.Array:
    """[B, T, D] log-mel feats -> masked feats (masked regions set to 0,
    i.e. the per-utterance CMVN mean)."""
    bsz, t_len, d = feats.shape
    k_f, k_t = jax.random.split(rng)
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
