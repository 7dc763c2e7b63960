"""Padding / masking utilities.

The reference keeps these as `make_pad_mask` / length bookkeeping helpers
(R: src/utils.py, SURVEY.md section 2.1 #14). Here everything is static-shape
and jit-friendly: masks are computed from integer length vectors with
``broadcasted_iota`` so no data-dependent shapes ever reach XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_non_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B] int lengths -> [B, max_len] bool mask, True on valid positions."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return pos < lengths.astype(jnp.int32)[:, None]


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B] int lengths -> [B, max_len] bool mask, True on padding positions."""
    return ~make_non_pad_mask(lengths, max_len)


def subsampled_lengths(lengths: jax.Array, factor: int = 4) -> jax.Array:
    """Length bookkeeping through conv front-ends.

    Matches ``Conv2dSubsampling``-style stacking of two stride-2 convs with
    kernel 3 and no padding: L -> floor((L - 1) / 2) applied per stage
    (ESPnet lineage; SURVEY.md section 3.2). ``factor`` must be a power of 2;
    each factor-of-2 applies one stage.
    """
    out = lengths.astype(jnp.int32)
    f = factor
    while f > 1:
        out = (out - 1) // 2
        f //= 2
    return jnp.maximum(out, 1)


def vgg_subsampled_lengths(lengths: jax.Array, num_blocks: int = 2) -> jax.Array:
    """Length bookkeeping through the VGG extractor: each block ends in a
    VALID 2x2 max-pool with stride 2 (L -> floor(L/2))."""
    out = lengths.astype(jnp.int32)
    for _ in range(num_blocks):
        out = out // 2
    return jnp.maximum(out, 1)


def pad_to(x: np.ndarray, length: int, axis: int = 0, value=0) -> np.ndarray:
    """Host-side: zero-pad ``x`` along ``axis`` to ``length``."""
    cur = x.shape[axis]
    if cur >= length:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, length)
        return x[tuple(idx)]
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, length - cur)
    return np.pad(x, widths, constant_values=value)


def bucket_length(n: int, buckets: tuple[int, ...]) -> int:
    """Smallest bucket >= n (host-side; bounds jit recompilation to the
    bucket set — SURVEY.md section 5.7 / section 7 'static shapes vs ragged
    audio')."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]
