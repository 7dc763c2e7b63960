"""Greedy CTC decoding (the reference's phone-baseline decode path,
SURVEY.md section 2.1 #11 'greedy CTC for the phone baseline').

The argmax + collapse runs ON DEVICE with static shapes; only the final
ragged token extraction happens on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from metaasr_tpu.constants import BLANK_ID
from metaasr_tpu.utils.padding import make_non_pad_mask


def ctc_greedy_decode(logits: jax.Array, logit_lens: jax.Array,
                      blank: int = BLANK_ID):
    """[B, T, V] -> (ids [B, T] collapsed-left-aligned, lens [B]).

    Device-side: per-frame argmax, collapse repeats, drop blanks, then
    left-pack the survivors with an argsort (stable) — all static shapes.
    """
    best = jnp.argmax(logits, axis=-1).astype(jnp.int32)          # [B, T]
    t_len = best.shape[1]
    valid = make_non_pad_mask(logit_lens, t_len)
    prev = jnp.pad(best, ((0, 0), (1, 0)), constant_values=blank)[:, :t_len]
    keep = valid & (best != blank) & (best != prev)
    # left-pack: stable argsort of (not keep) moves kept positions first
    order = jnp.argsort(~keep, axis=1, stable=True)
    packed = jnp.take_along_axis(jnp.where(keep, best, 0), order, axis=1)
    out_lens = keep.sum(axis=1).astype(jnp.int32)
    return packed, out_lens


def collapse_ctc(ids: np.ndarray, blank: int = BLANK_ID) -> list[int]:
    """Host-side reference collapse for tests: repeats -> one, drop blanks."""
    out, prev = [], None
    for i in ids:
        i = int(i)
        if i != blank and i != prev:
            out.append(i)
        prev = i
    return out


def greedy_to_texts(packed: jax.Array, out_lens: jax.Array, tokenizer) -> list[str]:
    packed = np.asarray(packed)
    out_lens = np.asarray(out_lens)
    return [tokenizer.decode(packed[b, : out_lens[b]]) for b in range(len(out_lens))]
