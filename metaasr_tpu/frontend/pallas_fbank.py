"""Fused Pallas fbank kernel (BASELINE.json:5 "one fused Pallas kernel
streaming padded utterance batches").

Same math as fbank.py's jax path (folded linear front-end -> matmul-DFT ->
mel -> log). The A3 frame matrix is a reshape/concat at the jax level
(fused into the kernel's input DMA); the kernel fuses BOTH DFT matmuls, the
power spectrum, the mel projection and the log, so the [*, 256] power
spectrum and the real/imag DFT planes never touch HBM. Masking + CMVN are
one cheap elementwise pass at the jax level (they need cross-frame
reductions per utterance, which would serialize the kernel grid).

Layout decisions (pallas_guide: tiling constraints):
- frames flattened to rows [B*F_pad, 512]; grid over row tiles of 512 —
  programs pipeline DMA/compute independently of utterance boundaries;
- A3 width padded 480 -> 512 (DFT matrices are zero past row 400, so the
  padding is exact); mel dim padded 80 -> 128 (caller slices);
- fp32 HIGHEST-precision dots: the front-end targets bit-comparable
  features (BASELINE.json:5) and its FLOPs are negligible.

Off-TPU (CPU tests) the kernel runs in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metaasr_tpu.frontend import oracle
from metaasr_tpu.frontend.fbank import (
    N_BINS,
    FbankParams,
    apply_cmvn,
    frame_lengths,
    frame_matrix,
    num_frames,
)
from metaasr_tpu.utils.padding import make_non_pad_mask

LANE = 128
D_PAD = LANE           # padded mel dim (80 -> 128)
W_PAD = 4 * LANE       # padded A3 width (480 -> 512)
ROW_TILE = 512         # frames per program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(a3_ref, ccos_ref, csin_ref, mel_ref, out_ref):
    hi = jax.lax.Precision.HIGHEST
    a3 = a3_ref[:]                                          # [ROW_TILE, 512]
    real = jnp.dot(a3, ccos_ref[:], precision=hi,
                   preferred_element_type=jnp.float32)
    imag = jnp.dot(a3, csin_ref[:], precision=hi,
                   preferred_element_type=jnp.float32)
    power = real * real + imag * imag                       # [ROW_TILE, 256]
    mel = jnp.dot(power, mel_ref[:], precision=hi,
                  preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(jnp.maximum(mel, oracle.EPS))


@functools.partial(jax.jit, static_argnames=("cmvn", "cmvn_norm_var",
                                             "interpret", "num_mel_bins"))
def _pallas_fbank(audio, audio_lens, c_cos, c_sin, mel_t,
                  cmvn: str = "utterance", cmvn_norm_var: bool = False,
                  interpret: bool = False, num_mel_bins: int = 80):
    bsz, s = audio.shape
    nf = num_frames(s)
    a3 = frame_matrix(audio.astype(jnp.float32))            # [B, F, 480]
    rows = _round_up(max(bsz * nf, ROW_TILE), ROW_TILE)
    flat = jnp.pad(a3.reshape(bsz * nf, -1),
                   ((0, rows - bsz * nf), (0, W_PAD - a3.shape[2])))
    flens = frame_lengths(audio_lens)

    feats = pl.pallas_call(
        _kernel,
        grid=(rows // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, W_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W_PAD, N_BINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W_PAD, N_BINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_BINS, D_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, D_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, D_PAD), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * (2 * W_PAD * N_BINS + N_BINS * D_PAD),
            bytes_accessed=rows * (W_PAD + D_PAD) * 4,
            transcendentals=rows * D_PAD,
        ),
    )(flat, c_cos, c_sin, mel_t)

    feats = feats[: bsz * nf, :num_mel_bins].reshape(bsz, nf, num_mel_bins)
    mask = make_non_pad_mask(flens, nf)[..., None]
    feats = jnp.where(mask, feats, 0.0)
    if cmvn == "utterance":
        feats = apply_cmvn(feats, flens, norm_var=cmvn_norm_var)
    return feats, flens


_matrix_cache: dict = {}


def _padded_matrices(params: FbankParams):
    """Padded DFT/mel matrices, cached per params instance as NUMPY arrays
    (FbankParams.create returns lru-cached singletons, so ids are stable).

    The cache must hold host arrays, never ``jnp`` values: the first call
    can happen inside a jit trace, where ``jnp.asarray`` yields a tracer —
    caching that leaks it into later traces (UnexpectedTracerError, caught
    by scripts/kernel_check.py on the second distinct jitted shape).
    Inside jit the numpy constants embed per-compile at zero runtime cost;
    rare eager calls pay one small H2D."""
    hit = _matrix_cache.get(id(params))
    if hit is None:
        ccos = np.zeros((W_PAD, N_BINS), np.float32)
        csin = np.zeros((W_PAD, N_BINS), np.float32)
        ccos[: params.c_cos.shape[0]] = params.c_cos
        csin[: params.c_sin.shape[0]] = params.c_sin
        mel_pad = np.zeros((N_BINS, D_PAD), np.float32)
        mel_pad[:, : params.num_mel_bins] = params.mel_t
        hit = (ccos, csin, mel_pad)
        _matrix_cache[id(params)] = hit
    ccos, csin, mel_pad = hit
    return jnp.asarray(ccos), jnp.asarray(csin), jnp.asarray(mel_pad)


def pallas_log_mel_fbank(audio, audio_lens, params: FbankParams | None = None,
                         cmvn: str = "utterance", cmvn_norm_var: bool = False,
                         interpret: bool | None = None):
    """Drop-in for fbank.log_mel_fbank (dither handled by the caller;
    SpecAugment stays at the jax level). Auto-interprets off-TPU."""
    if params is None:
        params = FbankParams.create()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ccos, csin, mel_pad = _padded_matrices(params)
    return _pallas_fbank(
        audio.astype(jnp.float32), audio_lens, ccos, csin, mel_pad,
        cmvn=cmvn, cmvn_norm_var=cmvn_norm_var,
        interpret=interpret, num_mel_bins=params.num_mel_bins)
