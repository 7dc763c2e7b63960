"""GEMM-native log-mel fbank front-end (jax fast path).

The reference computes fbank per utterance on the host through torchaudio's
Kaldi-compliance C++ (SURVEY.md section 2.1 #16, #N1). Here the ENTIRE
front-end runs on device over padded waveform batches, shaped for the MXU
(BASELINE.json:5; GEMM-native NDFT pattern, PAPERS.md "MelT"):

Key identity: per frame, DC-removal, preemphasis, windowing and the DFT are
all LINEAR maps of the 400 raw samples, so their composition folds into one
precomputed matrix. With frame shift 160 and length 400, frame f lives inside
three consecutive 160-sample chunks, so the batch of frames is a pure
reshape+slice (no gather):

    chunks = audio.reshape(B, -1, 160)
    A3[f]  = concat(chunks[f], chunks[f+1], chunks[f+2])        # [F, 480]
    real   = A3 @ C_cos   # C_cos = (window·preemph·dc)ᵀ · DFT  # [480, 256]
    imag   = A3 @ C_sin
    mel    = (real² + imag²) @ M.T                              # [256, 80]
    feats  = log(max(mel, eps)) ; masked per-utterance CMVN

Three matmuls + elementwise — XLA fuses the rest. The fused Pallas kernel
variant (pallas_fbank.py) keeps the power spectrum in VMEM. Numerics are
golden-tested against the per-frame spec oracle (oracle.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from metaasr_tpu.frontend import oracle
from metaasr_tpu.utils.padding import make_non_pad_mask

FRAME_LEN = oracle.FRAME_LEN      # 400
FRAME_SHIFT = oracle.FRAME_SHIFT  # 160
N_FFT = oracle.N_FFT              # 512
N_BINS = N_FFT // 2               # 256 (Nyquist excluded from mel anyway)
A3_WIDTH = 3 * FRAME_SHIFT        # 480


def num_frames(num_samples: int) -> int:
    """snip_edges frame count for a padded length (static)."""
    return max(0, 1 + (num_samples - FRAME_LEN) // FRAME_SHIFT)


@dataclass(frozen=True)
class FbankParams:
    """Precomputed front-end matrices (host, float64 -> float32)."""

    c_cos: np.ndarray  # [480, 256]
    c_sin: np.ndarray  # [480, 256]
    mel_t: np.ndarray  # [256, num_mel_bins]
    num_mel_bins: int

    @classmethod
    @functools.lru_cache(maxsize=8)
    def create(cls, num_mel_bins: int = 80, preemphasis: float = 0.97,
               remove_dc_offset: bool = True, low_freq: float = 20.0,
               high_freq: float = 0.0, sample_rate: int = 16000) -> "FbankParams":
        n = FRAME_LEN
        # Linear frame pre-processing, composed as matrices (float64).
        lin = np.eye(n)
        if remove_dc_offset:
            lin = lin - np.full((n, n), 1.0 / n)
        if preemphasis:
            pre = np.eye(n)
            idx = np.arange(1, n)
            pre[idx, idx - 1] = -preemphasis
            pre[0, 0] = 1.0 - preemphasis
            lin = pre @ lin
        lin = oracle.povey_window(n)[:, None] * lin  # diag(w) @ pre @ dc
        # DFT over the zero-padded 512-point window, bins 0..255.
        k = np.arange(N_BINS)
        t = np.arange(n)
        ang = 2.0 * np.pi * np.outer(t, k) / N_FFT
        c_cos400 = lin.T @ np.cos(ang)   # [400, 256]
        c_sin400 = lin.T @ (-np.sin(ang))
        # Embed into the 480-wide A3 layout (rows 400..479 are zero).
        c_cos = np.zeros((A3_WIDTH, N_BINS))
        c_sin = np.zeros((A3_WIDTH, N_BINS))
        c_cos[:n] = c_cos400
        c_sin[:n] = c_sin400
        mel = oracle.mel_banks(num_mel_bins, N_FFT, sample_rate, low_freq, high_freq)
        return cls(
            c_cos=c_cos.astype(np.float32),
            c_sin=c_sin.astype(np.float32),
            mel_t=mel.T.astype(np.float32),
            num_mel_bins=num_mel_bins,
        )


def frame_matrix(audio: jax.Array) -> jax.Array:
    """[B, S] padded waveforms -> [B, F, 480] A3 frame matrix (reshape-only)."""
    bsz, s = audio.shape
    nf = num_frames(s)
    # Ensure chunk coverage for the last frame's 3-chunk window.
    pad = (nf + 2) * FRAME_SHIFT - s
    if pad > 0:
        audio = jnp.pad(audio, ((0, 0), (0, pad)))
    chunks = audio[:, : (nf + 2) * FRAME_SHIFT].reshape(bsz, nf + 2, FRAME_SHIFT)
    a3 = jnp.concatenate(
        [chunks[:, 0:nf], chunks[:, 1:nf + 1], chunks[:, 2:nf + 2]], axis=-1)
    return a3  # [B, F, 480]


def frame_lengths(audio_lens: jax.Array) -> jax.Array:
    """Valid frame counts from valid sample counts."""
    fl = 1 + (audio_lens.astype(jnp.int32) - FRAME_LEN) // FRAME_SHIFT
    return jnp.maximum(fl, 0)


def apply_cmvn(feats: jax.Array, feat_lens: jax.Array,
               norm_var: bool = False) -> jax.Array:
    """Masked per-utterance CMVN over valid frames. [B, F, D] -> same."""
    mask = make_non_pad_mask(feat_lens, feats.shape[1])[..., None]
    denom = jnp.maximum(feat_lens.astype(feats.dtype), 1.0)[:, None, None]
    mu = jnp.sum(feats * mask, axis=1, keepdims=True) / denom
    out = jnp.where(mask, feats - mu, 0.0)
    if norm_var:
        var = jnp.sum(jnp.square(out) * mask, axis=1, keepdims=True) / denom
        out = jnp.where(mask, out * jax.lax.rsqrt(var + 1e-10), 0.0)
    return out


def log_mel_fbank(audio: jax.Array, audio_lens: jax.Array,
                  params: FbankParams | None = None,
                  cmvn: str = "utterance", cmvn_norm_var: bool = False,
                  dither: float = 0.0,
                  rng: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """[B, S] waveforms -> ([B, F, num_mel_bins] log-mel feats, [B] lens).

    Computation in fp32 regardless of model dtype (feature numerics target
    the 'bit-comparable fbank' goal, BASELINE.json:5); cast downstream.
    """
    if params is None:
        params = FbankParams.create()
    audio = audio.astype(jnp.float32)
    if dither and rng is not None:
        audio = audio + dither * jax.random.normal(rng, audio.shape, jnp.float32)
    a3 = frame_matrix(audio)
    c_cos = jnp.asarray(params.c_cos)
    c_sin = jnp.asarray(params.c_sin)
    mel_t = jnp.asarray(params.mel_t)
    # HIGHEST precision: full-fp32 MXU passes. The front-end targets
    # bit-comparable features (BASELINE.json:5); its FLOPs are negligible
    # next to the encoder, so never trade its accuracy for speed.
    hi = jax.lax.Precision.HIGHEST
    real = jnp.einsum("bfw,wk->bfk", a3, c_cos, precision=hi,
                      preferred_element_type=jnp.float32)
    imag = jnp.einsum("bfw,wk->bfk", a3, c_sin, precision=hi,
                      preferred_element_type=jnp.float32)
    power = real * real + imag * imag
    mel = jnp.einsum("bfk,kd->bfd", power, mel_t, precision=hi,
                     preferred_element_type=jnp.float32)
    feats = jnp.log(jnp.maximum(mel, oracle.EPS))
    feat_lens = frame_lengths(audio_lens)
    mask = make_non_pad_mask(feat_lens, feats.shape[1])[..., None]
    feats = jnp.where(mask, feats, 0.0)
    if cmvn == "utterance":
        feats = apply_cmvn(feats, feat_lens, norm_var=cmvn_norm_var)
    return feats, feat_lens
