"""Independent torch implementation of the Kaldi-compliance fbank.

Purpose (SURVEY.md section 4.1; BASELINE.json:5 "bit-comparable fbank"):
torchaudio is not installed in this environment, so the numpy oracle
(frontend/oracle.py) is the primary golden. To break the self-referential
loop (oracle / jax / Pallas could share a common misreading of the Kaldi
spec), this module re-derives the same spec with a structurally different
implementation on a different numerics backend:

- framing via ``Tensor.unfold`` (stride tricks, not an explicit loop);
- per-frame DSP in torch float64;
- spectrum via ``torch.fft.rfft`` (pocketfft/MKL — a third FFT
  implementation next to numpy's and the jax matmul-DFT);
- mel banks built vectorized from bin-center mel points (no per-bin loop).

Tests assert three-way agreement (oracle / jax / torch) at <=1e-4 rel,
dither=0, on random and speech-like signals.
"""

from __future__ import annotations

import numpy as np

try:
    import torch
except ImportError:  # pragma: no cover - torch is installed in this image
    torch = None


def fbank_torch(audio: np.ndarray, num_mel_bins: int = 80,
                preemphasis: float = 0.97, remove_dc_offset: bool = True,
                low_freq: float = 20.0, high_freq: float = 0.0,
                sample_rate: int = 16000, frame_len: int = 400,
                frame_shift: int = 160, n_fft: int = 512) -> np.ndarray:
    """[S] float waveform -> [F, num_mel_bins] log-mel features (float64)."""
    assert torch is not None, "torch not available"
    x = torch.as_tensor(np.asarray(audio), dtype=torch.float64)
    if x.numel() < frame_len:
        return np.zeros((0, num_mel_bins), dtype=np.float64)
    frames = x.unfold(0, frame_len, frame_shift)                 # [F, 400]
    if remove_dc_offset:
        frames = frames - frames.mean(dim=1, keepdim=True)
    if preemphasis:
        shifted = torch.cat([frames[:, :1], frames[:, :-1]], dim=1)
        frames = frames - preemphasis * shifted
    n = torch.arange(frame_len, dtype=torch.float64)
    povey = (0.5 - 0.5 * torch.cos(2 * torch.pi * n / (frame_len - 1))) ** 0.85
    spec = torch.fft.rfft(frames * povey, n=n_fft, dim=1)
    power = spec.real.square() + spec.imag.square()
    power = power[:, : n_fft // 2]                               # drop Nyquist

    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    mel = lambda f: 1127.0 * torch.log1p(torch.as_tensor(  # noqa: E731
        f, dtype=torch.float64) / 700.0)
    fft_freqs = (sample_rate / n_fft) * torch.arange(
        n_fft // 2, dtype=torch.float64)
    m = mel(fft_freqs)                                           # [n_fft//2]
    mel_lo, mel_hi = mel(low_freq), mel(high_freq)
    delta = (mel_hi - mel_lo) / (num_mel_bins + 1)
    left = mel_lo + delta * torch.arange(num_mel_bins,
                                         dtype=torch.float64)[:, None]
    up = (m[None, :] - left) / delta
    down = (left + 2.0 * delta - m[None, :]) / delta
    banks = torch.clamp(torch.minimum(up, down), min=0.0)        # [bins, bins']
    out = power @ banks.T
    eps = float(np.finfo(np.float32).eps)
    return torch.log(torch.clamp(out, min=eps)).numpy()
