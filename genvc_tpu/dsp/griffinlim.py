"""Mel inversion for eval listening samples (host, numpy).

Reference: ``TorchMelSpectrogram.invert`` (utils.py:164-172) — de-normalize,
exp, InverseMelScale (least-squares pseudo-inverse), Griffin-Lim 64 iters.
Only used for wandb/eval audio, never on the training or inference hot path,
so it stays on host.
"""

from __future__ import annotations

import numpy as np

from genvc_tpu.dsp import filters


def invert_mel(mel: np.ndarray, mel_norms: np.ndarray | None,
               sample_rate: int = 24000, n_fft: int = 1024,
               hop_length: int = 256, win_length: int = 1024,
               fmin: float = 0.0, fmax: float = 8000.0,
               n_iter: int = 64) -> np.ndarray:
    """(n_mels, T) normalized log-mel -> waveform (T*hop,)."""
    mel = np.asarray(mel, np.float64)
    if mel_norms is not None:
        mel = mel * np.asarray(mel_norms)[:, None]
    power = np.exp(mel)  # power spectrogram in mel bins

    fb = filters.mel_filterbank(sample_rate, n_fft, mel.shape[0], fmin, fmax,
                                scale="htk", norm="slaney").astype(np.float64)
    # least-squares inverse mel scale (torchaudio InverseMelScale semantics)
    spec = np.linalg.lstsq(fb.T, power, rcond=None)[0]
    spec = np.maximum(spec, 0.0)
    mag = np.sqrt(spec)
    return griffin_lim(mag, n_fft, hop_length, win_length, n_iter)


def _stft(x, n_fft, hop, win):
    w = filters.hann_window(win)
    if win < n_fft:
        pad = (n_fft - win) // 2
        w = np.pad(w, (pad, n_fft - win - pad))
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(xp) - n_fft) // hop
    frames = np.stack([xp[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return np.fft.rfft(frames * w, axis=-1).T  # (F, T)


def _istft(spec, n_fft, hop, win, length):
    w = filters.hann_window(win)
    if win < n_fft:
        pad = (n_fft - win) // 2
        w = np.pad(w, (pad, n_fft - win - pad))
    frames = np.fft.irfft(spec.T, n=n_fft, axis=-1) * w
    out = np.zeros(hop * (spec.shape[1] - 1) + n_fft)
    norm = np.zeros_like(out)
    w2 = w * w
    for i in range(spec.shape[1]):
        out[i * hop : i * hop + n_fft] += frames[i]
        norm[i * hop : i * hop + n_fft] += w2
    out = out / np.maximum(norm, 1e-8)
    pad = n_fft // 2
    return out[pad : pad + length]


def griffin_lim(mag: np.ndarray, n_fft: int, hop: int, win: int,
                n_iter: int = 64) -> np.ndarray:
    """Classic Griffin-Lim phase reconstruction from magnitude (F, T)."""
    rng = np.random.default_rng(0)
    angles = np.exp(2j * np.pi * rng.random(mag.shape))
    length = hop * (mag.shape[1] - 1)
    x = _istft(mag * angles, n_fft, hop, win, length)
    for _ in range(n_iter):
        spec = _stft(x, n_fft, hop, win)
        spec = spec[:, : mag.shape[1]]
        angles = np.exp(1j * np.angle(spec))
        x = _istft(mag * angles, n_fft, hop, win, length)
    return x.astype(np.float32)
