"""Host-side (numpy) precomputation of DSP constants.

Mel filterbanks in both the htk-scale variant (matches torchaudio
``MelSpectrogram(norm='slaney')`` with its default ``mel_scale='htk'`` — used by
the reference's ``TorchMelSpectrogram``, /root/reference/utils.py:119-130) and
the slaney-scale variant (matches ``librosa.filters.mel`` defaults — used by the
reference's vocoder mel loss, /root/reference/layers/hifigan_loss.py:38-44).

Also the windowed-DFT matrices that let the STFT run as two MXU matmuls
instead of an FFT, and the kaiser-windowed polyphase resampling kernel that
reproduces ``torchaudio.functional.resample`` numerics
(/root/reference/trainers/gpt_trainer.py:213-222).
"""

from __future__ import annotations

import functools

import numpy as np


def hz_to_mel(freq: np.ndarray, scale: str) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        freq >= min_log_hz, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels
    )


def mel_to_hz(mels: np.ndarray, scale: str) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float | None,
    scale: str = "htk",
    norm: str = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_freqs, n_mels).

    ``scale='htk', norm='slaney'`` reproduces torchaudio's default
    ``melscale_fbanks``; ``scale='slaney', norm='slaney'`` reproduces librosa's
    default ``filters.mel`` (up to float rounding).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = hz_to_mel(np.array(fmin), scale)
    m_max = hz_to_mel(np.array(fmax), scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts, scale)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return w[:win_length].astype(np.float64)


@functools.lru_cache(maxsize=None)
def windowed_dft(n_fft: int, win_length: int, normalized: bool = False):
    """Windowed real-DFT matrices (cos, -sin), each (n_fft, n_fft//2+1) float32.

    The window (hann of ``win_length``, centered zero-padded to ``n_fft`` as
    ``torch.stft`` does) is folded into the DFT matrix so that
    ``frames @ cos_mat`` / ``frames @ sin_mat`` give the real/imag STFT parts:
    one MXU matmul each instead of an FFT.
    """
    win = hann_window(win_length)
    if win_length < n_fft:
        pad_left = (n_fft - win_length) // 2
        full = np.zeros(n_fft)
        full[pad_left : pad_left + win_length] = win
        win = full
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    cos_mat = np.cos(ang) * win[:, None]
    sin_mat = -np.sin(ang) * win[:, None]
    if normalized:  # torch.stft(normalized=True): multiply by n_fft ** -0.5
        scale = 1.0 / np.sqrt(n_fft)
        cos_mat = cos_mat * scale
        sin_mat = sin_mat * scale
    return cos_mat.astype(np.float32), sin_mat.astype(np.float32)


def _kaiser_window(n: np.ndarray, beta: float) -> np.ndarray:
    from scipy.special import i0

    return i0(beta * np.sqrt(np.clip(1.0 - n**2, 0.0, 1.0))) / i0(beta)


@functools.lru_cache(maxsize=None)
def resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    beta: float | None = None,
    window: str = "hann",
):
    """Polyphase sinc resampling kernel reproducing torchaudio's
    ``_get_sinc_resample_kernel`` (same math, written fresh in numpy).

    Returns (kernels, width) where kernels has shape
    (new_freq_r, kernel_len) with ``*_r`` the gcd-reduced rates; the output at
    phase p, block b is ``sum_k kernels[p, k] * x[b*orig_r - width + k]``.
    """
    from math import gcd

    g = gcd(int(orig_freq), int(new_freq))
    orig_r, new_r = orig_freq // g, new_freq // g

    base_freq = min(orig_r, new_r) * rolloff / 2.0
    width = int(np.ceil(lowpass_filter_width * orig_r / (base_freq * 2.0)))
    idx = np.arange(-width, width + orig_r, dtype=np.float64)[None, :] / orig_r
    t = (-np.arange(new_r, dtype=np.float64)[:, None] / new_r + idx) * 2.0 * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    if window == "hann":
        win = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    else:  # kaiser
        if beta is None:
            beta = 14.769656459379492
        win = _kaiser_window(t / lowpass_filter_width, beta)
    t = t * np.pi
    scale = base_freq / orig_r * 2.0
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t)) * win * scale
    return kernels.astype(np.float32), width, orig_r, new_r


def resample_output_length(length: int, orig_freq: int, new_freq: int) -> int:
    from math import gcd

    g = gcd(int(orig_freq), int(new_freq))
    return int(np.ceil(new_freq // g * length / (orig_freq // g)))
