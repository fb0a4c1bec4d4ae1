"""Fused STFT → mel → log → norm on TPU.

TPU-first design: instead of an FFT (poorly supported on the MXU), the windowed
real DFT is two dense matmuls with precomputed (n_fft, n_freqs) matrices —
framing lowers to a gather, everything after is MXU matmuls + VPU elementwise,
and XLA fuses the log/clamp/normalize chain into the mel matmul epilogue.

Three reference-matching variants are provided:

* :func:`mel_torchaudio` — ``torchaudio.transforms.MelSpectrogram(power=2,
  norm='slaney', mel_scale=htk-default)`` + log-clamp + per-bin mel-norm
  division, i.e. the reference's ``TorchMelSpectrogram``
  (/root/reference/utils.py:97-162).
* :func:`mel_vocoder_loss` — librosa-mel STFT features with center=False and
  (n_fft-hop)/2 reflect pre-pad, i.e. the reference's ``extract_mel_features``
  (/root/reference/layers/hifigan_loss.py:16-75).
* :func:`stft_complex` — normalized complex STFT with center=False and no
  padding, i.e. the MS-STFT discriminator's ``Spectrogram``
  (/root/reference/layers/hifigan.py:477-486).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.dsp import filters


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, n_fft) sliding windows; no padding applied."""
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return x[..., idx]


# DSP matmuls use full f32 MXU passes: mel values feed frozen VQ codebooks where
# a bf16-rounded distance can flip a code index, so HIGHEST precision is load-bearing.
_PREC = jax.lax.Precision.HIGHEST


def _power_spectrum(frames: jnp.ndarray, n_fft: int, win_length: int,
                    normalized: bool = False) -> jnp.ndarray:
    cos_mat, sin_mat = filters.windowed_dft(n_fft, win_length, normalized)
    frames = frames.astype(jnp.float32)
    re = jnp.dot(frames, jnp.asarray(cos_mat), precision=_PREC,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(sin_mat), precision=_PREC,
                 preferred_element_type=jnp.float32)
    return re * re + im * im


@dataclasses.dataclass(frozen=True)
class MelSpec:
    """Static mel-extraction parameters (constants are cached on host)."""

    sample_rate: int = 24000
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = 8000.0
    scale: str = "htk"  # 'htk' == torchaudio default; 'slaney' == librosa default

    def fbank(self) -> np.ndarray:
        return filters.mel_filterbank(
            self.sample_rate, self.n_fft, self.n_mels, self.fmin, self.fmax,
            scale=self.scale, norm="slaney",
        )


def mel_torchaudio(
    x: jnp.ndarray,
    spec: MelSpec,
    mel_norms: jnp.ndarray | None = None,
    pre_padded: bool = False,
) -> jnp.ndarray:
    """(B, T) waveform -> (B, n_mels, 1 + T//hop) normalized log-mel.

    ``pre_padded=True`` means the caller already applied the center
    reflect-padding of n_fft//2 on each side (used by the inference path, where
    the reflect padding of the *true-length* signal is done on host before
    zero-padding to a static length; see inference/pipeline.py).
    """
    if not pre_padded:
        pad = spec.n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, spec.n_fft, spec.hop_length)
    power = _power_spectrum(frames, spec.n_fft, spec.win_length)
    mel = jnp.dot(power, jnp.asarray(spec.fbank()), precision=_PREC,
                  preferred_element_type=jnp.float32)
    mel = jnp.log(jnp.clip(mel, min=1e-5))
    if mel_norms is not None:
        mel = mel / mel_norms[None, None, :]
    return jnp.swapaxes(mel, -1, -2)  # (B, n_mels, frames)


def mel_vocoder_loss(x: jnp.ndarray, spec: MelSpec) -> jnp.ndarray:
    """Reference vocoder-loss mel: reflect pad (n_fft-hop)/2, center=False,
    magnitude sqrt(re^2+im^2+1e-9), slaney-scale mel, log-clamp(1e-5)."""
    pad = (spec.n_fft - spec.hop_length) // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, spec.n_fft, spec.hop_length)
    power = _power_spectrum(frames, spec.n_fft, spec.win_length)
    mag = jnp.sqrt(power + 1e-9)
    mel = jnp.dot(mag, jnp.asarray(spec.fbank()), precision=_PREC,
                 preferred_element_type=jnp.float32)
    mel = jnp.log(jnp.clip(mel, min=1e-5))
    return jnp.swapaxes(mel, -1, -2)


def stft_complex(
    x: jnp.ndarray, n_fft: int, hop_length: int, win_length: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized complex STFT, center=False, no padding: returns (re, im) each
    (B, n_freqs, n_frames). Matches torch Spectrogram(normalized=True,
    center=False, power=None)."""
    frames = frame_signal(x, n_fft, hop_length)
    cos_mat, sin_mat = filters.windowed_dft(n_fft, win_length, normalized=True)
    frames = frames.astype(jnp.float32)
    re = jnp.dot(frames, jnp.asarray(cos_mat), precision=_PREC,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(sin_mat), precision=_PREC,
                 preferred_element_type=jnp.float32)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def num_frames_center(t: int, hop_length: int) -> int:
    return 1 + t // hop_length
