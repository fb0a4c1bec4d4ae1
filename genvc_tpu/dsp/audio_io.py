"""Host audio IO (numpy; no torch/torchaudio dependency).

Mirrors the behavioral contract of the reference ``load_audio``
(/root/reference/utils.py:49-75): mono-ize, resample to the requested rate,
sanity-check the value range (returning ``None`` as the corrupt-file sentinel
consumed by the datasets), clip to [-1, 1].
"""

from __future__ import annotations

import io
import wave

import numpy as np

from genvc_tpu.dsp.resample import resample_np


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a PCM wav file -> (float32 array (channels, T), sample_rate)."""
    try:
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if data.dtype == np.int16:
            audio = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            audio = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            audio = (data.astype(np.float32) - 128.0) / 128.0
        else:
            audio = data.astype(np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        else:
            audio = audio.T
        return audio, int(sr)
    except Exception:
        # minimal stdlib fallback
        with wave.open(path, "rb") as wf:
            sr = wf.getframerate()
            n = wf.getnframes()
            ch = wf.getnchannels()
            raw = wf.readframes(n)
        audio = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        audio = audio.reshape(-1, ch).T
        return audio, sr


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    audio = np.asarray(audio)
    if audio.ndim == 2:
        audio = audio[0]
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())


def load_audio(path: str, sampling_rate: int) -> np.ndarray | None:
    """Reference-compatible loader: returns (1, T) float32 or None on failure.

    Uses the native C++ decoder/resampler (genvc_tpu.data.native_audio) when
    built; numpy fallback otherwise."""
    try:
        from genvc_tpu.data import native_audio

        if native_audio.available():
            out = native_audio.load_audio_native(path, sampling_rate)
            if out is not None:
                return out
    except Exception:
        pass
    try:
        audio, sr = read_wav(path)
    except Exception:
        return None
    if audio.shape[0] != 1:
        audio = audio.mean(axis=0, keepdims=True)
    try:
        assert audio.shape[1] > 10
        if sr != sampling_rate:
            audio = resample_np(audio, sr, sampling_rate)
    except Exception:
        return None
    # same out-of-range sentinel as the reference (utils.py:69-72)
    if np.any(audio > 10) or not np.any(audio < 0):
        return None
    return np.clip(audio, -1.0, 1.0).astype(np.float32)
