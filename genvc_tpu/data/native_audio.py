"""ctypes binding for the native audio-IO library (native/audioio.cpp).

Fast path for the host data pipeline: wav decode + polyphase resample in C++
(the equivalent of the reference's torchaudio C++ kernels in DataLoader
workers). Builds lazily via ``make`` on first use; falls back to the numpy
implementations in ``genvc_tpu.dsp`` when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaudioio.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.audioio_load_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.audioio_load_wav.restype = ctypes.c_int
        lib.audioio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.audioio_resample.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C"), ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C"), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float32, flags="C"), ctypes.c_int64]
        lib.audioio_resample.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def read_wav_native(path: str):
    """Returns (mono float32 (T,), sample_rate) or None on failure."""
    lib = _load()
    if not lib:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.audioio_load_wav(path.encode(), ctypes.byref(out),
                              ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.audioio_free(out)
    return arr, int(sr.value)


def resample_native(x: np.ndarray, orig_freq: int, new_freq: int,
                    **kwargs) -> np.ndarray | None:
    """Polyphase resample via C++; same numerics as dsp.resample.resample_np."""
    from genvc_tpu.dsp import filters

    lib = _load()
    if not lib:
        return None
    kernels, width, orig_r, new_r = filters.resample_kernel(
        orig_freq, new_freq,
        kwargs.get("lowpass_filter_width", 6),
        kwargs.get("rolloff", 0.99),
        kwargs.get("beta"),
        kwargs.get("window", "hann"))
    x1 = np.ascontiguousarray(x.reshape(-1), np.float32)
    out_len = filters.resample_output_length(x1.shape[0], orig_freq, new_freq)
    out = np.empty(out_len, np.float32)
    kern = np.ascontiguousarray(kernels, np.float32)
    rc = lib.audioio_resample(x1, x1.shape[0], kern, kern.shape[0],
                              kern.shape[1], orig_r, width, out, out_len)
    if rc != 0:
        return None
    return out


def load_audio_native(path: str, sampling_rate: int):
    """Native-path equivalent of dsp.audio_io.load_audio (same sentinel
    contract: (1, T) float32 clipped to [-1, 1], or None)."""
    res = read_wav_native(path)
    if res is None:
        return None
    audio, sr = res
    if audio.shape[0] <= 10:
        return None
    if sr != sampling_rate:
        audio = resample_native(audio, sr, sampling_rate)
        if audio is None:
            return None
    if np.any(audio > 10) or not np.any(audio < 0):
        return None
    return np.clip(audio, -1.0, 1.0).astype(np.float32)[None, :]
