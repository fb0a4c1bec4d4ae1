"""Native C++ audio-IO parity vs the numpy implementations."""

import os

import numpy as np
import pytest

from genvc_tpu.data import native_audio
from genvc_tpu.dsp import audio_io
from genvc_tpu.dsp.resample import resample_np

SAMPLE = "/root/reference/samples/EF4_ENG_0112_1.wav"


@pytest.mark.skipif(not native_audio.available(), reason="native lib not built")
def test_native_wav_decode_matches_scipy(tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 0.2).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    audio_io.write_wav(path, wav, 24000)
    got, sr = native_audio.read_wav_native(path)
    ref, sr2 = audio_io.read_wav(path)
    assert sr == sr2 == 24000
    np.testing.assert_allclose(got, ref[0], atol=1e-6)


@pytest.mark.skipif(not native_audio.available(), reason="native lib not built")
def test_native_resample_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(9601).astype(np.float32)
    ref = resample_np(x[None], 24000, 16000)[0]
    got = native_audio.resample_native(x, 24000, 16000)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(not (native_audio.available() and os.path.exists(SAMPLE)),
                    reason="native lib or sample missing")
def test_native_load_audio_on_reference_sample():
    nat = native_audio.load_audio_native(SAMPLE, 16000)
    assert nat is not None and nat.shape[0] == 1
    # full-path loader agrees with native path
    ful = audio_io.load_audio(SAMPLE, 16000)
    np.testing.assert_allclose(ful, nat, atol=1e-5)
