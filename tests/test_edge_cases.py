"""Input edge cases the reference handles implicitly: sub-minimum-chunk
sources (zero-padded to 0.32 s, inference_utils.py:34,47-48), >30 s
conditioning audio (truncated, hifigan_trainer.py:441-442), and stereo /
integer-PCM wav loading (utils.py:49-75 mono-izes and range-checks)."""

import os
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    from synthetic_bundle import write_bundle
    from genvc_tpu.inference.pipeline import model_init

    path = str(tmp_path_factory.mktemp("edge") / "tiny.pth")
    write_bundle(path)
    p = model_init(path)
    p.gen_cap_tokens_per_code = 1.0
    return p


def test_sub_min_chunk_source(pipe):
    """A 0.1 s source (below the 0.32 s minimum chunk) still synthesizes —
    the segmenter pads it to the minimum like the reference does."""
    rng = np.random.default_rng(31)
    src = (rng.standard_normal((1, 1600)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    wav = pipe.synthesize(src, ref)
    assert wav.ndim == 1 and np.all(np.isfinite(wav))
    wav_s, latency, rtf = pipe.synthesize_streaming(src, ref, verbose=False)
    assert np.all(np.isfinite(wav_s)) and latency > 0 and rtf > 0


def test_long_reference_caps_at_30s(pipe):
    """Conditioning audio beyond 30 s is truncated (reference ≤30 s rule):
    a 40 s reference produces the same latent as its first 30 s."""
    rng = np.random.default_rng(32)
    sr = pipe.sample_rate
    ref40 = (rng.standard_normal((1, sr * 40)) * 0.1).astype(np.float32)
    lat40 = np.asarray(pipe.get_gpt_cond_latents(ref40))
    lat30 = np.asarray(pipe.get_gpt_cond_latents(ref40[:, : sr * 30]))
    assert lat40.shape == (1, 32, 64)
    np.testing.assert_allclose(lat40, lat30, rtol=1e-5, atol=1e-5)


def test_short_reference_tail_chunk_dropped(pipe):
    """A conditioning chunk under 0.33 s is skipped (reference loop
    semantics): 6.1 s of reference equals its first 6 s."""
    rng = np.random.default_rng(33)
    sr = pipe.sample_rate
    ref = (rng.standard_normal((1, int(sr * 6.1))) * 0.1).astype(np.float32)
    lat = np.asarray(pipe.get_gpt_cond_latents(ref))
    lat6 = np.asarray(pipe.get_gpt_cond_latents(ref[:, : sr * 6]))
    np.testing.assert_allclose(lat, lat6, rtol=1e-5, atol=1e-5)


def _write_wav(path, data_int16, sr, channels):
    with wave.open(path, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(data_int16.tobytes())


def test_load_audio_stereo_monoizes(tmp_path):
    from genvc_tpu.dsp.audio_io import load_audio

    rng = np.random.default_rng(34)
    sr = 24000
    left = (rng.standard_normal(sr) * 3000).astype(np.int16)
    right = (rng.standard_normal(sr) * 3000).astype(np.int16)
    inter = np.empty((sr * 2,), np.int16)
    inter[0::2], inter[1::2] = left, right
    path = str(tmp_path / "stereo.wav")
    _write_wav(path, inter, sr, channels=2)

    wav = load_audio(path, sr)
    assert wav is not None and wav.shape == (1, sr)
    want = (left.astype(np.float32) + right.astype(np.float32)) / 2 / 32768.0
    np.testing.assert_allclose(wav[0], want, atol=1e-4)


def test_load_audio_silence_rejected(tmp_path):
    """The reference's load_audio returns None for out-of-contract audio and
    datasets substitute a known-good sample; all-silent audio loads fine
    (it is in range) — this pins the None-sentinel contract shape."""
    from genvc_tpu.dsp.audio_io import load_audio

    path = str(tmp_path / "missing.wav")
    assert load_audio(path, 24000) is None  # nonexistent file -> None
