"""DSP parity tests.

Golden references are computed with torch (CPU) inside the tests — torch.stft /
torch.hann_window give the exact numerics the reference pipeline relied on via
torchaudio, so matching them validates the fused DFT-matmul path.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from genvc_tpu.dsp import filters, mel
from genvc_tpu.dsp.resample import resample, resample_np


def torch_stft_power(x, n_fft, hop, win_length, center=True, normalized=False, power=2):
    xt = torch.from_numpy(np.asarray(x, dtype=np.float64))
    window = torch.hann_window(win_length, dtype=torch.float64)
    spec = torch.stft(
        xt, n_fft, hop_length=hop, win_length=win_length, window=window,
        center=center, pad_mode="reflect", normalized=normalized,
        onesided=True, return_complex=True,
    )
    if power is None:
        return spec
    return spec.abs() ** power


def test_hann_window_matches_torch():
    for n in (256, 1024, 2048):
        ours = filters.hann_window(n)
        ref = torch.hann_window(n, dtype=torch.float64).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_stft_power_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6400)).astype(np.float32) * 0.3
    for n_fft, win in ((1024, 1024), (2048, 1024)):
        ref = torch_stft_power(x, n_fft, 256, win).numpy()  # (B, F, T)
        pad = n_fft // 2
        xp = jnp.pad(jnp.asarray(x), ((0, 0), (pad, pad)), mode="reflect")
        frames = mel.frame_signal(xp, n_fft, 256)
        got = mel._power_spectrum(frames, n_fft, win)  # (B, T, F)
        got = np.swapaxes(np.asarray(got), 1, 2)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_mel_torchaudio_variant_shapes_and_values():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 24000)).astype(np.float32) * 0.2
    spec = mel.MelSpec(sample_rate=24000, n_fft=1024, win_length=1024,
                       hop_length=256, n_mels=80, fmax=8000.0, scale="htk")
    norms = torch.load("/root/reference/pre_trained/mel_stats.pth",
                       map_location="cpu", weights_only=True).numpy()
    out = mel.mel_torchaudio(jnp.asarray(x), spec, jnp.asarray(norms))
    assert out.shape == (1, 80, 1 + 24000 // 256)
    # reference formula in torch
    p = torch_stft_power(x, 1024, 256, 1024).numpy()[0]  # (F, T)
    fb = filters.mel_filterbank(24000, 1024, 80, 0.0, 8000.0, "htk", "slaney")
    m = fb.T.astype(np.float64) @ p
    m = np.log(np.clip(m, 1e-5, None)) / norms[:, None]
    np.testing.assert_allclose(np.asarray(out[0]), m, rtol=1e-3, atol=2e-3)


def test_mel_filterbank_properties():
    fb = filters.mel_filterbank(24000, 1024, 80, 0.0, 8000.0, "slaney", "slaney")
    assert fb.shape == (513, 80)
    assert np.all(fb >= 0)
    # every filter has support
    assert np.all(fb.sum(axis=0) > 0)
    # htk and slaney scales must differ above 1 kHz
    fb2 = filters.mel_filterbank(24000, 1024, 80, 0.0, 8000.0, "htk", "slaney")
    assert not np.allclose(fb, fb2)


def test_mel_scale_conversion_roundtrip():
    freqs = np.linspace(10, 11999, 50)
    for scale in ("htk", "slaney"):
        back = filters.mel_to_hz(filters.hz_to_mel(freqs, scale), scale)
        np.testing.assert_allclose(back, freqs, rtol=1e-9)


def test_resample_length_and_tone():
    # 24k -> 16k with the kaiser parameters from the reference GPT trainer
    sr_in, sr_out = 24000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None, :]
    y = resample_np(x, sr_in, sr_out, lowpass_filter_width=64,
                    rolloff=0.9475937167399596, beta=14.769656459379492,
                    window="kaiser")
    assert y.shape == (1, 16000)
    # the resampled signal should still be a 440 Hz tone
    spec = np.abs(np.fft.rfft(y[0] * np.hanning(len(y[0]))))
    peak_hz = np.argmax(spec) * sr_out / len(y[0])
    assert abs(peak_hz - 440.0) < 2.0
    # amplitude preserved within a couple percent
    assert abs(np.abs(y[0][1000:-1000]).max() - 1.0) < 0.03


def _torchaudio_resample_replica(x, orig_freq, new_freq, lowpass_filter_width,
                                 rolloff, beta):
    """Independent float64 numpy replica of torchaudio.functional.resample's
    kaiser_window path (torchaudio _get_sinc_resample_kernel semantics),
    written from the published algorithm — the golden reference for the
    acoustic-dVAE resample branch (gpt_trainer.py:213-222); torchaudio itself
    is not installed in this image."""
    import math

    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = (-np.arange(new, dtype=np.float64)[:, None] / new + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.i0(beta * np.sqrt(1 - (t / lowpass_filter_width) ** 2)) \
        / np.i0(beta)
    t *= np.pi
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels *= window * base_freq / orig
    xt = np.asarray(x, dtype=np.float64)
    n = xt.shape[-1]
    target_len = math.ceil(new * n / orig)
    xp = np.pad(xt, [(0, 0)] * (xt.ndim - 1) + [(width, width + orig)])
    out = np.zeros(xt.shape[:-1] + (new, (n + orig - 1) // orig + 1))
    for phase in range(new):
        k = kernels[phase]
        for blk in range(out.shape[-1]):
            s = blk * orig
            seg = xp[..., s : s + k.shape[0]]
            if seg.shape[-1] < k.shape[0]:
                seg = np.pad(seg, [(0, 0)] * (seg.ndim - 1)
                             + [(0, k.shape[0] - seg.shape[-1])])
            out[..., phase, blk] = (seg * k).sum(-1)
    y = np.swapaxes(out, -1, -2).reshape(xt.shape[:-1] + (-1,))
    return y[..., :target_len]


def test_resample_kaiser_matches_torchaudio_algorithm():
    """24k -> 16k with the reference's exact kaiser filter parameters
    (lowpass_filter_width=64, rolloff=0.9475937..., beta=14.7696...)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4800)).astype(np.float32) * 0.5
    kw = dict(lowpass_filter_width=64, rolloff=0.9475937167399596,
              beta=14.769656459379492)
    want = _torchaudio_resample_replica(x, 24000, 16000, **kw)
    got = np.asarray(resample(jnp.asarray(x), 24000, 16000, window="kaiser",
                              **kw))
    assert got.shape == want.shape == (2, 3200)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # and an upsampling config (e.g. dvae_sample_rate > sample_rate)
    want_up = _torchaudio_resample_replica(x, 16000, 24000, **kw)
    got_up = np.asarray(resample(jnp.asarray(x), 16000, 24000,
                                 window="kaiser", **kw))
    assert got_up.shape == want_up.shape == (2, 7200)
    np.testing.assert_allclose(got_up, want_up, rtol=2e-4, atol=2e-5)


def test_resample_jax_matches_np():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 9601)).astype(np.float32)
    yn = resample_np(x, 24000, 16000)
    yj = np.asarray(resample(jnp.asarray(x), 24000, 16000))
    assert yn.shape == yj.shape
    np.testing.assert_allclose(yn, yj, rtol=1e-4, atol=1e-5)


def test_stft_complex_normalized():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4096)).astype(np.float32)
    re, im = mel.stft_complex(jnp.asarray(x), 1024, 256, 1024)
    ref = torch_stft_power(x, 1024, 256, 1024, center=False, normalized=True,
                           power=None)
    # torch center=False does not pad; frames = 1 + (T - n_fft)//hop
    np.testing.assert_allclose(np.asarray(re)[0], ref.real.numpy()[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im)[0], ref.imag.numpy()[0], rtol=1e-3, atol=1e-4)
