"""Config bounds validation (reference: configs/base_configs.py:159-191
``BaseAudioConfig.check_values`` — coqpit invokes it at construction time, so
invalid audio/window parameters are rejected before any model is built)."""

import pytest

from genvc_tpu.config import AudioConfig, GenVCConfig


pytestmark = pytest.mark.fast


def test_default_config_accepts():
    cfg = AudioConfig()
    cfg.check_values()  # explicit call is also fine
    top = GenVCConfig()
    assert top.audio.num_mels == 80


def test_reference_bundle_dict_round_trips():
    # reference GPTTrainerConfig audio sub-dict (train_genVC.py literals)
    cfg = GenVCConfig.from_dict(
        {"audio": {"fft_size": 1024, "num_mels": 80, "sample_rate": 24000,
                   "content_sample_rate": 16000}}
    )
    assert cfg.audio.fft_size == 1024


def test_num_mels_below_min_rejected():
    with pytest.raises(ValueError, match="num_mels"):
        AudioConfig(num_mels=5)


def test_fft_size_out_of_range_rejected():
    with pytest.raises(ValueError, match="fft_size"):
        AudioConfig(fft_size=64)
    with pytest.raises(ValueError, match="fft_size"):
        AudioConfig(fft_size=8192)


def test_sample_rate_bounds():
    with pytest.raises(ValueError, match="sample_rate"):
        AudioConfig(sample_rate=100)
    with pytest.raises(ValueError, match="sample_rate"):
        AudioConfig(sample_rate=200000)


def test_mel_fmax_semantics():
    # None allowed (reference allow_none=True)
    AudioConfig(mel_fmax=None)
    # below the 500 Hz floor rejected
    with pytest.raises(ValueError, match="mel_fmax"):
        AudioConfig(mel_fmax=100.0)
    # above Nyquist rejected
    with pytest.raises(ValueError, match="Nyquist"):
        AudioConfig(mel_fmax=20000.0, sample_rate=24000)


def test_window_hop_relationship():
    with pytest.raises(ValueError, match="win_length"):
        AudioConfig(win_length=2048, fft_size=1024)
    with pytest.raises(ValueError, match="hop_length"):
        AudioConfig(hop_length=0)


def test_pad_mode_rejected():
    with pytest.raises(ValueError, match="stft_pad_mode"):
        AudioConfig(stft_pad_mode="wrap")


def test_from_dict_validates_too():
    with pytest.raises(ValueError, match="num_mels"):
        GenVCConfig.from_dict({"audio": {"num_mels": 3}})
