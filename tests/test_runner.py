"""Integration test: the VAE stage runner end to end on synthetic data
(loader → jitted step → orbax checkpoint → resume)."""

import os

import numpy as np
import pytest


def make_dataset(tmp_path, n=8, sr=24000, dur=0.6):
    from genvc_tpu.dsp.audio_io import write_wav

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        t = np.arange(int(sr * dur)) / sr
        wav = (0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)
               + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, wav, sr)
        paths.append(p)
    meta = str(tmp_path / "meta.txt")
    with open(meta, "w") as f:
        for p in paths:
            f.write(f"{p}|spk0\n")
    return meta


def test_vae_runner_end_to_end(tmp_path):
    from genvc_tpu.config import AudioConfig, VAEConfig
    from genvc_tpu.train.runner import run_vae_training

    meta = make_dataset(tmp_path)
    cfg = VAEConfig(
        audio=AudioConfig(dvae_sample_rate=24000, sample_rate=24000),
        mel_norm_file=None, feat_type="Mel-spectrogram",
        batch_size=4, eval_batch_size=4, num_loader_workers=2,
        max_wav_len=24000, train_metafile=meta, test_metafile=meta,
        epochs=1, grad_clip_norm=0.5, lr=1e-3,
        output_path=str(tmp_path / "exp"), save_step=1,
        num_channels=80, num_tokens=32, codebook_dim=16, hidden_dim=8,
        num_resnet_blocks=1, kernel_size=3, num_layers=2)
    state = run_vae_training(cfg)
    assert int(state.step) == 2  # 8 samples / batch 4
    # checkpoint written
    ckpt_dir = os.path.join(cfg.output_path, "ckpt")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)
    # resume picks up the saved step
    state2 = run_vae_training(cfg.replace(epochs=0))
    assert int(state2.step) == 2
