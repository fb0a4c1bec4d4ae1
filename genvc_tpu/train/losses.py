"""GAN criteria + mel reconstruction loss for the vocoder stage
(reference: layers/hifigan_loss.py)."""

from __future__ import annotations

import jax.numpy as jnp

from genvc_tpu.config import VocoderConfig
from genvc_tpu.dsp import mel as mel_mod


def _f32(x):
    # discriminator stacks may run in bf16 (training-only); losses always
    # accumulate in f32
    return x.astype(jnp.float32)


def feature_loss(fmap_r, fmap_g):
    """L1 feature matching ×2 (hifigan_loss.py:78-90)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(_f32(rl) - _f32(gl)))
    return loss * 2.0


def discriminator_loss(real_logits, fake_logits):
    """LSGAN discriminator loss (hifigan_loss.py:92-108)."""
    loss = 0.0
    for dr, dg in zip(real_logits, fake_logits):
        loss = loss + jnp.mean(jnp.square(1.0 - _f32(dr))) \
            + jnp.mean(jnp.square(_f32(dg)))
    return loss


def generator_adv_loss(fake_logits):
    """LSGAN generator loss (hifigan_loss.py:110-123)."""
    loss = 0.0
    for dg in fake_logits:
        loss = loss + jnp.mean(jnp.square(1.0 - _f32(dg)))
    return loss


def mel_loss(y_gt, y_pred, cfg: VocoderConfig):
    """L1 ×45 on librosa-mel STFT features, center=False
    (hifigan_loss.py:125-141 with extract_mel_features :16-75)."""
    spec = mel_mod.MelSpec(sample_rate=cfg.sample_rate, n_fft=cfg.fft_size,
                           win_length=cfg.win_length, hop_length=cfg.hop_length,
                           n_mels=cfg.num_mels, fmin=cfg.mel_fmin,
                           fmax=cfg.mel_fmax, scale="slaney")
    gt = mel_mod.mel_vocoder_loss(y_gt, spec)
    pred = mel_mod.mel_vocoder_loss(y_pred, spec)
    return jnp.mean(jnp.abs(gt - pred)) * 45.0
