"""dVAE training stage (audio + content tokenizers).

Mirrors the reference VAE_Trainer (trainers/VAE_trainer.py): features = mel
(audio dVAE) or ContentVec features (content dVAE) selected by ``feat_type``
(:46-53), feature length trimmed to a multiple of 4 (:91-94), manual optimize
with recon + commitment, grad-clip 0.5, Adam (:98-116, :244-247). The EMA
codebook update is part of the jitted step with psum over the data axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from genvc_tpu.config import VAEConfig
from genvc_tpu.dsp import mel as mel_mod
from genvc_tpu.models import contentvec, dvae


class VAETrainState(NamedTuple):
    params: dict          # encoder/decoder/codebook pytree
    opt_state: optax.OptState
    step: jnp.ndarray


def dvae_cfg_from(config: VAEConfig) -> dvae.DVAEConfig:
    return dvae.DVAEConfig(
        channels=config.num_channels, num_tokens=config.num_tokens,
        codebook_dim=config.codebook_dim, hidden_dim=config.hidden_dim,
        num_resnet_blocks=config.num_resnet_blocks,
        kernel_size=config.kernel_size, num_layers=config.num_layers)


def make_feature_fn(config: VAEConfig):
    """Returns feat_fn(feat_params, wav): feat_params is the mel-norms array
    (Mel type) or the ContentVec param pytree — passed as a jit ARGUMENT so
    frozen extractor weights never become compile-time constants."""
    if config.feat_type == "Mel-spectrogram":
        spec = mel_mod.MelSpec(
            sample_rate=config.audio.sample_rate, n_fft=1024, win_length=1024,
            hop_length=256, n_mels=80, fmin=0, fmax=8000.0, scale="htk")

        def feat_fn(feat_params, wav):
            m = mel_mod.mel_torchaudio(wav[:, 0, :], spec, feat_params)
            t = m.shape[-1] - (m.shape[-1] % 4)
            return m[:, :, :t]

    elif config.feat_type == "ContentVec":
        def feat_fn(feat_params, wav):
            feats = contentvec.extract_content_features(
                feat_params, wav[:, 0, :])
            m = jnp.swapaxes(feats, 1, 2)
            t = m.shape[-1] - (m.shape[-1] % 4)
            return m[:, :, :t]

    elif config.feat_type == "W2V2_BERT":
        # mHuBERT-style conv-extractor-only features
        # (reference MultiLingualContentExtractor, content_processor.py:36-52)
        def feat_fn(feat_params, wav):
            feats = contentvec.extract_conv_features(
                feat_params, wav[:, 0, :])
            m = jnp.swapaxes(feats, 1, 2)
            t = m.shape[-1] - (m.shape[-1] % 4)
            return m[:, :, :t]

    else:
        raise ValueError(f"unknown feat_type {config.feat_type}")
    return feat_fn


def make_train_step(config: VAEConfig, feat_fn, tx,
                    axis_name: str | None = None):
    cfg = dvae_cfg_from(config)

    def loss_fn(params, feat):
        recon, commit, out, new_cb, codes = dvae.forward_train(
            params, feat, cfg, axis_name=axis_name)
        return recon + commit, (recon, commit, new_cb, codes)

    def train_step(state: VAETrainState, batch: dict, feat_params=None):
        feat = jax.lax.stop_gradient(feat_fn(feat_params, batch["wav"]))
        (total, (recon, commit, new_cb, codes)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, feat)
        # codebook leaves are EMA-updated, not gradient-updated
        grads["codebook"] = jax.tree.map(jnp.zeros_like, grads["codebook"])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = dict(params, codebook=new_cb)
        metrics = {"loss": total, "recon_loss": recon,
                   "commitment_loss": commit}
        return VAETrainState(params, opt_state, state.step + 1), metrics

    def eval_step(params, batch: dict, feat_params=None):
        feat = feat_fn(feat_params, batch["wav"])
        recon, commit, out, _, _ = dvae.forward_train(params, feat, cfg)
        return {"loss": recon + commit, "recon_loss": recon,
                "commitment_loss": commit}

    return train_step, eval_step


def make_optimizer(config: VAEConfig):
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip_norm),
        optax.adam(config.lr, b1=config.opt_betas[0], b2=config.opt_betas[1]))
