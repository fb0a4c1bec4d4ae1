"""GPT training stage: on-device feature extraction + teacher-forced step.

Mirrors the reference GPTTrainer (trainers/gpt_trainer.py): frozen ContentVec
+ acoustic/content dVAEs tokenize the raw waveform batch on device under
stop_gradient (``format_batch_on_device`` :198-254), then the trainable GPT
computes weighted dual CE (text 0.01, mel 1.0, :256-276) with AdamW
(wd-only-on-weights) and grad-clip 1.0.

TPU design: one jitted ``train_step(state, batch)`` containing feature
extraction, fwd/bwd, and the optimizer update; batch arrives sharded over the
mesh 'data' axis, params optionally sharded over 'model' (parallel/mesh.py);
XLA emits the gradient psum from the shardings.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genvc_tpu.config import GenVCConfig
from genvc_tpu.dsp import mel as mel_mod
from genvc_tpu.dsp.resample import resample
from genvc_tpu.models import contentvec, dvae, gpt as gpt_model


class GPTTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


@dataclasses.dataclass
class FrozenModules:
    """Frozen feature extractors shared by the GPT and vocoder stages.

    Registered as a jax pytree (param trees are leaves, configs are static
    metadata) so it is passed to jitted steps as an ARGUMENT — closing over
    hundreds of MB of frozen weights would embed them as compile-time HLO
    constants (pathological compiles / oversized remote-compile payloads).
    """

    contentvec_params: dict
    acoustic_dvae_params: dict
    acoustic_dvae_cfg: dvae.DVAEConfig
    content_dvae_params: dict
    content_dvae_cfg: dvae.DVAEConfig
    mel_norms: jnp.ndarray
    style_spec: mel_mod.MelSpec
    dvae_spec: mel_mod.MelSpec
    sample_rate: int = 24000
    content_sample_rate: int = 16000
    text_frame_rate: float = 0.02
    dvae_sample_rate: int = 24000


jax.tree_util.register_dataclass(
    FrozenModules,
    data_fields=["contentvec_params", "acoustic_dvae_params",
                 "content_dvae_params", "mel_norms"],
    meta_fields=["acoustic_dvae_cfg", "content_dvae_cfg", "style_spec",
                 "dvae_spec", "sample_rate", "content_sample_rate",
                 "text_frame_rate", "dvae_sample_rate"])


def make_frozen(cfg: GenVCConfig, tree: dict, mel_norms) -> FrozenModules:
    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    return FrozenModules(
        contentvec_params=to_j(tree["contentvec"]),
        acoustic_dvae_params=to_j(tree["acoustic_dvae"]),
        acoustic_dvae_cfg=dvae.DVAEConfig(
            channels=cfg.acoustic_dvae_config.num_channels,
            num_tokens=cfg.acoustic_dvae_config.num_tokens,
            codebook_dim=cfg.acoustic_dvae_config.codebook_dim,
            hidden_dim=cfg.acoustic_dvae_config.hidden_dim,
            num_resnet_blocks=cfg.acoustic_dvae_config.num_resnet_blocks,
            kernel_size=cfg.acoustic_dvae_config.kernel_size,
            num_layers=cfg.acoustic_dvae_config.num_layers),
        content_dvae_params=to_j(tree["content_dvae"]),
        content_dvae_cfg=dvae.DVAEConfig(
            channels=cfg.content_dvae_config.num_channels,
            num_tokens=cfg.content_dvae_config.num_tokens,
            codebook_dim=cfg.content_dvae_config.codebook_dim,
            hidden_dim=cfg.content_dvae_config.hidden_dim,
            num_resnet_blocks=cfg.content_dvae_config.num_resnet_blocks,
            kernel_size=cfg.content_dvae_config.kernel_size,
            num_layers=cfg.content_dvae_config.num_layers),
        mel_norms=jnp.asarray(mel_norms),
        style_spec=mel_mod.MelSpec(sample_rate=cfg.audio.sample_rate,
                                   n_fft=2048, win_length=1024, hop_length=256,
                                   n_mels=80, fmin=0, fmax=8000.0, scale="htk"),
        dvae_spec=mel_mod.MelSpec(sample_rate=cfg.audio.dvae_sample_rate,
                                  n_fft=1024, win_length=1024, hop_length=256,
                                  n_mels=80, fmin=0, fmax=8000.0, scale="htk"),
        sample_rate=cfg.audio.sample_rate,
        content_sample_rate=cfg.audio.content_sample_rate,
        text_frame_rate=cfg.text_frame_rate,
        dvae_sample_rate=cfg.audio.dvae_sample_rate,
    )


def prepare_features(frozen: FrozenModules, batch: dict,
                     content_dtype=None) -> dict:
    """format_batch_on_device equivalent (gpt_trainer.py:198-254); all under
    implicit stop_gradient (no trainable params touched).

    batch: wav (B,1,T) @24k, wav_lengths (B,), conditioning (B,1,1,Tc),
    cond_lens (B,), text_lengths (B,).
    Returns dict with cond_mels, audio_codes, text_inputs added.

    ``content_dtype=jnp.bfloat16``: opt-in bf16 ContentVec forward (the
    dominant cost of this function; ~2x on the MXU). The acoustic path (mel
    -> dVAE codes = the training LABELS) always stays f32; only the content
    feature extractor is affected, and its output is upcast to f32 before
    the content-dVAE tokenize so the VQ distance argmin runs in f32. Default
    None = f32 everywhere, matching the reference's f32 training.
    """
    wav = batch["wav"][:, 0, :]           # (B, T)
    cond = batch["conditioning"][:, 0, 0, :]  # (B, Tc)

    cond_mels = mel_mod.mel_torchaudio(cond, frozen.style_spec, frozen.mel_norms)
    if frozen.dvae_sample_rate != frozen.sample_rate:
        # kaiser-window resample to the acoustic dVAE's rate with the
        # reference's exact filter (gpt_trainer.py:213-222); no-op for the
        # shipped configs (24k -> 24k)
        dvae_wav = resample(wav, frozen.sample_rate, frozen.dvae_sample_rate,
                            lowpass_filter_width=64,
                            rolloff=0.9475937167399596,
                            beta=14.769656459379492, window="kaiser")
    else:
        dvae_wav = wav
    dvae_mel = mel_mod.mel_torchaudio(dvae_wav, frozen.dvae_spec,
                                      frozen.mel_norms)
    audio_codes = dvae.get_codebook_indices(
        frozen.acoustic_dvae_params, dvae_mel, frozen.acoustic_dvae_cfg)

    content_wav = resample(wav, frozen.sample_rate, frozen.content_sample_rate)
    pad = int(frozen.text_frame_rate * frozen.content_sample_rate)
    content_wav = jnp.pad(content_wav, ((0, 0), (0, pad)))
    feats = contentvec.extract_content_features(frozen.contentvec_params,
                                                content_wav,
                                                compute_dtype=content_dtype)
    text_codes = dvae.get_codebook_indices(
        frozen.content_dvae_params, jnp.swapaxes(feats, 1, 2),
        frozen.content_dvae_cfg)

    # widen audio codes to cover code_lengths = ceil(wav/stride)+3 (the
    # reference F.pads to max_mel_len, gpt.py:413-414; pad value 0 is later
    # replaced by stop tokens in the formatting)
    audio_codes = jnp.pad(audio_codes, ((0, 0), (0, 4)))

    return {
        "cond_mels": cond_mels,
        "cond_lens": batch["cond_lens"],
        "audio_codes": audio_codes,
        "text_inputs": text_codes,
        "text_lengths": batch["text_lengths"].astype(jnp.int32),
        "wav_lengths": batch["wav_lengths"].astype(jnp.int32),
    }


def loss_fn(params, gcfg: gpt_model.GPTConfig, feats: dict,
            text_ce_weight: float, mel_ce_weight: float,
            fix_condition_embeddings: bool = True, remat: bool | str = True,
            attn_impl: str | None = "xla"):
    # attn_impl="xla": the dense-bias attention beats the Pallas kernel
    # inside the remat+scan training step at GenVC sequence lengths
    # (measured ~7% on v5e, see gpt.core_forward docstring)
    loss_text, loss_mel, top10, _ = gpt_model.forward_train(
        params, gcfg,
        feats["text_inputs"], feats["text_lengths"],
        feats["audio_codes"], feats["wav_lengths"],
        cond_mels=feats["cond_mels"], cond_lens=feats["cond_lens"],
        fix_condition_embeddings=fix_condition_embeddings, remat=remat,
        attn_impl=attn_impl)
    loss = text_ce_weight * loss_text + mel_ce_weight * loss_mel
    return loss, {"loss": loss, "loss_text_ce": loss_text,
                  "loss_mel_ce": loss_mel, "top10acc": top10}


def make_train_step(gcfg: gpt_model.GPTConfig,
                    tx: optax.GradientTransformation,
                    text_ce_weight: float = 0.01, mel_ce_weight: float = 1.0,
                    fix_condition_embeddings: bool = True,
                    compute_dtype=None, remat: bool | str = False,
                    attn_impl: str | None = "xla",
                    grad_norms: bool = False, content_dtype=None):
    """Returns (train_step, eval_step); both take the FrozenModules pytree as
    an explicit argument (see FrozenModules docstring).

    ``compute_dtype=jnp.bfloat16`` enables mixed precision on the TRAINABLE
    GPT only: f32 master params/moments, bf16 forward/backward matmuls on the
    MXU (losses stay f32 — _masked_ce upcasts logits). The frozen tokenizer
    path (prepare_features) keeps HIGHEST precision — a bf16 rounding there
    can flip a VQ code index, changing the training targets themselves.

    ``remat=False`` (default) stores block activations for backward — at
    GenVC shapes (≤1.1k context, batch ≤24 -> ≈5 GB) HBM is plentiful and
    skipping the recompute saves ~25% of the GPT step; set True for
    memory-constrained outliers.
    """

    def _cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def _loss(params, feats):
        if compute_dtype is not None:
            feats = dict(feats,
                         cond_mels=feats["cond_mels"].astype(compute_dtype))
        return loss_fn(_cast(params), gcfg, feats, text_ce_weight,
                       mel_ce_weight, fix_condition_embeddings, remat=remat,
                       attn_impl=attn_impl)

    def train_step(state: GPTTrainState, batch: dict, frozen: FrozenModules):
        feats = jax.lax.stop_gradient(
            prepare_features(frozen, batch, content_dtype=content_dtype))
        (loss, metrics), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params, feats)
        if grad_norms:
            # per-module gradient L2 norms — the scalar core of the
            # reference's wandb.watch(model) gradient tracking
            # (gpt_trainer.py:48); fused into the step (cheap reductions),
            # logged under the same per-module naming
            for mod, sub in grads.items():
                metrics[f"grad_norm/{mod}"] = optax.global_norm(sub)
            metrics["grad_norm/total"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return GPTTrainState(params, opt_state, state.step + 1), metrics

    def eval_step(params, batch: dict, frozen: FrozenModules):
        feats = prepare_features(frozen, batch, content_dtype=content_dtype)
        _, metrics = _loss(params, feats)
        return metrics

    return train_step, eval_step
