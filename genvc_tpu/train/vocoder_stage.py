"""Vocoder (HiFi-GAN) GAN training stage.

Mirrors the reference HiFiGANTrainer (trainers/hifigan_trainer.py): the frozen
GPT produces per-code latents under no-grad (``format_batch_on_device``
:268-344, incl. the ``wav_lengths += stride//2`` fudge :318 and wav
trim/pad to ``code_len × 1024`` :332-334); then a manual two-optimizer step —
discriminator AdamW update on detached predictions, generator AdamW update
with feature-matching + LSGAN + mel×45 losses (:194-262).

TPU design: both updates live in ONE jitted ``train_step`` — the discriminator
grads use ``stop_gradient`` on the generator output, so a single compiled
program does disc-step → gen-step back to back (one launch per batch).
Generator weights stay in the torch weight-norm (g, v) parametrization so
gradients match the reference's reparametrized updates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genvc_tpu.config import VocoderConfig
from genvc_tpu.models import gpt as gpt_model, hifigan
from genvc_tpu.ops.conv import linear_interp_x4
from genvc_tpu.train import losses
from genvc_tpu.train.gpt_stage import FrozenModules, prepare_features


class VocoderTrainState(NamedTuple):
    gen_params: dict
    disc_params: dict
    gen_opt: optax.OptState
    disc_opt: optax.OptState
    step: jnp.ndarray


def init_discriminators(key, cfg: VocoderConfig, msstftd_specs=None):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mssbcqtd_params, cqt_statics = hifigan.init_mssbcqtd(k4, cfg)
    params = {
        "msd": hifigan.init_msd(k1),
        "mpd": hifigan.init_mpd(k2, periods=tuple(cfg.mpd_reshapes),
                                d_mult=cfg.mpd_discriminator_channel_mult_factor,
                                use_spectral_norm=cfg.mpd_use_spectral_norm),
        "msstftd": hifigan.init_msstftd(k3, filters=cfg.msstftd_filters,
                                        specs=msstftd_specs),
        "mssbcqtd": mssbcqtd_params,
    }
    return params, cqt_statics


_FAM_KEY = {"MSD_Discriminator": "msd", "MPD_Discriminator": "mpd",
            "MSTFT_Discriminator": "msstftd",
            "MSCQT_Discriminator": "mssbcqtd"}


def run_discriminators(disc_params, cqt_statics, cfg: VocoderConfig, y, y_hat,
                       compute_dtype=None, sn_update=False):
    """Returns dict name -> (logits_r, logits_g, fmap_r, fmap_g); with
    ``sn_update=True`` returns (dict, new_disc_params) where the spectral-norm
    power-iteration buffers in MSD (and MPD when spectral) have advanced one
    step per sub-forward, like torch's train-mode forwards.

    ``compute_dtype`` (e.g. bf16) runs the discriminator conv stacks at that
    dtype — a training-only speed knob with no inference parity surface (the
    spectral front-ends stay f32; losses accumulate in f32)."""
    msd = hifigan.msd_forward(disc_params["msd"], y, y_hat,
                              compute_dtype=compute_dtype,
                              sn_update=sn_update)
    mpd = hifigan.mpd_forward(disc_params["mpd"], y, y_hat,
                              periods=tuple(cfg.mpd_reshapes),
                              compute_dtype=compute_dtype,
                              sn_update=sn_update)
    stft = hifigan.msstftd_forward(disc_params["msstftd"], y, y_hat,
                                   compute_dtype=compute_dtype)
    cqt = hifigan.mssbcqtd_forward(disc_params["mssbcqtd"], cqt_statics, y,
                                   y_hat, compute_dtype=compute_dtype)
    if not sn_update:
        return {"MSD_Discriminator": msd, "MPD_Discriminator": mpd,
                "MSTFT_Discriminator": stft, "MSCQT_Discriminator": cqt}
    outs = {"MSD_Discriminator": msd[:4], "MPD_Discriminator": mpd[:4],
            "MSTFT_Discriminator": stft, "MSCQT_Discriminator": cqt}
    new_params = dict(disc_params)
    new_params["msd"], new_params["mpd"] = msd[4], mpd[4]
    return outs, new_params


def prepare_vocoder_batch(frozen: FrozenModules, gpt_params,
                          gcfg: gpt_model.GPTConfig, batch: dict):
    """format_batch_on_device equivalent for the vocoder stage
    (hifigan_trainer.py:268-344). Returns (mel_latents, wav_gt, n_codes)."""
    feats = prepare_features(frozen, batch)
    # wav_lengths fudge (+ stride // 2, hifigan_trainer.py:318)
    wav_lengths = feats["wav_lengths"] + gcfg.code_stride_len // 2
    latents = gpt_model.forward_train(
        gpt_params, gcfg,
        feats["text_inputs"], feats["text_lengths"],
        feats["audio_codes"], wav_lengths,
        cond_mels=feats["cond_mels"], cond_lens=feats["cond_lens"],
        return_latent=True, train=True)
    audio_code_len = feats["audio_codes"].shape[1] - 4  # pre-pad width
    wav_expected = audio_code_len * gcfg.code_stride_len
    wav = batch["wav"][:, 0, :]
    t = wav.shape[-1]
    if t < wav_expected:
        wav = jnp.pad(wav, ((0, 0), (0, wav_expected - t)))
    wav = wav[:, :wav_expected]
    # latents cover the first audio_code_len positions (trim -1 in train mode
    # leaves width wm+1; slice to the code count like the reference width)
    latents = latents[:, :audio_code_len]
    return latents, wav[:, None, :]


def make_train_step(gcfg: gpt_model.GPTConfig, voc_cfg: VocoderConfig,
                    cqt_statics, gen_tx, disc_tx, scale_factor: int = 4,
                    disc_dtype=None):
    """Returns (train_step, eval_step); FrozenModules and the frozen GPT
    params are explicit arguments (kept out of the closure so they are jit
    arguments, not giant compile-time constants). ``disc_dtype`` (e.g. bf16)
    runs the discriminator conv stacks at that dtype (see
    run_discriminators)."""
    def render(gen_params, latents):
        x = jnp.swapaxes(latents, 1, 2)
        x = linear_interp_x4(x, scale_factor)
        return hifigan.generator_forward(gen_params, x, voc_cfg)

    def disc_loss_fn(disc_params, y, y_hat):
        outs, new_disc = run_discriminators(
            disc_params, cqt_statics, voc_cfg, y, y_hat,
            compute_dtype=disc_dtype, sn_update=True)
        total = 0.0
        per = {}
        for name, (lr, lg, _, _) in outs.items():
            l = losses.discriminator_loss(lr, lg)
            per[f"{name}_loss"] = l
            total = total + l
        return total, (per, new_disc)

    def gen_loss_fn(gen_params, disc_params, latents, y):
        y_hat = render(gen_params, latents)
        outs, new_disc = run_discriminators(
            disc_params, cqt_statics, voc_cfg, y, y_hat,
            compute_dtype=disc_dtype, sn_update=True)
        total = 0.0
        per = {}
        for name, (lr, lg, fr, fg) in outs.items():
            fl = losses.feature_loss(fr, fg)
            gl = losses.generator_adv_loss(lg)
            per[f"{name}_featureLoss"] = fl
            per[f"{name}_generatorLoss"] = gl
            total = total + fl + gl
        ml = losses.mel_loss(y[:, 0, :], y_hat[:, 0, :], voc_cfg)
        per["mel"] = ml
        total = total + ml
        return total, (per, y_hat, new_disc)

    def train_step(state: VocoderTrainState, batch: dict,
                   frozen: FrozenModules, gpt_params):
        latents, wav_gt = jax.lax.stop_gradient(
            prepare_vocoder_batch(frozen, gpt_params, gcfg, batch))

        # 1) discriminator step on detached prediction
        y_hat_detached = jax.lax.stop_gradient(render(state.gen_params, latents))
        (d_loss, (d_per, d_sn)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params, wav_gt,
                                        y_hat_detached)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                             state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        # carry forward the power-iteration buffers advanced in the forward
        # (their grads are zero; the optimizer pass above must not touch them)
        disc_params = hifigan.merge_sn_buffers(disc_params, d_sn)

        # 2) generator step against the *updated* discriminator (the reference
        # steps the discriminator first, then re-runs it for the generator)
        (g_loss, (g_per, _, g_sn)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params, disc_params, latents,
                                       wav_gt)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                           state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        disc_params = hifigan.merge_sn_buffers(disc_params, g_sn)

        metrics = {"loss_disc": d_loss, "loss_gen": g_loss,
                   "mel_loss": g_per["mel"]}
        return VocoderTrainState(gen_params, disc_params, gen_opt, disc_opt,
                                 state.step + 1), metrics

    def eval_step(state: VocoderTrainState, batch: dict,
                  frozen: FrozenModules, gpt_params):
        latents, wav_gt = prepare_vocoder_batch(frozen, gpt_params, gcfg, batch)
        y_hat = render(state.gen_params, latents)
        # eval forwards keep the stored power-iteration buffers (torch eval)
        outs = run_discriminators(state.disc_params, cqt_statics, voc_cfg,
                                  wav_gt, y_hat, compute_dtype=disc_dtype)
        d_loss = sum(losses.discriminator_loss(lr, lg)
                     for (lr, lg, _, _) in outs.values())
        ml = losses.mel_loss(wav_gt[:, 0, :], y_hat[:, 0, :], voc_cfg)
        return {"loss_disc": d_loss, "mel_loss": ml}

    return train_step, eval_step


def make_split_steps(gcfg: gpt_model.GPTConfig, voc_cfg: VocoderConfig,
                     cqt_statics, gen_tx, disc_tx, scale_factor: int = 4,
                     per_family: bool = False,
                     families_per_program: int | None = None,
                     disc_dtype=None,
                     families: tuple[str, ...] | None = None,
                     msstftd_specs=None):
    """Split-program variant of the GAN step (the fused single-program
    make_train_step can exceed compile-memory limits: the frozen GPT + 4
    discriminator families fwd+bwd in one XLA program is a ~50 MB MLIR
    payload). Mathematically identical to the fused step — the total loss is
    a sum over families, so gradients computed per group and summed match.

    ``families_per_program`` controls dispatch count vs compile size:
      4 -> 4 programs/step: prepare | render | disc fwd+bwd+UPDATE |
           gen fwd+bwd+mel+UPDATE (optimizer updates fused into the grad
           programs — minimum launches, biggest programs)
      2 -> 8 programs/step (two-family chunks, separate update programs)
      1 -> 13 programs/step (round-1 behavior; ``per_family=True`` alias)
    Returns (train_step, eval_step) with the same call signature as
    make_train_step.
    """
    # ``families`` restricts the discriminator set (default: all four, the
    # reference recipe); subsets are for cheap structural dryruns (e.g. the
    # virtual-mesh GAN-step dryrun keeps MSD+MPD — the two-optimizer +
    # spectral-norm-buffer structure — without the STFT/CQT compile weight)
    if families is None:
        families = ("MSD_Discriminator", "MPD_Discriminator",
                    "MSTFT_Discriminator", "MSCQT_Discriminator")
    elif not families:
        raise ValueError("families must name at least one discriminator")
    fam_key = {"MSD_Discriminator": "msd", "MPD_Discriminator": "mpd",
               "MSTFT_Discriminator": "msstftd",
               "MSCQT_Discriminator": "mssbcqtd"}
    fpp = families_per_program or (1 if per_family else 2)
    chunks = [families[i : i + fpp] for i in range(0, len(families), fpp)]
    fuse_updates = len(chunks) == 1

    def run_family(name, disc_family_params, y, y_hat, sn_update=False):
        """Always returns (lr, lg, fr, fg, new_family_params); families with
        no spectral-norm convs (STFT/CQT) return their params unchanged."""
        if name == "MSD_Discriminator":
            out = hifigan.msd_forward(disc_family_params, y, y_hat,
                                      compute_dtype=disc_dtype,
                                      sn_update=sn_update)
            return out if sn_update else (*out, disc_family_params)
        if name == "MPD_Discriminator":
            out = hifigan.mpd_forward(disc_family_params, y, y_hat,
                                      periods=tuple(voc_cfg.mpd_reshapes),
                                      compute_dtype=disc_dtype,
                                      sn_update=sn_update)
            return out if sn_update else (*out, disc_family_params)
        if name == "MSTFT_Discriminator":
            out = hifigan.msstftd_forward(disc_family_params, y, y_hat,
                                          compute_dtype=disc_dtype,
                                          specs=msstftd_specs)
        else:
            out = hifigan.mssbcqtd_forward(disc_family_params, cqt_statics, y,
                                           y_hat, compute_dtype=disc_dtype)
        return (*out, disc_family_params)

    @jax.jit
    def prepare_fn(batch, frozen, gpt_params):
        return prepare_vocoder_batch(frozen, gpt_params, gcfg, batch)

    @jax.jit
    def render_fn(gen_params, latents):
        x = jnp.swapaxes(latents, 1, 2)
        x = linear_interp_x4(x, scale_factor)
        return hifigan.generator_forward(gen_params, x, voc_cfg)

    # ---- discriminator phase --------------------------------------------
    # chunk program: summed loss + grads for its families' param subtree

    def _disc_loss_chunk(chunk, sn_update=True):
        def f(sub_params, y, y_hat):
            total = 0.0
            new_sub = {}
            for name in chunk:
                lr, lg, _, _, newp = run_family(
                    name, sub_params[fam_key[name]], y, y_hat,
                    sn_update=sn_update)
                new_sub[fam_key[name]] = newp
                total = total + losses.discriminator_loss(lr, lg)
            return total, new_sub
        return f

    if fuse_updates:
        @jax.jit
        def disc_fused(disc_params, disc_opt, y, y_hat):
            (loss, sn_new), grads = jax.value_and_grad(
                _disc_loss_chunk(families), has_aux=True)(
                disc_params, y, y_hat)
            updates, disc_opt = disc_tx.update(grads, disc_opt, disc_params)
            new_params = optax.apply_updates(disc_params, updates)
            new_params = hifigan.merge_sn_buffers(new_params, sn_new)
            return new_params, disc_opt, loss
    else:
        disc_chunk_grads = [
            jax.jit(jax.value_and_grad(_disc_loss_chunk(chunk), has_aux=True))
            for chunk in chunks]

        @jax.jit
        def disc_update(disc_params, disc_opt, grad_subsets, sn_subsets):
            grads = {k: v for sub in grad_subsets for k, v in sub.items()}
            sn_new = {k: v for sub in sn_subsets for k, v in sub.items()}
            updates, disc_opt = disc_tx.update(grads, disc_opt, disc_params)
            new_params = optax.apply_updates(disc_params, updates)
            new_params = hifigan.merge_sn_buffers(new_params, sn_new)
            return new_params, disc_opt

    # ---- generator phase -------------------------------------------------
    # each chunk re-renders inside (gradient flow to the generator); chunk 0
    # also carries the mel x45 loss

    def _gen_loss_chunk(chunk, with_mel):
        def f(gen_params, disc_params, latents, y):
            x = jnp.swapaxes(latents, 1, 2)
            x = linear_interp_x4(x, scale_factor)
            y_hat = hifigan.generator_forward(gen_params, x, voc_cfg)
            total = 0.0
            new_sub = {}
            for name in chunk:
                lr, lg, fr, fg, newp = run_family(
                    name, disc_params[fam_key[name]], y, y_hat,
                    sn_update=True)
                new_sub[fam_key[name]] = newp
                total = total + losses.feature_loss(fr, fg) \
                    + losses.generator_adv_loss(lg)
            ml = losses.mel_loss(y[:, 0, :], y_hat[:, 0, :], voc_cfg) \
                if with_mel else jnp.float32(0.0)
            return total + ml, (ml, new_sub)
        return f

    if fuse_updates:
        @jax.jit
        def gen_fused(gen_params, gen_opt, disc_params, latents, y):
            (loss, (ml, sn_new)), grads = jax.value_and_grad(
                _gen_loss_chunk(families, True), has_aux=True)(
                gen_params, disc_params, latents, y)
            updates, gen_opt = gen_tx.update(grads, gen_opt, gen_params)
            disc_params = hifigan.merge_sn_buffers(disc_params, sn_new)
            return (optax.apply_updates(gen_params, updates), gen_opt,
                    loss, ml, disc_params)
    else:
        gen_chunk_grads = [
            jax.jit(jax.value_and_grad(_gen_loss_chunk(chunk, i == 0),
                                       has_aux=True))
            for i, chunk in enumerate(chunks)]

        @jax.jit
        def gen_update(gen_params, gen_opt, grad_list):
            grads = jax.tree.map(lambda *g: sum(g), *grad_list)
            updates, gen_opt = gen_tx.update(grads, gen_opt, gen_params)
            return optax.apply_updates(gen_params, updates), gen_opt

    def train_step(state: VocoderTrainState, batch: dict,
                   frozen: FrozenModules, gpt_params):
        latents, wav_gt = prepare_fn(batch, frozen, gpt_params)
        y_hat = render_fn(state.gen_params, latents)

        if fuse_updates:
            disc_params, disc_opt, d_loss = disc_fused(
                state.disc_params, state.disc_opt, wav_gt, y_hat)
            gen_params, gen_opt, g_loss, ml, disc_params = gen_fused(
                state.gen_params, state.gen_opt, disc_params, latents, wav_gt)
            d_losses, g_losses = [d_loss], [g_loss]
        else:
            d_losses, d_grad_subs, d_sn_subs = [], [], []
            for chunk, vg in zip(chunks, disc_chunk_grads):
                sub = {fam_key[n]: state.disc_params[fam_key[n]]
                       for n in chunk}
                (l, sn_new), g = vg(sub, wav_gt, y_hat)
                d_losses.append(l)
                d_grad_subs.append(g)
                d_sn_subs.append(sn_new)
            disc_params, disc_opt = disc_update(
                state.disc_params, state.disc_opt, d_grad_subs, d_sn_subs)

            g_losses, g_grad_list = [], []
            ml = None
            for vg in gen_chunk_grads:
                (l, (ml_c, sn_new)), g = vg(state.gen_params, disc_params,
                                            latents, wav_gt)
                g_losses.append(l)
                g_grad_list.append(g)
                # gen-pass power iterations also advance the buffers (torch
                # runs D in train mode for the generator loss too)
                disc_params = {**disc_params,
                               **{k: hifigan.merge_sn_buffers(disc_params[k],
                                                              v)
                                  for k, v in sn_new.items()}}
                if ml is None:
                    ml = ml_c
            gen_params, gen_opt = gen_update(state.gen_params, state.gen_opt,
                                             g_grad_list)

        # one combined fetch of all loss scalars (no per-family syncs)
        vals = jax.device_get((d_losses, g_losses, ml))
        metrics = {"loss_disc": float(np.sum(vals[0])),
                   "loss_gen": float(np.sum(vals[1])),
                   "mel_loss": float(vals[2])}
        return VocoderTrainState(gen_params, disc_params, gen_opt, disc_opt,
                                 state.step + 1), metrics

    @jax.jit
    def eval_losses(state: VocoderTrainState, latents, wav_gt):
        y_hat = render_fn(state.gen_params, latents)
        d_loss, _ = _disc_loss_chunk(families, sn_update=False)(
            state.disc_params, wav_gt, y_hat)
        ml = losses.mel_loss(wav_gt[:, 0, :], y_hat[:, 0, :], voc_cfg)
        return d_loss, ml

    def eval_step(state: VocoderTrainState, batch: dict,
                  frozen: FrozenModules, gpt_params):
        latents, wav_gt = prepare_fn(batch, frozen, gpt_params)
        d_loss, ml = jax.device_get(eval_losses(state, latents, wav_gt))
        return {"loss_disc": float(d_loss), "mel_loss": float(ml)}

    return train_step, eval_step
