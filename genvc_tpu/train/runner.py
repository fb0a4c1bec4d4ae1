"""Stage runners: wire datasets, jitted steps, mesh sharding, and the loop.

Each ``run_*_training`` mirrors one reference entry script
(train_audio_dvae.py / train_content_dvae.py / train_genVC.py /
train_vocoder.py) end to end: build frozen modules from checkpoints, init
trainable params, data-parallel over the device mesh, fit.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu import checkpoint as ckpt_lib
from genvc_tpu.config import GenVCConfig, VAEConfig
from genvc_tpu.data.dataset import (VCDatasetConfig, VCWaveDataset,
                                    WaveformDVAEDataset)
from genvc_tpu.data.loader import BatchLoader
from genvc_tpu.models import contentvec, dvae, gpt as gpt_model, hifigan
from genvc_tpu.parallel import mesh as mesh_lib
from genvc_tpu.train import (gpt_stage, loop, optim, vae_stage, vocoder_stage)


def _load_mel_norms(path):
    if path and os.path.exists(str(path)):
        if str(path).endswith(".npy"):
            return jnp.asarray(np.load(path))
        import torch

        return jnp.asarray(torch.load(path, map_location="cpu",
                                      weights_only=True).numpy())
    return jnp.ones((80,), jnp.float32)


def _load_contentvec(path):
    """Load a fairseq ContentVec/HuBERT checkpoint into our pytree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: v for k, v in sd.items() if hasattr(v, "numpy")}
    n = max(int(k.split(".")[2]) for k in sd
            if k.startswith("encoder.layers.")) + 1
    return jax.tree.map(jnp.asarray, ckpt_lib.convert_contentvec(sd, n_layers=n))


def _load_dvae(path, name="dvae"):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and "config" in ckpt:
        sd = ckpt_lib.strip_prefix(ckpt["model"], name + ".")
    else:
        sd = ckpt.get("model", ckpt)
    return jax.tree.map(jnp.asarray, ckpt_lib.convert_dvae(sd))


def _data_mesh(batch_size: int | None = None, n_model: int = 1):
    n = len(jax.devices()) // n_model
    if batch_size is not None:
        while n > 1 and batch_size % n:
            n -= 1
    return mesh_lib.make_mesh(n_data=n, n_model=n_model,
                              devices=jax.devices()[: n * n_model])


def _loader_shards():
    """Multi-host data parallelism: each process reads a disjoint stride of
    the sample space (SURVEY.md §2.2 DistributedSampler analogue)."""
    return dict(num_shards=jax.process_count(),
                shard_index=jax.process_index())


def run_vae_training(cfg: VAEConfig, max_steps: int | None = None,
                     max_eval_batches: int | None = None):
    mesh = _data_mesh(cfg.batch_size)
    logger = loop.Logger(cfg.use_wandb, cfg.wandb_project, cfg.wandb_run_name,
                         cfg.output_path)
    logger.print(f"devices: {jax.devices()}")

    mel_norms = _load_mel_norms(cfg.mel_norm_file)
    if cfg.feat_type != "Mel-spectrogram":
        feat_params = _load_contentvec(cfg.contentvec_model_path)
    else:
        feat_params = mel_norms
    feat_fn = vae_stage.make_feature_fn(cfg)

    dcfg = vae_stage.dvae_cfg_from(cfg)
    params = dvae.init_params(jax.random.key(1994), dcfg)
    if cfg.vae_checkpoint:
        params = _load_dvae(cfg.vae_checkpoint)
    tx = vae_stage.make_optimizer(cfg)
    state = vae_stage.VAETrainState(params, tx.init(params), jnp.int32(0))
    train_step, eval_step = vae_stage.make_train_step(cfg, feat_fn, tx)
    _jit_train = jax.jit(train_step, donate_argnums=(0,))
    _jit_eval = jax.jit(lambda s, b, fp: eval_step(s.params, b, fp))
    jit_train = lambda s, b: _jit_train(s, b, feat_params)
    jit_eval = lambda s, b: _jit_eval(s, b, feat_params)

    train_ds = WaveformDVAEDataset(cfg.train_metafile, False,
                                   cfg.audio.dvae_sample_rate, cfg.max_wav_len)
    eval_ds = WaveformDVAEDataset(cfg.test_metafile, True,
                                  cfg.audio.dvae_sample_rate, cfg.max_wav_len)
    train_loader = BatchLoader(train_ds, cfg.batch_size,
                               num_workers=cfg.num_loader_workers,
                               **_loader_shards())
    eval_loader = BatchLoader(eval_ds, cfg.eval_batch_size, shuffle=False,
                              num_workers=cfg.num_loader_workers,
                              **_loader_shards())

    ckpt = loop.CheckpointManager(os.path.join(cfg.output_path, "ckpt"),
                                  cfg.save_n_checkpoints)
    restored, step0 = ckpt.restore(state)
    if restored is not None:
        state = restored
        logger.print(f"resumed from step {step0}")

    to_dev = lambda b: mesh_lib.shard_batch(
        jax.tree.map(jnp.asarray, b), mesh)

    def on_epoch_end(state, epoch, step):
        # input-vs-reconstruction spectrogram images
        # (reference VAE_trainer eval_step + wandb table, VAE_trainer.py:134-141)
        if not logger.is_main:
            return
        try:
            from genvc_tpu.models import dvae as dvae_mod
            from genvc_tpu.utils import plot_feat

            batch = to_dev(next(iter(eval_loader)))
            feat = feat_fn(feat_params, batch["wav"])
            _, _, recon, _, _ = dvae_mod.forward_train(state.params, feat, dcfg)
            img_dir = os.path.join(cfg.output_path, "eval_plots")
            os.makedirs(img_dir, exist_ok=True)
            plot_feat(np.asarray(feat)[0],
                      os.path.join(img_dir, f"e{epoch}_input.png"))
            plot_feat(np.asarray(recon)[0],
                      os.path.join(img_dir, f"e{epoch}_recon.png"))
            if logger.wandb is not None:
                logger.wandb.log({
                    "eval/input": logger.wandb.Image(
                        os.path.join(img_dir, f"e{epoch}_input.png")),
                    "eval/recon": logger.wandb.Image(
                        os.path.join(img_dir, f"e{epoch}_recon.png"))})
        except Exception as e:
            logger.print(f"eval plot failed: {e}")

    state = loop.fit(state, jit_train, train_loader, epochs=cfg.epochs,
                     logger=logger, eval_step=jit_eval,
                     eval_loader=eval_loader, ckpt=ckpt,
                     save_step=cfg.save_step, to_device=to_dev,
                     start_step=int(step0 or 0), on_epoch_end=on_epoch_end,
                     max_steps=max_steps, max_eval_batches=max_eval_batches)
    return state


def run_gpt_training(cfg: GenVCConfig, max_steps: int | None = None,
                     max_eval_batches: int | None = None, n_model: int = 1,
                     bf16: bool = False, remat: bool | str = False,
                     content_bf16: bool = False):
    """n_model > 1 enables megatron-style tensor parallelism over a 2-D
    (data, model) mesh: GPT attention/MLP weights shard column/row-parallel
    (parallel/mesh.py:gpt_param_specs) and GSPMD inserts the ICI
    all-reduces. The flagship fits one chip, so this is a capability knob.

    bf16=True runs the trainable GPT's matmuls in bfloat16 (f32 master
    params; frozen tokenizers stay full precision — see gpt_stage).
    remat: False / True / "dots" (policy remat: saves MXU matmul outputs,
    recomputes elementwise glue — near-no-remat speed at a fraction of the
    activation memory). content_bf16=True opts the frozen ContentVec forward
    into bf16 (prepare_features docstring has the code-flip caveat);
    measured together at B=24 flagship: 160.7 -> 133.8 ms/step."""
    mesh = _data_mesh(cfg.batch_size, n_model=n_model)
    logger = loop.Logger(cfg.use_wandb, cfg.wandb_project, cfg.wandb_run_name,
                         cfg.output_path)
    logger.print(f"devices: {jax.devices()}")

    mel_norms = _load_mel_norms(cfg.model_args.mel_norm_file)
    frozen_tree = {
        "contentvec": _load_contentvec(cfg.contentvec_model_path),
        "acoustic_dvae": _load_dvae(cfg.acoustic_dvae_checkpoint),
        "content_dvae": _load_dvae(cfg.content_dvae_checkpoint),
    }
    frozen = gpt_stage.make_frozen(cfg, frozen_tree, mel_norms)

    ma = cfg.model_args
    gcfg = gpt_model.GPTConfig(
        layers=ma.gpt_layers, model_dim=ma.gpt_n_model_channels,
        heads=ma.gpt_n_heads, max_text_tokens=ma.gpt_max_text_tokens,
        max_mel_tokens=ma.gpt_max_audio_tokens,
        number_text_tokens=ma.gpt_number_text_tokens or 258,
        num_audio_tokens=ma.gpt_num_audio_tokens,
        start_text_token=ma.gpt_start_text_token or 256,
        stop_text_token=ma.gpt_stop_text_token or 257,
        code_stride_len=ma.gpt_code_stride_len)
    params = gpt_model.init_params(jax.random.key(cfg.training_seed), gcfg)
    if ma.gpt_checkpoint:
        sd, _ = ckpt_lib.load_torch_bundle(ma.gpt_checkpoint)
        params = jax.tree.map(jnp.asarray, ckpt_lib.convert_gpt(
            ckpt_lib.strip_prefix(sd, "gpt."), gcfg.layers))

    # MultiStepLR on epoch milestones -> step milestones
    # (reference: lr_scheduler_params milestones [10,25,35,50] gamma 0.5)
    lsp = cfg.lr_scheduler_params or {}
    milestones_epochs = lsp.get("milestones", [10, 25, 35, 50])
    gamma = lsp.get("gamma", 0.5)

    train_ds = VCWaveDataset(VCDatasetConfig(
        meta_file=cfg.train_metafile, sample_rate=cfg.audio.sample_rate,
        text_frame_rate=cfg.text_frame_rate,
        min_text_len=ma.min_text_length, max_text_len=ma.max_text_length,
        min_conditioning_length=ma.min_conditioning_length,
        max_conditioning_length=ma.max_conditioning_length,
        use_masking_gt_prompt_approach=ma.gpt_use_masking_gt_prompt_approach))
    eval_ds = VCWaveDataset(VCDatasetConfig(
        meta_file=cfg.test_metafile, sample_rate=cfg.audio.sample_rate,
        text_frame_rate=cfg.text_frame_rate,
        min_text_len=ma.min_text_length, max_text_len=ma.max_text_length,
        min_conditioning_length=ma.min_conditioning_length,
        max_conditioning_length=ma.max_conditioning_length,
        use_masking_gt_prompt_approach=ma.gpt_use_masking_gt_prompt_approach,
        is_eval=True))
    train_loader = BatchLoader(train_ds, cfg.batch_size,
                               num_workers=cfg.num_loader_workers,
                               **_loader_shards())
    eval_loader = BatchLoader(eval_ds, cfg.eval_batch_size, shuffle=False,
                              num_workers=cfg.num_loader_workers,
                              **_loader_shards())
    steps_per_epoch = max(len(train_loader), 1)
    sched = optim.multistep_schedule(
        cfg.lr if isinstance(cfg.lr, float) else cfg.lr[0],
        [m * steps_per_epoch for m in milestones_epochs], gamma)
    op = cfg.optimizer_params or {"betas": [0.9, 0.96], "eps": 1e-8,
                                  "weight_decay": 1e-6}
    # GENVC_FUSED_OPT=1: single-traversal clip-folded AdamW (identical
    # numerics, tests/test_train.py; skips the chained clip's materialized
    # scaled-grad tree). Opt-in because its opt_state layout differs from
    # the optax chain's — resuming an existing checkpoint must keep the
    # optimizer it was saved with.
    make_tx = (optim.adamw_clip_fused
               if os.environ.get("GENVC_FUSED_OPT", "0") == "1"
               else optim.adamw_grouped)
    tx = make_tx(sched, betas=tuple(op["betas"]), eps=op["eps"],
                 weight_decay=op["weight_decay"],
                 max_grad_norm=cfg.max_grad_norm, params=params)
    # place params on the mesh: replicated for pure DP, megatron-sharded over
    # 'model' for TP; optimizer moments inherit the placement via zeros_like
    specs = mesh_lib.gpt_param_specs(params)
    params = mesh_lib.shard_tree(params, specs, mesh)
    state = gpt_stage.GPTTrainState(params, tx.init(params), jnp.int32(0))

    train_step, eval_step = gpt_stage.make_train_step(
        gcfg, tx,
        text_ce_weight=ma.gpt_loss_text_ce_weight,
        mel_ce_weight=ma.gpt_loss_mel_ce_weight,
        fix_condition_embeddings=ma.gpt_fix_condition_embeddings,
        compute_dtype=jnp.bfloat16 if bf16 else None,
        remat=remat,
        content_dtype=jnp.bfloat16 if content_bf16 else None,
        # per-module gradient tracking rides the wandb gate like the
        # reference's wandb.watch(model) (gpt_trainer.py:48)
        grad_norms=cfg.use_wandb)
    _jit_train = jax.jit(train_step, donate_argnums=(0,))
    _jit_eval = jax.jit(lambda s, b, fz: eval_step(s.params, b, fz))
    jit_train = lambda s, b: _jit_train(s, b, frozen)
    jit_eval = lambda s, b: _jit_eval(s, b, frozen)

    ckpt = loop.CheckpointManager(os.path.join(cfg.output_path, "ckpt"),
                                  cfg.save_n_checkpoints)
    restored, step0 = ckpt.restore(state)
    if restored is not None:
        state = restored
        logger.print(f"resumed from step {step0}")

    to_dev = lambda b: mesh_lib.shard_batch(jax.tree.map(jnp.asarray, b), mesh)

    def on_epoch_end(state, epoch, step):
        # listening samples: self-reconstruction + cross-speaker conversion
        # (reference generate_eval_sample, gpt_trainer.py:146-170)
        if not logger.is_main:
            return
        try:
            from genvc_tpu.train.eval_samples import generate_eval_samples
            from genvc_tpu.dsp.audio_io import write_wav

            batch = to_dev(next(iter(eval_loader)))
            feats = gpt_stage.prepare_features(frozen, batch)
            self_wav, cross_wav, tgt = generate_eval_samples(
                state.params, gcfg, frozen.acoustic_dvae_params,
                frozen.acoustic_dvae_cfg, feats, frozen.mel_norms,
                jax.random.key(epoch))
            sample_dir = os.path.join(cfg.output_path, "eval_samples")
            os.makedirs(sample_dir, exist_ok=True)
            write_wav(os.path.join(sample_dir, f"e{epoch}_self.wav"),
                      self_wav, cfg.audio.sample_rate)
            write_wav(os.path.join(sample_dir, f"e{epoch}_cross{tgt}.wav"),
                      cross_wav, cfg.audio.sample_rate)
            if logger.wandb is not None:
                logger.wandb.log({
                    "eval/self_recon": logger.wandb.Audio(
                        self_wav, sample_rate=cfg.audio.sample_rate),
                    "eval/cross_speaker": logger.wandb.Audio(
                        cross_wav, sample_rate=cfg.audio.sample_rate)})
        except Exception as e:
            logger.print(f"eval sample generation failed: {e}")

    state = loop.fit(state, jit_train, train_loader, epochs=cfg.epochs,
                     logger=logger, eval_step=jit_eval,
                     eval_loader=eval_loader, ckpt=ckpt,
                     save_step=cfg.save_step, print_step=cfg.print_step,
                     to_device=to_dev, start_step=int(step0 or 0),
                     on_epoch_end=on_epoch_end,
                     max_steps=max_steps, max_eval_batches=max_eval_batches)
    return state


def run_vocoder_training(cfg: GenVCConfig, max_steps: int | None = None,
                         max_eval_batches: int | None = None,
                         families_per_program: int = 2,
                         bf16_discs: bool = False):
    mesh = _data_mesh(cfg.batch_size)
    logger = loop.Logger(cfg.use_wandb, cfg.wandb_project, cfg.wandb_run_name,
                         cfg.output_path)
    logger.print(f"devices: {jax.devices()}")

    mel_norms = _load_mel_norms(cfg.model_args.mel_norm_file)
    frozen_tree = {
        "contentvec": _load_contentvec(cfg.contentvec_model_path),
        "acoustic_dvae": _load_dvae(cfg.acoustic_dvae_checkpoint),
        "content_dvae": _load_dvae(cfg.content_dvae_checkpoint),
    }
    frozen = gpt_stage.make_frozen(cfg, frozen_tree, mel_norms)

    ma = cfg.model_args
    gcfg = gpt_model.GPTConfig(
        layers=ma.gpt_layers, model_dim=ma.gpt_n_model_channels,
        heads=ma.gpt_n_heads, max_text_tokens=ma.gpt_max_text_tokens,
        max_mel_tokens=ma.gpt_max_audio_tokens,
        number_text_tokens=ma.gpt_number_text_tokens or 258,
        num_audio_tokens=ma.gpt_num_audio_tokens,
        start_text_token=ma.gpt_start_text_token or 256,
        stop_text_token=ma.gpt_stop_text_token or 257,
        code_stride_len=ma.gpt_code_stride_len)
    assert ma.gpt_checkpoint, "vocoder stage needs a frozen GPT checkpoint"
    sd, _ = ckpt_lib.load_torch_bundle(ma.gpt_checkpoint)
    gpt_params = jax.tree.map(jnp.asarray, ckpt_lib.convert_gpt(
        ckpt_lib.strip_prefix(sd, "gpt."), gcfg.layers))

    key = jax.random.key(cfg.training_seed)
    kg, kd = jax.random.split(key)
    gen_params = hifigan.init_generator(kg, cfg.vocoder_config,
                                        weight_normed=True)
    if ma.hifigan_checkpoint:
        hsd, _ = ckpt_lib.load_torch_bundle(ma.hifigan_checkpoint)
        gen_params = jax.tree.map(jnp.asarray, ckpt_lib.convert_hifigan(
            ckpt_lib.strip_prefix(hsd, "hifigan."), fold=False))
    disc_params, cqt_statics = vocoder_stage.init_discriminators(
        kd, cfg.vocoder_config)

    train_ds = VCWaveDataset(VCDatasetConfig(
        meta_file=cfg.train_metafile, sample_rate=cfg.audio.sample_rate,
        text_frame_rate=cfg.text_frame_rate,
        min_text_len=ma.min_text_length, max_text_len=ma.max_text_length,
        min_conditioning_length=ma.min_conditioning_length,
        max_conditioning_length=ma.max_conditioning_length,
        use_masking_gt_prompt_approach=ma.gpt_use_masking_gt_prompt_approach))
    eval_ds = VCWaveDataset(VCDatasetConfig(
        meta_file=cfg.test_metafile, sample_rate=cfg.audio.sample_rate,
        text_frame_rate=cfg.text_frame_rate,
        min_text_len=ma.min_text_length, max_text_len=ma.max_text_length,
        min_conditioning_length=ma.min_conditioning_length,
        max_conditioning_length=ma.max_conditioning_length,
        use_masking_gt_prompt_approach=ma.gpt_use_masking_gt_prompt_approach,
        is_eval=True))
    train_loader = BatchLoader(train_ds, cfg.batch_size,
                               num_workers=cfg.num_loader_workers,
                               **_loader_shards())
    eval_loader = BatchLoader(eval_ds, cfg.eval_batch_size, shuffle=False,
                              num_workers=cfg.num_loader_workers,
                              **_loader_shards())

    import optax

    op = cfg.optimizer_params or {"betas": [0.8, 0.99], "eps": 1e-8,
                                  "weight_decay": 1e-6}
    lr = cfg.lr if isinstance(cfg.lr, float) else cfg.lr[0]
    # ExponentialLR per epoch (reference get_scheduler,
    # hifigan_trainer.py:574-591, gamma = lr_decay)
    sched = optim.exponential_epoch_schedule(lr, cfg.lr_decay,
                                             max(len(train_loader), 1))

    def make_tx():
        return optim.vocoder_adamw(sched, betas=tuple(op["betas"]))

    gen_tx, disc_tx = make_tx(), make_tx()
    state = vocoder_stage.VocoderTrainState(
        gen_params, disc_params, gen_tx.init(gen_params),
        disc_tx.init(disc_params), jnp.int32(0))
    scale = int(ma.gpt_code_stride_len // cfg.vocoder_config.hop_length)
    # split-program GAN step: the fused single-program variant
    # (make_train_step) exceeds compile-memory limits on constrained
    # compile services; the split is mathematically identical.
    # families_per_program trades dispatch count for compile size (4 -> only
    # 4 device programs/step with fused optimizer updates).
    train_step, eval_step = vocoder_stage.make_split_steps(
        gcfg, cfg.vocoder_config, cqt_statics,
        gen_tx, disc_tx, scale_factor=scale,
        families_per_program=families_per_program,
        disc_dtype=jnp.bfloat16 if bf16_discs else None)
    jit_train = lambda s, b: train_step(s, b, frozen, gpt_params)
    jit_eval = lambda s, b: eval_step(s, b, frozen, gpt_params)

    ckpt = loop.CheckpointManager(os.path.join(cfg.output_path, "ckpt"),
                                  cfg.save_n_checkpoints)
    restored, step0 = ckpt.restore(state)
    if restored is not None:
        state = restored
        logger.print(f"resumed from step {step0}")

    to_dev = lambda b: mesh_lib.shard_batch(jax.tree.map(jnp.asarray, b), mesh)
    state = loop.fit(state, jit_train, train_loader, epochs=cfg.epochs,
                     logger=logger, eval_step=jit_eval,
                     eval_loader=eval_loader, ckpt=ckpt,
                     save_step=cfg.save_step, print_step=cfg.print_step,
                     to_device=to_dev, start_step=int(step0 or 0),
                     max_steps=max_steps, max_eval_batches=max_eval_batches)
    return state
