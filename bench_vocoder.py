"""Vocoder GAN-step throughput benchmark (stage 4).

Measures the full split-program GAN step — frozen-GPT latent extraction,
render, discriminator update, generator update over all 4 discriminator
families — at the reference recipe shape (8-token = 0.64 s segments,
train_vocoder.py:53-54). Prints ONE JSON line.

Env knobs: VOC_BATCH (default 16), VOC_FPP (families per device program:
4 = fully fused updates, 4 dispatches/step; 2 = 8 dispatches; 1 = 13),
VOC_STEPS (default 5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/genvc_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import optax

    from genvc_tpu.config import GenVCConfig
    from genvc_tpu.models import contentvec, dvae, gpt as gpt_model, hifigan
    from genvc_tpu.train import gpt_stage, vocoder_stage

    batch = int(os.environ.get("VOC_BATCH", "16"))
    fpp = int(os.environ.get("VOC_FPP", "4"))
    # bf16 discriminator conv stacks (spectral front-ends + losses stay f32)
    disc_bf16 = os.environ.get("VOC_DISC_DTYPE", "bf16") == "bf16"
    text_len = 8  # fixed 0.64 s segments (reference train_vocoder.py:53-54)

    cfg = GenVCConfig()
    for c, ch, nt in ((cfg.acoustic_dvae_config, 80, 1024),
                      (cfg.content_dvae_config, 256, 256)):
        c.num_channels, c.num_tokens = ch, nt
        c.codebook_dim, c.hidden_dim = 512, 512
        c.num_resnet_blocks, c.num_layers = 3, 2
    gcfg = gpt_model.GPTConfig(layers=30, model_dim=1024, heads=4)

    key = jax.random.key(0)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    frozen_tree = {
        "contentvec": contentvec.init_params(k1),
        "acoustic_dvae": dvae.init_params(k2, dvae.DVAEConfig(channels=80,
                                                              num_tokens=1024)),
        "content_dvae": dvae.init_params(k3, dvae.DVAEConfig(channels=256,
                                                             num_tokens=256)),
    }
    frozen = gpt_stage.make_frozen(cfg, frozen_tree, np.ones(80, np.float32))
    gpt_params = gpt_model.init_params(k4, gcfg)
    gen_params = hifigan.init_generator(k5, cfg.vocoder_config,
                                        weight_normed=True)
    disc_params, cqt_statics = vocoder_stage.init_discriminators(
        k6, cfg.vocoder_config)

    tx = lambda: optax.adamw(2e-4, b1=0.8, b2=0.99, weight_decay=0.0)
    gen_tx, disc_tx = tx(), tx()
    state = vocoder_stage.VocoderTrainState(
        gen_params, disc_params, gen_tx.init(gen_params),
        disc_tx.init(disc_params), jnp.int32(0))
    scale = int(gcfg.code_stride_len // cfg.vocoder_config.hop_length)
    train_step, _ = vocoder_stage.make_split_steps(
        gcfg, cfg.vocoder_config, cqt_statics, gen_tx, disc_tx,
        scale_factor=scale, families_per_program=fpp,
        disc_dtype=jnp.bfloat16 if disc_bf16 else None)

    rng = np.random.default_rng(0)
    t_wav = text_len * 1920
    make = lambda: {
        "wav": jnp.asarray(rng.standard_normal((batch, 1, t_wav)) * 0.1,
                           jnp.float32),
        "wav_lengths": jnp.full((batch,), t_wav, jnp.int32),
        "conditioning": jnp.asarray(
            rng.standard_normal((batch, 1, 1, 96000)) * 0.1, jnp.float32),
        "cond_lens": jnp.full((batch,), 96000, jnp.int32),
        "text_lengths": jnp.full((batch,), text_len, jnp.int32),
    }

    t0 = time.perf_counter()
    state, metrics = train_step(state, make(), frozen, gpt_params)
    compile_s = time.perf_counter() - t0

    n = int(os.environ.get("VOC_STEPS", "5"))
    # pre-stage batches on device (the ~7 MB/step host->device upload would
    # otherwise dominate the measurement through slow links; the production
    # loader overlaps this copy with compute)
    batches = [jax.device_put(make()) for _ in range(n)]
    jax.block_until_ready(batches[-1]["wav"])
    t0 = time.perf_counter()
    for bi in batches:
        state, metrics = train_step(state, bi, frozen, gpt_params)
    step_ms = (time.perf_counter() - t0) / n * 1000

    seg_sec = t_wav / cfg.audio.sample_rate
    print(json.dumps({
        "metric": "vocoder_gan_step_ms",
        "value": round(step_ms, 1),
        "unit": "ms",
        "vs_baseline": None,  # the reference publishes no training numbers
        "batch": batch,
        "families_per_program": fpp,
        "disc_dtype": "bf16" if disc_bf16 else "f32",
        "dispatches_per_step": {4: 4, 2: 8, 1: 13}.get(fpp),
        "audio_sec_per_sec": round(batch * seg_sec / (step_ms / 1000), 1),
        "loss_disc": round(metrics["loss_disc"], 3),
        "mel_loss": round(metrics["mel_loss"], 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
