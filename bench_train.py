"""Training-throughput benchmark: jitted GPT train step on the local chip.

Secondary metric (the headline metric is bench.py's streaming RTF): prints one
JSON line with the full training step time (on-device feature extraction +
fwd/bwd + AdamW) at a reference-recipe-like shape.

Env knobs: TRAIN_BATCH (default 8), TRAIN_TEXT_LEN (default 50 content tokens
= 4 s audio per sample), TRAIN_LAYERS (default 30).
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

    from genvc_tpu.config import GenVCConfig
    from genvc_tpu.models import contentvec, dvae, gpt as gpt_model
    from genvc_tpu.train import gpt_stage, optim

    batch = int(os.environ.get("TRAIN_BATCH", "8"))
    text_len = int(os.environ.get("TRAIN_TEXT_LEN", "50"))
    layers = int(os.environ.get("TRAIN_LAYERS", "30"))

    cfg = GenVCConfig()
    for c, ch, nt in ((cfg.acoustic_dvae_config, 80, 1024),
                      (cfg.content_dvae_config, 256, 256)):
        c.num_channels, c.num_tokens = ch, nt
        c.codebook_dim, c.hidden_dim, c.num_resnet_blocks, c.num_layers = 512, 512, 3, 2
    gcfg = gpt_model.GPTConfig(layers=layers, model_dim=1024, heads=4)

    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    frozen_tree = {
        "contentvec": contentvec.init_params(k1),
        "acoustic_dvae": dvae.init_params(k2, dvae.DVAEConfig(channels=80,
                                                              num_tokens=1024)),
        "content_dvae": dvae.init_params(k3, dvae.DVAEConfig(channels=256,
                                                             num_tokens=256)),
    }
    frozen = gpt_stage.make_frozen(cfg, frozen_tree, np.ones(80, np.float32))
    params = gpt_model.init_params(k4, gcfg)

    tx = optim.adamw_grouped(optim.multistep_schedule(1e-4, [10000], 0.5),
                             params=params)
    state = gpt_stage.GPTTrainState(params, tx.init(params), jnp.int32(0))
    train_step, _ = gpt_stage.make_train_step(gcfg, tx)
    _jit = jax.jit(train_step, donate_argnums=(0,))
    jit_step = lambda s, b: _jit(s, b, frozen)

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
    b0 = make()
    t0 = time.perf_counter()
    state, metrics = jit_step(state, b0)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t0

    n = int(os.environ.get("TRAIN_STEPS", "10"))
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = jit_step(state, make())
    jax.block_until_ready(metrics["loss"])
    step_ms = (time.perf_counter() - t0) / n * 1000

    tokens_per_step = batch * text_len * (1 + 1.875)  # text + audio tokens
    print(json.dumps({
        "metric": "gpt_train_step_ms",
        "value": round(step_ms, 1),
        "unit": "ms",
        "vs_baseline": None,  # the reference publishes no training numbers
        "batch": batch,
        "text_len": text_len,
        "layers": layers,
        "loss": round(float(metrics["loss"]), 3),
        "tokens_per_sec": round(tokens_per_step / (step_ms / 1000), 0),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
