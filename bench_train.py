"""Training-throughput benchmark: jitted GPT train step on the local chip.

Secondary metric (the headline metric is bench.py's streaming RTF): prints one
JSON line with the full training step time (on-device feature extraction +
fwd/bwd + AdamW) at a reference-recipe-like shape.

Env knobs: TRAIN_BATCH (default 8), TRAIN_TEXT_LEN (default 50 content tokens
= 4 s audio per sample), TRAIN_LAYERS (default 30), TRAIN_DTYPE
(bf16|f32, default bf16 — bf16 compute on the trainable GPT, f32 master
params), TPU_PEAK_TFLOPS (default 197 = v5e bf16 peak, for the MFU figure).
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
    use_bf16 = os.environ.get("TRAIN_DTYPE", "bf16") == "bf16"
    # TRAIN_REMAT: 0 (store everything), 1 (full per-block remat), or
    # "dots" (policy remat: save MXU matmul outputs, recompute glue)
    _rm = os.environ.get("TRAIN_REMAT", "0")
    use_remat = "dots" if _rm == "dots" else _rm == "1"
    # TRAIN_CONTENT_DTYPE=bf16: opt-in bf16 ContentVec forward in
    # prepare_features (content codes may flip; see gpt_stage docstring)
    content_dtype = (jnp.bfloat16 if os.environ.get(
        "TRAIN_CONTENT_DTYPE", "f32") == "bf16" else None)
    peak_tflops = float(os.environ.get("TPU_PEAK_TFLOPS", "197"))
    # TRAIN_ATTN=flash|xla — A/B the Pallas flash-attention kernel vs the XLA
    # dense-bias attention path inside the identical train step (default xla:
    # measured faster end-to-end at GenVC training shapes, see
    # gpt.core_forward)
    attn = os.environ.get("TRAIN_ATTN", "xla")

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

    # TRAIN_OPT=fused: single-traversal clip-folded AdamW (optim.
    # adamw_clip_fused, numerics-identical to the chain; VERDICT r4 item 6)
    opt_impl = os.environ.get("TRAIN_OPT", "chain")
    make_tx = (optim.adamw_clip_fused if opt_impl == "fused"
               else optim.adamw_grouped)
    tx = make_tx(optim.multistep_schedule(1e-4, [10000], 0.5), params=params)
    state = gpt_stage.GPTTrainState(params, tx.init(params), jnp.int32(0))
    train_step, _ = gpt_stage.make_train_step(
        gcfg, tx, compute_dtype=jnp.bfloat16 if use_bf16 else None,
        remat=use_remat, attn_impl=attn, content_dtype=content_dtype)
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
    # TRAIN_BREAKDOWN=only skips the fused-step machinery entirely: the
    # standalone fwd+bwd program plus the fused executable's reservations
    # don't fit HBM together at flagship shapes — phase timing runs in its
    # own invocation
    bd_mode = os.environ.get("TRAIN_BREAKDOWN", "0")
    step_flops = None
    compile_s = step_ms = None
    metrics = None
    if bd_mode != "only":
        # XLA's own FLOP count for the whole step (feature extraction +
        # fwd/bwd + AdamW) — the honest numerator for MFU
        try:
            ca = _jit.lower(state, b0, frozen).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            step_flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass

        t0 = time.perf_counter()
        state, metrics = jit_step(state, b0)
        jax.block_until_ready(metrics["loss"])
        compile_s = time.perf_counter() - t0

        n = int(os.environ.get("TRAIN_STEPS", "10"))
        # pre-stage batches on device: in production the loader prefetch
        # overlaps the host->device copy with compute; through the dev tunnel
        # an in-loop upload (~5 MB/step) would otherwise dominate
        batches = [jax.device_put(make()) for _ in range(n)]
        jax.block_until_ready(batches[-1]["wav"])
        t0 = time.perf_counter()
        for bi in batches:
            state, metrics = jit_step(state, bi)
        # hard sync: through remote-device tunnels block_until_ready can
        # return before compute completes; a device_get cannot
        jax.device_get(metrics["loss"])
        step_ms = (time.perf_counter() - t0) / n * 1000
        del batches  # release the staged batches' HBM

    # TRAIN_BREAKDOWN=1|only: time the step's three phases as separate
    # programs (frozen feature extraction | GPT fwd+bwd | AdamW update) —
    # the profile-pass answer to "where does the step time go" without trace
    # tooling. Sum > fused step time (no cross-phase overlap/fusion); the
    # ratios are the signal. Runs at TRAIN_BREAKDOWN_BATCH (default
    # min(batch, 8)): the un-donated standalone fwd+bwd program exceeds
    # 16 GB HBM well before the fused+donated step does (B=16 OOMs when a
    # second grads tree is live — hence grad timing below runs before any
    # grads are held).
    breakdown = None
    if bd_mode in ("1", "only"):
        from genvc_tpu.train.gpt_stage import loss_fn, prepare_features
        bd_batch = int(os.environ.get("TRAIN_BREAKDOWN_BATCH",
                                      str(min(batch, 8))))
        bd_b0 = jax.tree.map(lambda x: x[:bd_batch], b0)

        cdt = jnp.bfloat16 if use_bf16 else None

        def _cast(tree):
            if cdt is None:
                return tree
            return jax.tree.map(
                lambda x: x.astype(cdt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

        def _loss(params, feats):
            if cdt is not None:
                feats = dict(feats, cond_mels=feats["cond_mels"].astype(cdt))
            return loss_fn(_cast(params), gcfg, feats, 0.01, 1.0, True,
                           remat=use_remat, attn_impl=attn)

        # frozen rides as an ARGUMENT (closing over it embeds the frozen
        # weights as program constants — oversized remote-compile payload)
        _prep_j = jax.jit(
            lambda fz, b: prepare_features(fz, b, content_dtype=content_dtype))
        prep_j = lambda b: _prep_j(frozen, b)
        grad_j = jax.jit(lambda p, f: jax.value_and_grad(
            _loss, has_aux=True)(p, f))

        import optax

        def upd(g, o, p):
            u, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, u), o2
        # donate opt_state+params and chain them through the timing loop:
        # un-donated, each async dispatch allocates a fresh ~5 GB
        # (params+opt_state) output while prior outputs are still queued —
        # OOM at flagship shapes. Consumes `state`, which breakdown mode no
        # longer needs.
        opt_j = jax.jit(upd, donate_argnums=(1, 2))

        # Timing methodology (remote-tunnel hazards, measured 2026-08-19;
        # full notes in ROUND4_NOTES "Remote-tunnel measurement semantics"):
        # (a) fetching a multi-MB output costs ~25 ms/MB of tunnel bandwidth
        #     — per-call sync on a raw output over-reports small programs;
        # (b) per-dispatch overhead is ~15 ms even on async loops. The
        #     robust recipe: fuse a scalar reduction into the measured
        #     program itself, hard-sync every rep via float(), rotate
        #     distinct staged inputs, subtract the measured RTT.
        def _scalarize(fn):
            def s(*a):
                out = fn(*a)
                return sum(jnp.sum(x).astype(jnp.float32)
                           for x in jax.tree.leaves(out))
            return jax.jit(s)

        def timeit(fn_scalar, cycle, reps=6):
            float(fn_scalar(*cycle[0]))  # warm / compile
            ts = []
            for i in range(reps):
                t0 = time.perf_counter()
                float(fn_scalar(*cycle[i % len(cycle)]))
                ts.append((time.perf_counter() - t0) * 1000)
            return float(np.median(ts))

        _one = jax.jit(lambda x: x + 1.0)
        _z = jnp.float32(0)
        float(_one(_z))
        _rtts = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(_one(_z))
            _rtts.append((time.perf_counter() - t0) * 1000)
        rtt = float(np.median(_rtts))

        # prep sub-phases (each its own program; ratios are the signal)
        from genvc_tpu.dsp import mel as mel_mod
        from genvc_tpu.dsp.resample import resample as _resample
        from genvc_tpu.models import contentvec as _cv, dvae as _dvae

        def _sub_mel(fz, b):
            return mel_mod.mel_torchaudio(b["conditioning"][:, 0, 0, :],
                                          fz.style_spec, fz.mel_norms)

        def _sub_cv(fz, b):
            wav = b["wav"][:, 0, :]
            cw = _resample(wav, fz.sample_rate, fz.content_sample_rate)
            cw = jnp.pad(cw, ((0, 0), (0, int(fz.text_frame_rate *
                                              fz.content_sample_rate))))
            return _cv.extract_content_features(fz.contentvec_params, cw,
                                                compute_dtype=content_dtype)

        def _sub_tok(fz, b):
            wav = b["wav"][:, 0, :]
            m = mel_mod.mel_torchaudio(wav, fz.dvae_spec, fz.mel_norms)
            return _dvae.get_codebook_indices(fz.acoustic_dvae_params, m,
                                              fz.acoustic_dvae_cfg)

        sub_mel = _scalarize(_sub_mel)
        sub_cv = _scalarize(_sub_cv)
        sub_tok = _scalarize(_sub_tok)
        prep_s = _scalarize(
            lambda fz, b: prepare_features(fz, b,
                                           content_dtype=content_dtype))
        fwd_s = _scalarize(lambda p, f: _loss(p, f)[0])
        grad_s = _scalarize(lambda p, f: jax.value_and_grad(
            _loss, has_aux=True)(p, f))

        # distinct staged input variants (identical dispatches risk dedup)
        bd_variants = [bd_b0] + [jax.tree.map(lambda x: x[:bd_batch], make())
                                 for _ in range(2)]
        frozen_cycle = [(frozen, b) for b in bd_variants]
        feat_variants = [prep_j(b) for b in bd_variants]
        feats = feat_variants[0]
        feat_cycle = [(state.params, f) for f in feat_variants]
        sub = lambda ms: round(max(ms - rtt, 0.0), 1)
        breakdown = {
            "batch": bd_batch,
            "tunnel_rtt_ms": round(rtt, 1),
            "prepare_features_ms": sub(timeit(prep_s, frozen_cycle)),
            "prep_cond_mel_ms": sub(timeit(sub_mel, frozen_cycle)),
            "prep_contentvec_ms": sub(timeit(sub_cv, frozen_cycle)),
            "prep_dvae_mel_tokenize_ms": sub(timeit(sub_tok, frozen_cycle)),
            "forward_ms": sub(timeit(fwd_s, feat_cycle)),
            "forward_backward_ms": sub(timeit(grad_s, feat_cycle)),
        }
        (_, _), grads = grad_j(state.params, feats)

        # Optimizer timing: a fused-in scalar + float() per rep + RTT
        # subtraction, like every other phase. Round 4's async-dispatch loop
        # reported 25.9 ms ≈ "1.6x SoL"; that was ~8 ms of per-dispatch
        # tunnel overhead (ROUND4_NOTES hazard 2) — the hard-synced number
        # is ~17.8 ms vs a measured 16.6 ms flat-buffer speed-of-light
        # control (12.1 GB at 819 GB/s), i.e. 1.07x SoL.
        def time_opt(tx_, o0, p0):
            def u(g, o_, p_):
                up, o2 = tx_.update(g, o_, p_)
                p2 = optax.apply_updates(p_, up)
                return p2, o2, jnp.sum(p2["final_norm"]["bias"][:8])
            uj = jax.jit(u, donate_argnums=(1, 2))
            p_, o_, s = uj(grads, o0, p0)
            float(s)
            ts = []
            for _ in range(8):
                t0 = time.perf_counter()
                p_, o_, s = uj(grads, o_, p_)
                float(s)
                ts.append((time.perf_counter() - t0) * 1000)
            del p_, o_
            return sub(float(np.median(ts)))

        # copy params BEFORE the first timed run donates state.params
        p_alt = jax.tree.map(jnp.array, state.params)
        breakdown["optimizer_ms"] = time_opt(tx, state.opt_state,
                                             state.params)
        breakdown["optimizer_impl"] = opt_impl
        # same-process A/B of the OTHER update implementation (chained
        # clip+adamw vs the single-traversal clip-folded fused transform):
        # fresh moments + params, identical grads — Adam's cost is
        # value-independent
        alt_impl = "chain" if opt_impl == "fused" else "fused"
        alt_tx = (optim.adamw_grouped if alt_impl == "chain"
                  else optim.adamw_clip_fused)(
            optim.multistep_schedule(1e-4, [10000], 0.5), params=p_alt)
        breakdown[f"optimizer_{alt_impl}_ms"] = time_opt(
            alt_tx, alt_tx.init(p_alt), p_alt)
        del grads, feats, p_alt

    tokens_per_step = batch * text_len * (1 + 1.875)  # text + audio tokens
    # analytic transformer FLOPs (XLA cost_analysis misses Pallas custom
    # calls): 6·tokens·P_core fwd+bwd, +1 recompute pass under remat
    mel_tokens = t_wav // 1024 + 6  # codes + start/stop/pad formatting
    seq_tokens = batch * (32 + text_len + 2 + mel_tokens)
    p_core = 12 * layers * 1024 * 1024
    # "dots" remat recomputes only elementwise glue — no extra matmul FLOPs
    flops_analytic = 6 * seq_tokens * p_core * (
        4 / 3 if use_remat is True else 1.0)
    result = {
        "metric": "gpt_train_step_ms",
        "value": round(step_ms, 1) if step_ms is not None else None,
        "unit": "ms",
        "vs_baseline": None,  # the reference publishes no training numbers
        "batch": batch,
        "text_len": text_len,
        "layers": layers,
        "dtype": "bf16" if use_bf16 else "f32",
        "attention": attn,
        "optimizer": opt_impl,
        "loss": (round(float(metrics["loss"]), 3)
                 if metrics is not None else None),
        "tokens_per_sec": (round(tokens_per_step / (step_ms / 1000), 0)
                           if step_ms else None),
        "compile_s": round(compile_s, 1) if compile_s is not None else None,
        "device": str(jax.devices()[0]),
    }
    result["remat"] = use_remat
    if step_ms:
        achieved = flops_analytic / (step_ms / 1000)
        result["tflops_per_sec"] = round(achieved / 1e12, 1)
        result["mfu"] = round(achieved / (peak_tflops * 1e12), 3)
    if step_flops:
        # XLA's own count (undercounts Pallas custom calls) for reference
        result["xla_flops_per_step"] = step_flops
    if breakdown is not None:
        result["breakdown"] = breakdown
    print(json.dumps(result))


if __name__ == "__main__":
    main()
