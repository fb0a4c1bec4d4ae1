"""Benchmark: streaming voice-conversion RTF / first-chunk latency on TPU.

Protocol mirrors the reference's published measurement (README.md:70-78,
inference/inference_utils.py:148-216): streaming mode, latency = time from
start to first emitted audio chunk, RTF = processing time / input duration.
Baseline to beat: RTF 0.28 / 95.2 ms first-chunk latency (H100).

No public GenVC checkpoint is bundled in this environment, so the benchmark
runs the flagship architecture (30L/1024d/4H GPT + HiFi-GAN + ContentVec +
dVAEs) with deterministic random weights — identical compute and memory
traffic to a trained model — and caps generation at the trained model's
audio-per-content ratio (23.44 Hz audio codes vs 12.5 Hz content codes).

Prints ONE JSON line:
  {"metric": "streaming_rtf", "value": ..., "unit": "ratio",
   "vs_baseline": <baseline 0.28 / ours — >1 means faster than H100>, ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_random_pipeline(compute_dtype, seed=0, quantize=None,
                          kv_cache_dtype=None):
    import jax
    import jax.numpy as jnp

    from genvc_tpu.config import GenVCConfig
    from genvc_tpu.inference.pipeline import build_pipeline
    from genvc_tpu.models import contentvec, dvae, gpt as gpt_model, hifigan

    cfg = GenVCConfig()
    ma = cfg.model_args
    ma.gpt_layers, ma.gpt_n_model_channels, ma.gpt_n_heads = 30, 1024, 4
    ma.gpt_number_text_tokens, ma.gpt_start_text_token, ma.gpt_stop_text_token = 258, 256, 257
    cfg.acoustic_dvae_config.num_channels = 80
    cfg.acoustic_dvae_config.num_tokens = 1024
    cfg.content_dvae_config.num_channels = 256
    cfg.content_dvae_config.num_tokens = 256
    for c in (cfg.acoustic_dvae_config, cfg.content_dvae_config):
        c.codebook_dim, c.hidden_dim, c.num_resnet_blocks, c.num_layers = 512, 512, 3, 2
    cfg.top_k = 1  # greedy — recommended for streaming (reference README.md:52)

    gcfg = gpt_model.GPTConfig(layers=30, model_dim=1024, heads=4)
    key = jax.random.key(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    tree = {
        "gpt": gpt_model.init_params(k1, gcfg),
        "hifigan": hifigan.init_generator(k2, cfg.vocoder_config),
        "acoustic_dvae": dvae.init_params(k3, dvae.DVAEConfig(
            channels=80, num_tokens=1024)),
        "content_dvae": dvae.init_params(k4, dvae.DVAEConfig(
            channels=256, num_tokens=256)),
        "contentvec": contentvec.init_params(k5, n_layers=12),
        "config": cfg.to_dict(),
    }
    pipe = build_pipeline(tree, cfg, compute_dtype=compute_dtype,
                          quantize=quantize, kv_cache_dtype=kv_cache_dtype)
    pipe.gen_cap_tokens_per_code = 1.875
    return pipe


def load_bench_audio(pipe):
    from genvc_tpu.dsp.audio_io import load_audio

    here = os.path.dirname(os.path.abspath(__file__))
    src_path = os.path.join(here, "samples", "EF4_ENG_0112_1.wav")
    ref_path = os.path.join(here, "samples", "EM1_ENG_0037_1.wav")
    src = load_audio(src_path, pipe.content_sample_rate) if os.path.exists(src_path) else None
    ref = load_audio(ref_path, pipe.sample_rate) if os.path.exists(ref_path) else None
    if src is None:
        rng = np.random.default_rng(0)
        src = (rng.standard_normal((1, pipe.content_sample_rate * 6)) * 0.1
               ).astype(np.float32)
    if ref is None:
        rng = np.random.default_rng(1)
        ref = (rng.standard_normal((1, pipe.sample_rate * 4)) * 0.1
               ).astype(np.float32)
    return src, ref


def build_headline(result):
    """Compact headline dict from the full bench ``result`` record.

    Printed as the FINAL stdout line: the driver captures only the tail of
    stdout and parses the last line, so this must stay well under its
    capture window (the full record goes to BENCH_DETAIL.json and the
    earlier DETAIL line)."""
    serving = result.get("serving")
    serving_head = None
    if serving is not None:
        serving_head = {
            "pool_per_stream_rtf": serving.get("pool_per_stream_rtf"),
            "realtime_streams": serving.get("realtime_streams"),
            "max_sustainable_lambda_ttfa500ms": serving.get(
                "max_sustainable_lambda_ttfa500ms"),
        }
        rows = serving.get("poisson") or []
        at_cap = [r for r in rows if r.get("capacity_factor") == 1.0]
        if at_cap:
            # 1.0x measured capacity = a critically-loaded queue by
            # construction (rho=1), so this p95 diverges with run length;
            # the SLO-relevant number is the one at max sustainable lambda
            serving_head["ttfa_ms_p95_at_capacity"] = at_cap[0]["ttfa_ms_p95"]
        max_lam = serving.get("max_sustainable_lambda_ttfa500ms")
        if max_lam is not None:
            at_max = [r for r in rows if abs(r["lambda"] - max_lam) < 1e-6]
            if at_max:
                serving_head["ttfa_ms_p95_at_max_lambda"] = \
                    at_max[0]["ttfa_ms_p95"]
    int8_section = result.get("int8")
    int8_head = None
    if int8_section is not None:
        int8_head = {"rtf_median": int8_section.get("rtf_median")}
        combo = int8_section.get("int8_fp8_batch_scaling") or {}
        if "16" in combo:
            int8_head["int8_fp8_b16_rtf_per_stream"] = \
                combo["16"]["rtf_per_stream"]
        srv_q = int8_section.get("int8_fp8_serving") or {}
        if srv_q:
            int8_head["int8_fp8_max_lambda_ttfa500ms"] = srv_q.get(
                "max_sustainable_lambda_ttfa500ms")
    b16 = (result.get("batch_scaling") or {}).get("16")
    return {
        "metric": "streaming_rtf",
        "value": result["value"],
        "unit": "ratio",
        "vs_baseline": result["vs_baseline"],
        "latency_ms_median": result["latency_ms_median"],
        "latency_ms_p95": result["latency_ms_p95"],
        "latency_ms_max": result["latency_ms_max"],
        "rtf_p95": result["rtf_p95"],
        "ar_tokens_per_sec": result["ar_tokens_per_sec"],
        "b16_rtf_per_stream": b16["rtf_per_stream"] if b16 else None,
        "max_realtime_streams": result.get("max_realtime_streams"),
        "serving": serving_head,
        "int8": int8_head,
        "tunnel_rtt_ms": result.get("tunnel_rtt_ms"),
        "warmup_s": result["warmup_s"],
        "dtype": result["dtype"],
        "device": result["device"],
        "detail": "BENCH_DETAIL.json",
    }


def main():
    import jax

    # persistent compilation cache: repeated bench runs skip the (minutes-long)
    # first-compile of the 30-layer decode/prefill graphs
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/genvc_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" \
        else jnp.float32
    pipe = build_random_pipeline(dtype)

    t0 = time.perf_counter()
    pipe.warmup(streaming=True)
    warmup_s = time.perf_counter() - t0

    src, ref = load_bench_audio(pipe)

    # Tunnel RTT distribution, sampled around the latency runs: each
    # first-chunk latency includes exactly one dispatch+fetch round trip, so
    # a latency max exceeding the median by ~the RTT spread is attributable
    # to the tunnel, not the pipeline (VERDICT r3/r4 latency-tail item; on
    # directly-attached TPU this term vanishes).
    _one = jax.jit(lambda x: x + 1.0)
    _z = jnp.float32(0)
    float(_one(_z))
    rtt_samples = []
    for _ in range(40):
        t0 = time.perf_counter()
        float(_one(_z))
        rtt_samples.append((time.perf_counter() - t0) * 1000)
    rtt_stats = {
        "median": round(float(np.median(rtt_samples)), 1),
        "p95": round(float(np.percentile(rtt_samples, 95)), 1),
        "max": round(float(np.max(rtt_samples)), 1),
    }

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    n_runs = int(os.environ.get("BENCH_RUNS", "15"))
    latencies, rtfs, tok_rates, timings = [], [], [], []
    for i in range(n_runs):
        t0 = time.perf_counter()
        wav, latency, rtf = pipe.synthesize_streaming(src, ref, verbose=False)
        elapsed = time.perf_counter() - t0
        n_tokens = (len(wav) + 7 * 1024) // 1024  # approx AR steps incl. held-back tail
        latencies.append(latency)
        rtfs.append(rtf)
        tok_rates.append(n_tokens / elapsed)
        timings.append(dict(pipe.last_timing))

    if profile_dir:
        jax.profiler.stop_trace()

    # batched streaming serving scaling sweep: B concurrent streams on one
    # chip (aggregate RTF = elapsed / total input audio; per-stream wall-clock
    # RTF = aggregate * B). Decode is HBM-bound gemv work, so per-stream cost
    # falls with B — streams/chip is the TPU throughput headline.
    sweep = [int(b) for b in os.environ.get(
        "BENCH_BATCH_SWEEP", "2,4,8,16").split(",") if b]
    sweep_runs = int(os.environ.get("BENCH_BATCH_RUNS", "3"))
    # B=1 seeds the table from the headline single-stream runs above
    batch_scaling = {"1": {"rtf_aggregate": round(float(np.median(rtfs)), 4),
                           "rtf_per_stream": round(float(np.median(rtfs)), 4)}}
    rtf_batch = None
    for b in sweep:
        try:
            srcs = [src] * b
            refs = [ref] * b
            pipe.synthesize_streaming_batch(srcs, refs, verbose=False)  # compile
            runs = []
            for _ in range(sweep_runs):
                _, _, agg = pipe.synthesize_streaming_batch(srcs, refs,
                                                            verbose=False)
                runs.append(agg)
            agg_med = float(np.median(runs))
            batch_scaling[str(b)] = {
                "rtf_aggregate": round(agg_med, 4),
                "rtf_per_stream": round(agg_med * b, 4),
            }
            if b == 4:
                rtf_batch = agg_med
        except Exception as e:  # never let the serving extra kill the headline
            print(f"batched-streaming bench (B={b}) skipped: {e}",
                  file=sys.stderr)
    # max concurrent streams with every stream still real-time
    rt = [int(b) for b, v in batch_scaling.items()
          if v["rtf_per_stream"] < 1.0]
    max_rt_streams = max(rt) if rt else None

    # continuous-batching serving (StreamServer): dynamic admission into a
    # fixed decode slot pool — barrier-free steady ticks sustain more
    # real-time streams than the lockstep rounds above (bench_serving.py has
    # the full load-test protocol)
    serving = None
    try:
        from genvc_tpu.serving.server import StreamServer

        s_slots = int(os.environ.get("BENCH_SERVE_SLOTS", "24"))
        s_streams = int(os.environ.get("BENCH_SERVE_STREAMS", "48"))
        # saturated drain = THROUGHPUT protocol: pure 8-token pool cadence
        # (first_window=8, comparable with rounds <= 4). The Poisson sweep
        # below keeps fast-first admission (first_window=4 default) — that
        # is the LATENCY protocol, where per-admission dispatches buy TTFA.
        server = StreamServer(pipe, slots=s_slots, first_window=8)
        server.warmup_admission()  # batched admission-wave programs
        server.submit(src, ref)
        server.drain()  # compile the tick/tail programs
        server = StreamServer(pipe, slots=s_slots, first_window=8)
        t0 = time.perf_counter()
        sids = [server.submit(src, ref) for _ in range(s_streams)]
        server.drain()
        s_wall = time.perf_counter() - t0
        s_audio = s_streams * src.shape[-1] / pipe.content_sample_rate
        s_agg = s_wall / s_audio
        pool_rtf = s_agg * s_slots
        serving = {
            "slots": s_slots,
            "streams": s_streams,
            "aggregate_rtf": round(s_agg, 4),
            "pool_per_stream_rtf": round(pool_rtf, 4),
            "realtime_streams": (s_slots if pool_rtf < 1.0
                                 else int(s_slots / pool_rtf)),
        }
        # Poisson-arrival load test (VERDICT r3 item 3): open-loop arrivals
        # at factors of the measured saturated capacity; per-stream p50/p95
        # time-to-first-audio and RTF excluding vs including queue wait, plus
        # the max swept rate with p95 first-audio under the 500 ms SLO.
        if os.environ.get("BENCH_POISSON", "1") != "0":
            from bench_serving import poisson_sweep

            # warm the LATENCY-protocol programs (fast-first admission
            # mini-tick + its vocode-tail geometry) before starting the
            # Poisson clock: the drain warm-ups above use first_window=8, so
            # without this the first admission inside the sweep pays the
            # row_prefill_first compile and every queued stream behind it
            # inherits seconds of fake queue wait (r5 driver record: TTFA
            # p50 8.6 s at 0.75x on the int8+fp8 sweep)
            warm = StreamServer(pipe, slots=s_slots)
            warm.warmup_admission()
            warm.submit(src, ref)
            warm.drain()
            # capacity for the sweep = a FAST-FIRST saturated drain: the
            # latency protocol pays ~one single-stream first window of
            # device time per admission, so the first_window=8 drain above
            # (throughput protocol) overstates what the sweep can sustain
            # by ~2x and every factor would silently mean "overload"
            warm = StreamServer(pipe, slots=s_slots)
            t0 = time.perf_counter()
            for _ in range(s_streams):
                warm.submit(src, ref)
            warm.drain()
            capacity = s_streams / (time.perf_counter() - t0)
            rows, max_lam = poisson_sweep(
                pipe, src, ref, s_slots, capacity,
                factors=(0.75, 1.0, 1.5, 2.0),
                n_arrivals=int(os.environ.get("BENCH_POISSON_N", "48")))
            serving["drain_capacity_streams_per_s"] = round(
                s_streams / s_wall, 3)
            serving["capacity_streams_per_s"] = round(capacity, 3)
            serving["poisson"] = rows
            serving["max_sustainable_lambda_ttfa500ms"] = max_lam
    except Exception as e:  # never let the serving extra kill the headline
        print(f"serving bench skipped: {e}", file=sys.stderr)

    # int8 decode-weight quantization (ops.quant): halves the per-AR-step HBM
    # weight stream. Reported alongside the full-precision headline — the
    # headline stays bf16 because quantization moves logits (~1e-2 relative)
    # and no real checkpoint exists here to validate perceptual quality.
    int8_section = None
    if os.environ.get("BENCH_INT8", "1") != "0":
        try:
            pipe_q = build_random_pipeline(dtype, quantize="int8")
            pipe_q.warmup(streaming=True)
            q_lat, q_rtfs, q_toks = [], [], []
            for _ in range(max(3, n_runs // 3)):
                t0 = time.perf_counter()
                wav, latency, rtf = pipe_q.synthesize_streaming(
                    src, ref, verbose=False)
                elapsed = time.perf_counter() - t0
                q_lat.append(latency)
                q_rtfs.append(rtf)
                q_toks.append(((len(wav) + 7 * 1024) // 1024) / elapsed)
            q_batch = {}
            for b in (8, 16):
                try:
                    srcs, refs = [src] * b, [ref] * b
                    pipe_q.synthesize_streaming_batch(srcs, refs,
                                                      verbose=False)
                    # 3 runs: a 2-run median is a mean, so one tunnel hiccup
                    # poisons the recorded number
                    runs = [pipe_q.synthesize_streaming_batch(
                        srcs, refs, verbose=False)[2] for _ in range(3)]
                    agg = float(np.median(runs))
                    q_batch[str(b)] = {"rtf_aggregate": round(agg, 4),
                                       "rtf_per_stream": round(agg * b, 4)}
                except Exception as e:
                    print(f"int8 batched bench (B={b}) skipped: {e}",
                          file=sys.stderr)
            int8_section = {
                "rtf_median": round(float(np.median(q_rtfs)), 4),
                "latency_ms_median": round(
                    float(np.median(q_lat)) * 1000, 1),
                "ar_tokens_per_sec": round(float(np.mean(q_toks)), 1),
                "batch_scaling": q_batch or None,
            }
            del pipe_q
            # combined int8 weights + fp8 KV cache (the recommended serving
            # config: decode step 4.11 vs 5.14 ms bf16 at B=16 with the
            # fused cache-read kernel) — batched aggregate RTF at B=8/16
            combo = {}
            pipe_c = build_random_pipeline(dtype, quantize="int8",
                                           kv_cache_dtype="fp8")
            pipe_c.warmup(streaming=True)
            for b in (8, 16):
                try:
                    srcs, refs = [src] * b, [ref] * b
                    pipe_c.synthesize_streaming_batch(srcs, refs,
                                                      verbose=False)
                    runs = [pipe_c.synthesize_streaming_batch(
                        srcs, refs, verbose=False)[2] for _ in range(3)]
                    agg = float(np.median(runs))
                    combo[str(b)] = {"rtf_aggregate": round(agg, 4),
                                     "rtf_per_stream": round(agg * b, 4)}
                except Exception as e:
                    print(f"int8+fp8 batched bench (B={b}) skipped: {e}",
                          file=sys.stderr)
            int8_section["int8_fp8_batch_scaling"] = combo or None
            # Poisson sweep on the RECOMMENDED serving config (int8 weights
            # + fp8 KV cache), VERDICT r4 item 7: its own saturated-drain
            # capacity estimate, then open-loop arrivals at 0.75/1.0/1.5x
            if os.environ.get("BENCH_POISSON", "1") != "0":
                try:
                    from bench_serving import poisson_sweep
                    from genvc_tpu.serving.server import StreamServer

                    s_slots = int(os.environ.get("BENCH_SERVE_SLOTS", "24"))
                    s_streams = int(os.environ.get("BENCH_SERVE_STREAMS",
                                                   "48"))
                    # throughput-protocol drain (first_window=8, r3/r4
                    # comparable) for the record...
                    server = StreamServer(pipe_c, slots=s_slots,
                                          first_window=8)
                    server.warmup_admission()
                    server.submit(src, ref)
                    server.drain()  # compile
                    server = StreamServer(pipe_c, slots=s_slots,
                                          first_window=8)
                    t0 = time.perf_counter()
                    for _ in range(s_streams):
                        server.submit(src, ref)
                    server.drain()
                    cap_drain_q = s_streams / (time.perf_counter() - t0)
                    # ...then compile the fast-first programs (the int8+fp8
                    # pipe's have never run at this point; compiling them
                    # mid-sweep poisoned the r5 driver record: TTFA p50
                    # 8.6 s at 0.75x) and measure the LATENCY-protocol
                    # capacity the sweep factors are actually relative to
                    warm_q = StreamServer(pipe_c, slots=s_slots)
                    warm_q.warmup_admission()
                    warm_q.submit(src, ref)
                    warm_q.drain()
                    warm_q = StreamServer(pipe_c, slots=s_slots)
                    t0 = time.perf_counter()
                    for _ in range(s_streams):
                        warm_q.submit(src, ref)
                    warm_q.drain()
                    cap_q = s_streams / (time.perf_counter() - t0)
                    rows_q, max_lam_q = poisson_sweep(
                        pipe_c, src, ref, s_slots, cap_q,
                        factors=(0.75, 1.0, 1.5),
                        n_arrivals=int(os.environ.get("BENCH_POISSON_N",
                                                      "48")))
                    int8_section["int8_fp8_serving"] = {
                        "drain_capacity_streams_per_s": round(cap_drain_q, 3),
                        "capacity_streams_per_s": round(cap_q, 3),
                        "poisson": rows_q,
                        "max_sustainable_lambda_ttfa500ms": max_lam_q,
                    }
                except Exception as e:
                    print(f"int8+fp8 poisson bench skipped: {e}",
                          file=sys.stderr)
            del pipe_c
        except Exception as e:  # never let the extra kill the headline
            print(f"int8 bench skipped: {e}", file=sys.stderr)

    # fp8 KV-cache comparison (BENCH_FP8KV=1 to enable; off by default —
    # measured throughput-neutral on this tunnel setup, see ROUND3_NOTES):
    # B=16 lockstep aggregate RTF, fp8 cache vs the bf16 pipeline above
    fp8kv_section = None
    if os.environ.get("BENCH_FP8KV", "0") == "1":
        try:
            pipe_8 = build_random_pipeline(dtype, kv_cache_dtype="fp8")
            pipe_8.warmup(streaming=True)
            srcs, refs = [src] * 16, [ref] * 16
            pipe_8.synthesize_streaming_batch(srcs, refs, verbose=False)
            runs = [pipe_8.synthesize_streaming_batch(srcs, refs,
                                                      verbose=False)[2]
                    for _ in range(3)]
            agg = float(np.median(runs))
            fp8kv_section = {"rtf_aggregate_b16": round(agg, 4),
                             "rtf_per_stream_b16": round(agg * 16, 4)}
            del pipe_8
        except Exception as e:  # never let the extra kill the headline
            print(f"fp8 KV bench skipped: {e}", file=sys.stderr)

    # the dev tunnel occasionally hiccups for hundreds of ms; the median is
    # the robust central tendency (min/max/avg all reported alongside)
    rtf_med = float(np.median(rtfs))
    rtf_avg = float(np.mean(rtfs))
    result = {
        "metric": "streaming_rtf",
        "value": round(rtf_med, 4),
        "unit": "ratio",
        "vs_baseline": round(0.28 / rtf_med, 3),
        "rtf_mean": round(rtf_avg, 4),
        "latency_ms_median": round(float(np.median(latencies)) * 1000, 1),
        "latency_ms_avg": round(float(np.mean(latencies)) * 1000, 1),
        "latency_ms_min": round(float(np.min(latencies)) * 1000, 1),
        "latency_ms_max": round(float(np.max(latencies)) * 1000, 1),
        "latency_ms_p95": round(float(np.percentile(latencies, 95)) * 1000, 1),
        "rtf_p95": round(float(np.percentile(rtfs, 95)), 4),
        "rtf_min": round(float(np.min(rtfs)), 4),
        "rtf_max": round(float(np.max(rtfs)), 4),
        "ar_tokens_per_sec": round(float(np.mean(tok_rates)), 1),
        "rtf_batch_aggregate": (round(rtf_batch, 4)
                                if rtf_batch is not None else None),
        "batch_streams": 4 if rtf_batch is not None else None,
        "batch_scaling": batch_scaling or None,
        "max_realtime_streams": max_rt_streams,
        "serving": serving,
        "int8": int8_section,
        "fp8_kv": fp8kv_section,
        "warmup_s": round(warmup_s, 1),
        "tunnel_rtt_ms": rtt_stats,
        # sub-phase breakdown of the worst-latency run (tail diagnostics):
        # host_prep -> first_dispatch -> first_fetch, all ms since call start
        "worst_run_timing": {k: round(v, 1) for k, v in
                             timings[int(np.argmax(latencies))].items()},
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "device": str(jax.devices()[0]),
        "baseline": {"rtf": 0.28, "latency_ms": 95.2, "hardware": "H100"},
    }
    # Full detail: sidecar file + an EARLY stdout line. The driver captures
    # only the tail of stdout and parses the LAST line — round 4's single
    # giant JSON line outgrew that window and the record parsed as null
    # (VERDICT r4 item 1). The final line is therefore a compact headline
    # bounded well under the capture window; everything else lives in
    # BENCH_DETAIL.json (committed) and the earlier line.
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
            json.dump(result, f, indent=1)
    except Exception as e:
        print(f"detail sidecar write failed: {e}", file=sys.stderr)
    print("DETAIL " + json.dumps(result))

    print(json.dumps(build_headline(result)))


if __name__ == "__main__":
    main()
