"""Interleaved A/B of StreamServer admission batching (adm_batch 1 vs 4).

The latency-protocol (fast-first) serving capacity is bounded by admission
device time: each admitted stream pays a B=1-starved ContentVec + GPT
prefill + first-window mini-tick (~69 ms blocked at flagship geometry, of
which ~25 ms is tunnel RTT). Wave admission batches queued streams into one
dispatch (measured prefill cost: B=1 68.8 / B=2 74.1 / B=4 91.4 ms — 3x
per-stream amortization at B=4). This tool quantifies the end-to-end effect
on (a) the saturated fast-first drain and (b) an open-loop Poisson point at
a fixed arrival rate, with both arms alternating inside one process so
tunnel drift cancels (same technique as tools/ab_int8_batch.py).

Usage: python tools/ab_adm_batch.py [reps] [lambda]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_drain(pipe, src, ref, slots, streams, adm_batch):
    from genvc_tpu.serving.server import StreamServer

    server = StreamServer(pipe, slots=slots, adm_batch=adm_batch)
    t0 = time.perf_counter()
    sids = [server.submit(src, ref) for _ in range(streams)]
    server.drain()
    wall = time.perf_counter() - t0
    return streams / wall  # fast-first drain capacity, streams/s


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    lam = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         "/tmp/genvc_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from bench import build_random_pipeline, load_bench_audio
    from bench_serving import poisson_load
    from genvc_tpu.serving.server import StreamServer

    pipe = build_random_pipeline(jnp.bfloat16)
    src, ref = load_bench_audio(pipe)
    slots, streams = 16, 32

    warm = StreamServer(pipe, slots=slots)
    warm.warmup_admission()
    warm.submit(src, ref)
    warm.drain()

    out = {"arms": {}, "slots": slots, "streams": streams, "lambda": lam}
    for arm in ("adm1", "adm4"):
        out["arms"][arm] = {"drain_cap": [], "ttfa_p50": [], "ttfa_p95": [],
                            "throughput": []}
    for rep in range(reps):
        for arm, ab in (("adm1", 1), ("adm4", 4)):
            cap = timed_drain(pipe, src, ref, slots, streams, ab)
            row = poisson_load(pipe, src, ref, slots, lam, 32,
                               seed=100 + rep, adm_batch=ab)
            a = out["arms"][arm]
            a["drain_cap"].append(round(cap, 3))
            a["ttfa_p50"].append(row["ttfa_ms_p50"])
            a["ttfa_p95"].append(row["ttfa_ms_p95"])
            a["throughput"].append(row["throughput_streams_per_s"])
            print(f"rep {rep} {arm}: drain {cap:.2f}/s  "
                  f"ttfa p50/p95 {row['ttfa_ms_p50']}/{row['ttfa_ms_p95']} "
                  f"ms  thr {row['throughput_streams_per_s']}/s  "
                  f"sustained {row['sustained']}", flush=True)
    for arm, a in out["arms"].items():
        a["drain_cap_median"] = float(np.median(a["drain_cap"]))
        a["ttfa_p50_median"] = float(np.median(a["ttfa_p50"]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
