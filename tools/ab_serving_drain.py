"""Interleaved A/B of the StreamServer drain: fused decode attention on/off.

VERDICT r4 item 2: the driver-captured serving drain regressed ~6x in round 4
(pool_per_stream_rtf 0.5086 -> 2.979 at slots=16/streams=32) in the same round
the Pallas fused decode-attention kernel was enabled unconditionally in
``build_pipeline``. Sequential measurements on this remote tunnel drift by
integer factors (proven for int8 in tools/ab_int8_batch.py), so this tool
interleaves the two arms inside ONE process: any tunnel-wide slowdown hits
both arms equally and the ratio stays meaningful.

Arms: identical flagship random-weight pipelines, differing only in
``GPTConfig.fused_decode_attention`` (env read at build time). Per rep, each
arm runs (a) a timed slots=16/streams=32 drain (the exact bench.py protocol)
and (b) a 20-tick full-occupancy pool tick loop with a hard sync per tick —
(b) localizes a drain regression to the tick program vs admission overhead.

Usage:  python tools/ab_serving_drain.py [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(fused: bool):
    os.environ["GENVC_FUSED_DECODE"] = "1" if fused else "0"
    from bench import build_random_pipeline

    import jax.numpy as jnp

    pipe = build_random_pipeline(jnp.bfloat16)
    pipe.first_chunk_tokens = 8
    return pipe


def timed_drain(pipe, src, ref, slots, streams):
    from genvc_tpu.serving.server import StreamServer

    server = StreamServer(pipe, slots=slots)
    t0 = time.perf_counter()
    sids = [server.submit(src, ref) for _ in range(streams)]
    server.drain()
    wall = time.perf_counter() - t0
    audio = streams * src.shape[-1] / pipe.content_sample_rate
    stats = [server.result(s)[1] for s in sids]
    svc = float(np.median([x["rtf_service"] for x in stats]))
    return wall / audio, svc, wall


def tick_rate(pipe, src, ref, slots, n_ticks=20):
    """ms per pool tick at full occupancy, hard-synced per tick."""
    import jax

    from genvc_tpu.serving.server import StreamServer

    server = StreamServer(pipe, slots=slots, depth=1)
    for _ in range(slots):
        server.submit(src, ref)
    server._admit()
    server.step()  # warm
    t0 = time.perf_counter()
    done = 0
    while done < n_ticks and server._slot_map:
        server._dispatch_tick()
        (res, _) = server._inflight.popleft()
        jax.block_until_ready(res)
        done += 1
    dt = time.perf_counter() - t0
    return 1000.0 * dt / max(done, 1)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    slots = int(os.environ.get("BENCH_SERVE_SLOTS", "16"))
    streams = int(os.environ.get("BENCH_SERVE_STREAMS", "32"))

    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/genvc_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import load_bench_audio
    from genvc_tpu.serving.server import StreamServer

    print("building arms...", flush=True)
    pipe_x = build(False)   # XLA attention
    pipe_f = build(True)    # fused Pallas kernel
    src, ref = load_bench_audio(pipe_x)

    for name, pipe in (("xla", pipe_x), ("fused", pipe_f)):
        t0 = time.perf_counter()
        s = StreamServer(pipe, slots=slots)
        s.submit(src, ref)
        s.drain()
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    rows = []
    for rep in range(reps):
        for name, pipe in (("xla", pipe_x), ("fused", pipe_f)):
            agg, svc, wall = timed_drain(pipe, src, ref, slots, streams)
            tick_ms = tick_rate(pipe, src, ref, slots)
            row = {"rep": rep, "arm": name,
                   "aggregate_rtf": round(agg, 4),
                   "pool_per_stream_rtf": round(agg * slots, 4),
                   "rtf_service_p50": round(svc, 4),
                   "drain_wall_s": round(wall, 2),
                   "tick_ms_full_pool": round(tick_ms, 2)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    for name in ("xla", "fused"):
        arm = [r for r in rows if r["arm"] == name]
        print(json.dumps({
            "arm": name,
            "median_pool_per_stream_rtf": round(float(np.median(
                [r["pool_per_stream_rtf"] for r in arm])), 4),
            "median_tick_ms": round(float(np.median(
                [r["tick_ms_full_pool"] for r in arm])), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
