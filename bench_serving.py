"""Benchmark: continuous-batching serving throughput on one TPU chip.

Protocol: submit ``BENCH_STREAMS`` (default 16) copies of the 6 s sample
utterance into a ``BENCH_SLOTS``-slot (default 8) StreamServer at t=0 and
drain. Streams beyond the slot count queue and are admitted as slots retire,
so the run exercises steady-state pool occupancy AND dynamic admission (the
lockstep ``synthesize_streaming_batch`` API cannot represent this load).

Reported (one JSON line):
* aggregate_rtf      — wall / total source audio across all streams
* streams_realtime   — concurrent streams the pool sustains with every
                       stream real-time at the measured pool rate
* admission_latency  — submit -> first audio on a warm idle server (cond
                       latents + segment prefill + pool ticks; the SLO
                       number, measured separately from the load test)
* per-stream rtf p50/p95 over ALL streams (includes queue wait for the
  second wave — the serving-level number)

Uses the same flagship random-weight pipeline as bench.py (identical compute
to a trained checkpoint; generation capped at the trained audio/content
ratio, which also right-sizes the KV cache).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def poisson_load(pipe, src, ref, slots: int, lam: float, n_arrivals: int,
                 seed: int = 0, max_queue: int | None = None,
                 adm_batch: int = 4):
    """Drive a StreamServer with Poisson arrivals at rate ``lam`` streams/s.

    The load generator interleaves submissions with ``server.step()`` ticks:
    between arrivals the pool keeps ticking (decoding admitted streams); when
    the pool is idle and the next arrival is in the future, it sleeps to the
    arrival time — i.e. open-loop arrivals, closed-loop service, the queueing
    regime a capacity planner actually provisions for
    (reference latency contract: inference/inference_utils.py:148-216).

    Returns a stats dict: per-stream p50/p95 time-to-first-audio
    (``latency_s``: submit -> first emitted chunk, INCLUDING queue wait),
    RTF including queue wait (``rtf``) and excluding it (``rtf_service``),
    plus offered load vs measured throughput.
    """
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(seed)
    inter = rng.exponential(1.0 / lam, size=n_arrivals)
    server = StreamServer(pipe, slots=slots, adm_batch=adm_batch,
                          **({"max_queue": max_queue} if max_queue else {}))

    t0 = time.perf_counter()
    arrival_times = t0 + np.cumsum(inter)
    sids = []
    next_i = 0
    while next_i < n_arrivals or not all(server.finished(s) for s in sids):
        now = time.perf_counter()
        if next_i < n_arrivals and now >= arrival_times[next_i]:
            # backdate to the SCHEDULED arrival: when a long tick delays this
            # submit, the stream's TTFA/queue-wait still count the wait from
            # the arrival instant — no coordinated omission under overload
            # (exactly the sweep points that decide the 500 ms SLO verdict)
            sids.append(server.submit(src, ref,
                                      arrival_t=arrival_times[next_i]))
            next_i += 1
            continue
        progressed = server.step()
        if not progressed:
            if next_i < n_arrivals:  # idle pool: sleep to the next arrival
                time.sleep(max(0.0, arrival_times[next_i] -
                               time.perf_counter()))
            else:
                break
    wall = time.perf_counter() - t0

    stats = [server.result(sid)[1] for sid in sids]
    ttfa = [s["latency_s"] for s in stats if s["latency_s"] is not None]
    rtf_inc = [s["rtf"] for s in stats if s["rtf"] is not None]
    rtf_exc = [s["rtf_service"] for s in stats if s["rtf_service"] is not None]
    qw = [s["queue_wait_s"] for s in stats if s["queue_wait_s"] is not None]
    # sustainability: in a stable queue, late arrivals wait no longer than
    # early ones; under overload TTFA grows ~linearly with arrival index, so
    # a finite run can post a deceptively low p95 (the backlog just hasn't
    # had time to build). Compare first-half vs second-half median TTFA (in
    # arrival order) and call the rate sustained only when the growth stays
    # under half the 500 ms SLO — rows failing this must not decide
    # max_sustainable_lambda however good their p95 looks.
    h = len(ttfa) // 2
    g_ms = (1000 * (float(np.median(ttfa[h:])) - float(np.median(ttfa[:h])))
            if h >= 2 else 0.0)
    return {
        "lambda": round(lam, 3),
        "arrivals": n_arrivals,
        "completed": len(stats),
        "wall_s": round(wall, 2),
        "throughput_streams_per_s": round(len(stats) / wall, 3),
        "ttfa_ms_p50": round(1000 * float(np.percentile(ttfa, 50)), 1),
        "ttfa_ms_p95": round(1000 * float(np.percentile(ttfa, 95)), 1),
        "queue_wait_ms_p95": round(1000 * float(np.percentile(qw, 95)), 1),
        "rtf_incl_queue_p50": round(float(np.percentile(rtf_inc, 50)), 4),
        "rtf_incl_queue_p95": round(float(np.percentile(rtf_inc, 95)), 4),
        "rtf_service_p50": round(float(np.percentile(rtf_exc, 50)), 4),
        "rtf_service_p95": round(float(np.percentile(rtf_exc, 95)), 4),
        "ttfa_growth_ms": round(g_ms, 1),
        "sustained": bool(g_ms < 250.0),
    }


def poisson_sweep(pipe, src, ref, slots: int, capacity: float,
                  factors=(0.5, 0.75, 1.0, 1.5, 2.0), n_arrivals: int = 32,
                  ttfa_slo_ms: float = 500.0, refine: int = 2):
    """Sweep arrival rate over ``factors`` x estimated capacity. Returns
    (rows, max_sustainable_lambda): the largest swept rate whose p95
    time-to-first-audio stays under ``ttfa_slo_ms`` AND whose TTFA is not
    growing with arrival order (``sustained`` — overload builds backlog
    linearly, so a short run's p95 alone would overstate capacity).

    After the fixed factors, up to ``refine`` extra probes bisect between
    the highest passing and lowest failing rate (or halve below the lowest
    swept rate when everything failed), so the reported max sustainable
    lambda is a measured bracket rather than a coarse grid point.

    ``capacity`` must be estimated under the SAME protocol the sweep runs
    (fast-first admission): the throughput-protocol drain overstates it —
    fast-first pays ~one single-stream first-window of device time per
    admission that pure pool cadence never dispatches."""
    rows = []

    def passes(row):
        return row["ttfa_ms_p95"] <= ttfa_slo_ms and row["sustained"]

    def probe(f):
        lam = capacity * f
        row = poisson_load(pipe, src, ref, slots, lam, n_arrivals,
                           seed=int(f * 100))
        row["capacity_factor"] = round(f, 4)
        rows.append(row)

    for f in factors:
        probe(f)
    for _ in range(max(0, refine)):
        ok_f = [r["capacity_factor"] for r in rows if passes(r)]
        bad_f = [r["capacity_factor"] for r in rows if not passes(r)]
        if ok_f:
            above = [f for f in bad_f if f > max(ok_f)]
            if not above:
                break  # even the top of the grid passed; nothing to bracket
            lo, hi = max(ok_f), min(above)
            if hi - lo < 0.1:
                break
            probe((lo + hi) / 2)
        else:
            probe(min(r["capacity_factor"] for r in rows) / 2)
    rows.sort(key=lambda r: r["capacity_factor"])
    ok = [capacity * r["capacity_factor"] for r in rows if passes(r)]
    max_ok = max(ok) if ok else None
    return rows, (round(max_ok, 3) if max_ok is not None else None)


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/genvc_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from bench import build_random_pipeline, load_bench_audio
    from genvc_tpu.serving.server import StreamServer

    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" \
        else jnp.float32
    pipe = build_random_pipeline(dtype)
    # servers default to the pipeline's first_chunk_tokens (4): admission-time
    # fast-first — the stream's first window is emitted by a single-row
    # mini-tick at admission, before the row enters the shared pool
    # (StreamServer first_window; set BENCH_FIRST_WINDOW=8 for the pure
    # 8-cadence protocol of rounds <= 4)
    pipe.first_chunk_tokens = int(os.environ.get("BENCH_FIRST_WINDOW", "4"))
    src, ref = load_bench_audio(pipe)

    slots = int(os.environ.get("BENCH_SLOTS", "8"))
    n_streams = int(os.environ.get("BENCH_STREAMS", "16"))

    # compile warmup: admission-wave programs + one full drain of a single
    # stream through the pool
    server = StreamServer(pipe, slots=slots)
    server.warmup_admission()
    server.submit(src, ref)
    server.drain()

    # --- admission latency: a stream submitted to a warm, idle server
    # (cond latents + segment prefill + pool ticks to first audio; the
    # serving SLO number — queue wait excluded by construction)
    lat_runs = []
    for _ in range(5):
        server = StreamServer(pipe, slots=slots)
        sid = server.submit(src, ref)
        server.drain()
        lat_runs.append(server.result(sid)[1]["latency_s"])

    # --- throughput: n_streams submitted at t=0 into a fresh server; wall
    # includes the per-stream cond/prefill dispatches and queue waits for
    # the streams beyond the slot count (real serving cost)
    server = StreamServer(pipe, slots=slots)
    t0 = time.perf_counter()
    sids = [server.submit(src, ref) for _ in range(n_streams)]
    server.drain()
    wall = time.perf_counter() - t0

    audio_s = n_streams * src.shape[-1] / pipe.content_sample_rate
    stats = [server.result(sid)[1] for sid in sids]
    rtfs = sorted(s["rtf"] for s in stats)
    agg = wall / audio_s
    # pool-sustained per-stream RTF: every slot processes audio at
    # (aggregate * slots) when the pool is full
    per_stream_pool = agg * slots

    result = {
        "metric": "serving_aggregate_rtf",
        "value": round(agg, 4),
        "unit": "ratio",
        "vs_baseline": round(0.28 / agg, 2),  # vs single-stream H100 RTF
        "slots": slots,
        "streams": n_streams,
        "wall_s": round(wall, 2),
        "audio_s": round(audio_s, 1),
        "per_stream_pool_rtf": round(per_stream_pool, 4),
        # concurrent streams sustainable with each stream real-time at the
        # measured pool rate (slots when the full pool is itself real-time)
        "streams_realtime": (slots if per_stream_pool < 1.0
                             else int(slots / per_stream_pool)),
        "admission_latency_ms_median": round(
            1000 * float(np.median(lat_runs)), 1),
        "admission_latency_ms_max": round(1000 * float(max(lat_runs)), 1),
        "stream_rtf_p50": round(float(np.percentile(rtfs, 50)), 4),
        "stream_rtf_p95": round(float(np.percentile(rtfs, 95)), 4),
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
