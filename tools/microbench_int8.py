"""Microbenchmark: B=16 AR decode step, bf16 vs int8-quantized weights.

Times the jitted 25-step decode_chunk program in isolation (no DSP, no
vocoder) and inspects the compiled HLO of a single quantized linear to check
whether XLA keeps the s8 x s8 -> s32 contraction on the MXU int8 path or
materializes a dequantize (VERDICT r3 item 1 diagnosis).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.decode import engine
from genvc_tpu.models import gpt as gpt_model
from genvc_tpu.ops import quant


def time_decode(params, cfg, batch, steps=25, iters=10, cache_dtype=jnp.bfloat16):
    rng = jax.random.key(0)
    state = engine.init_state(cfg, prefix_width=400, batch=batch,
                              heads=cfg.heads, head_dim=cfg.model_dim // cfg.heads,
                              rng=rng, cache_dtype=cache_dtype, gen_tokens=256)
    sampler = engine.SamplerConfig(do_sample=False)
    def run(p, s):
        st, toks, lats, fin = engine.decode_chunk(p, cfg, s, sampler, steps)
        return jnp.sum(toks)  # tiny output: fetch forces full execution

    fn = jax.jit(run)
    np.asarray(fn(params, state))  # compile + settle
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(params, state))  # host fetch = hard sync
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) / steps * 1000
    return med  # ms per AR step


def main():
    cfg = gpt_model.GPTConfig(layers=30, model_dim=1024, heads=4)
    params = gpt_model.init_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)
    qparams = quant.quantize_gpt_params(params)

    for b in (1, 8, 16):
        t_bf = time_decode(params, cfg, b)
        t_q = time_decode(qparams, cfg, b)
        print(f"B={b:3d}  bf16 {t_bf:7.3f} ms/step   int8 {t_q:7.3f} ms/step   "
              f"speedup {t_bf / t_q:5.2f}x")

    if os.environ.get("DUMP_HLO", "0") == "1":
        x = jnp.zeros((16, 1024), jnp.bfloat16)
        p = quant.quantize_linear({"w": np.random.randn(1024, 4096).astype(np.float32)})
        txt = jax.jit(quant.linear_q8).lower(p, x).compile().as_text()
        n_conv = txt.count("convert")
        import re
        dots = [l.strip() for l in txt.splitlines() if re.search(r"\bdot\(|fusion", l) and "s8" in l or " dot(" in l.strip()[:60]]
        print(f"\ncompiled linear_q8 HLO: {len(txt.splitlines())} lines, {n_conv} converts")
        for l in txt.splitlines():
            ls = l.strip()
            if ls.startswith("%") or " = " in ls:
                if "dot" in ls or ("convert" in ls and "s8" in ls):
                    print("  ", ls[:160])


if __name__ == "__main__":
    main()
