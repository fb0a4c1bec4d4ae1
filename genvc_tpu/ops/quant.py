"""int8 weight quantization for the AR decode path.

The GenVC decode loop is HBM-bandwidth-bound: every AR step streams the full
GPT weight set (30L x 1024d flagship = ~750 MB in bf16) through HBM to produce
one token per stream. Weight-only int8 halves that stream — and on TPU the
MXU runs int8 x int8 -> int32 contractions at 2x the bf16 rate — so the decode
step's speed-of-light roughly doubles.

Scheme (standard dynamic-activation W8A8, no calibration data needed):

* **Weights**: symmetric per-output-channel int8. ``scale[o] =
  max|w[:, o]| / 127``; stored alongside the int8 tensor, replacing the
  ``{"w": ...}`` leaf with ``{"w_q": int8, "scale": f32, "b": ...}``.
* **Activations**: symmetric per-token (per row of the GEMM) int8, computed
  on the fly from the running activation — ``sx = max|x| / 127`` along the
  contraction axis. Decode activations sit after LayerNorm, so their dynamic
  range is tame and one scale per token loses little.
* **Contraction**: ``lax.dot_general(x_i8, w_i8,
  preferred_element_type=int32)`` — a native int8 MXU op; the int32
  accumulator is rescaled by ``sx * scale`` in f32.

:func:`genvc_tpu.ops.nn.linear` dispatches on the ``"w_q"`` key, so quantized
param trees flow through the unchanged GPT/engine code (scan-stacked block
leaves quantize to ``(L, in, out)`` int8 + ``(L, out)`` scales; ``lax.scan``
slices both together).

This is an opt-in serving optimization (``build_pipeline(...,
quantize="int8")`` / ``infer.py --quantize int8``): it changes logits at the
~1e-2 relative level, which can flip sampled tokens — bit-parity with the
bf16 path is deliberately NOT a goal. The reference has no analogous mode
(its decode runs full-precision torch, inference/inference_utils.py:136-217);
this exists to push TPU serving throughput past the reference's ceiling.

Measured (round 4, B=16 decode step, 30L/1024d flagship): int8 weights
alone 4.75 vs 5.14 ms bf16; combined with the fp8 KV cache + fused
cache-read kernel (ops.decode_attention) 4.11 ms — 1.25x. At batch the
cache read dominates the weight stream (B=16: ~1.26 GB vs 0.69 GB per
step), so the fp8 cache is the bigger lever and ``quantize="int8",
kv_cache_dtype="fp8"`` is the recommended serving config. (Round 3's
"int8 slower at batch" finding was sequential-measurement tunnel variance:
the interleaved A/B — tools/ab_int8_batch.py — shows int8 >= bf16 at every
batch size.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_linear(p: dict) -> dict:
    """Quantize one linear param dict ``{"w": (..., in, out)[, "b"]}`` to
    ``{"w_q": int8, "scale": (..., out) f32[, "b"]}`` (symmetric
    per-output-channel). Leading axes (e.g. the scan-stacked layer axis) are
    preserved."""
    w = jnp.asarray(p["w"], jnp.float32)
    s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    w_q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    q = {"w_q": w_q, "scale": jnp.squeeze(s, axis=-2)}
    if "b" in p:
        q["b"] = p["b"]
    return q


def linear_q8(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """``x @ w + b`` with int8 weights and dynamically-quantized int8
    activations; int32 accumulation, f32 rescale. Output dtype follows x."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-12) / 127.0
    x_q = jnp.round(xf / sx).astype(jnp.int8)  # |xf/sx| <= 127 by construction
    acc = jax.lax.dot_general(
        x_q, p["w_q"],
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * p["scale"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_gpt_params(gpt_params: dict) -> dict:
    """Quantize the decode-path linears of a GPT param tree: every block's
    attention/MLP projections (scan-stacked: (L, in, out) leaves) and the
    ``mel_head``/``text_head`` output projections. Embeddings, positional
    tables, and all LayerNorms stay full precision (tiny, and parity-critical
    for the cache/latent dtypes)."""
    out = dict(gpt_params)
    core = dict(gpt_params["core"])
    blocks = dict(core["blocks"])
    for name in ("attn", "mlp"):
        sub = dict(blocks[name])
        for lin in sub:
            sub[lin] = quantize_linear(sub[lin])
        blocks[name] = sub
    core["blocks"] = blocks
    out["core"] = core
    for head in ("mel_head", "text_head"):
        if head in out:
            out[head] = quantize_linear(out[head])
    return out
