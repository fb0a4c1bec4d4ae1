"""Core NN primitives as pure functions over explicit param pytrees.

Conventions: all linear weights are stored as (in_features, out_features) so
``x @ w + b`` applies them — torch checkpoints are transposed at conversion
time (HF GPT-2 ``Conv1D`` already stores (in, out)). LayerNorm eps = 1e-5
matches torch defaults.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

NEG_INF = -1e9  # additive mask value; finite to keep softmax NaN-free


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:  # int8-quantized leaf (ops.quant) — serving decode path
        from genvc_tpu.ops import quant
        return quant.linear_q8(p, x)
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def rms_norm_l2(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """torch ``F.normalize(x, dim=-1) * sqrt(d) * gamma`` semantics
    (reference perceiver RMSNorm, layers/perceiver_encoder.py:168-187)."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True))
    out = xf / jnp.maximum(norm, 1e-12) * np.sqrt(x.shape[-1])
    out = out * p["gamma"].astype(jnp.float32)
    return out.astype(x.dtype)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """GPT-2 'gelu_new' (tanh approximation)."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """(B, H, Tq, hd) x (B, H, Tk, hd) softmax attention; softmax in f32.

    ``bias`` is additive, broadcastable to (B, H, Tq, Tk); build it from
    causal/key-padding masks with :func:`attn_bias`.
    """
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=q.dtype)


def causal_bias(t: int, dtype=jnp.float32) -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return jnp.where(j <= i, 0.0, NEG_INF).astype(dtype)[None, None]


def key_padding_bias(key_valid: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, Tk) bool -> (B, 1, 1, Tk) additive bias."""
    return jnp.where(key_valid, 0.0, NEG_INF).astype(dtype)[:, None, None, :]


# ---------------------------------------------------------------------------
# Initializers mirroring the torch modules they replace (for from-scratch training)

def init_linear(key, d_in, d_out, std: float | None = None, bias: bool = True):
    kw, kb = jax.random.split(key)
    if std is None:
        # torch nn.Linear default: U(-1/sqrt(in), 1/sqrt(in))
        lim = 1.0 / np.sqrt(d_in)
        w = jax.random.uniform(kw, (d_in, d_out), jnp.float32, -lim, lim)
        b = jax.random.uniform(kb, (d_out,), jnp.float32, -lim, lim)
    else:
        w = jax.random.normal(kw, (d_in, d_out), jnp.float32) * std
        b = jnp.zeros((d_out,), jnp.float32)
    p = {"w": w}
    if bias:
        p["b"] = b
    return p


def init_layer_norm(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_embedding(key, n, d, std=0.02):
    return jax.random.normal(key, (n, d), jnp.float32) * std
