"""Pallas TPU attention kernel for the training forward.

Block-row attention: the grid tiles (batch×head, query-block); each program
loads one 128-row query tile plus the full K/V for that head into VMEM
(T ≈ 1.1k, hd = 256 → ~2.4 MB, well under the 16 MB budget), computes the
causal+key-masked softmax in f32 on the MXU/VPU, and writes one output tile.
For GenVC's sequence lengths this saturates the MXU without the online-softmax
bookkeeping a long-context kernel would need.

Falls back to the pure-jax path (ops/nn.attention) off-TPU; a custom_vjp
recomputes attention in the backward pass (flash-style rematerialization) so
the (B, H, T, T) score matrix is never materialized in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.ops import nn

BQ = 128


def _attn_kernel(q_ref, k_ref, v_ref, kv_valid_ref, o_ref, *, scale, causal):
    iq = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)          # (BQ, hd)
    k = k_ref[0].astype(jnp.float32)          # (T, hd)
    v = v_ref[0].astype(jnp.float32)
    t = k.shape[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (BQ, T)
    col = jax.lax.broadcasted_iota(jnp.int32, (BQ, t), 1)
    valid = kv_valid_ref[0, 0][None, :] != 0
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (BQ, t), 0) + iq * BQ
        valid = valid & (col <= row)
    s = jnp.where(valid, s, -1e9)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)


try:  # pallas is TPU-oriented; import guarded so CPU tests can still load us
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _pallas_attention(q, k, v, kv_valid, scale, causal, interpret=False):
    b, h, t, hd = q.shape
    t_pad = int(np.ceil(t / BQ) * BQ)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        kv_valid = jnp.pad(kv_valid, [(0, 0), (0, t_pad - t)])

    qf = q.reshape(b * h, t_pad, hd)
    kf = k.reshape(b * h, t_pad, hd)
    vf = v.reshape(b * h, t_pad, hd)
    # (B*H, 1, T): the singleton axis keeps the block's trailing dims equal to
    # the array dims, as the TPU lowering requires
    validf = jnp.repeat(kv_valid.astype(jnp.int32), h, axis=0)[:, None, :]

    kernel = functools.partial(_attn_kernel, scale=scale, causal=causal)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, t_pad // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, hd), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, hd), lambda bh, iq: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, validf)
    out = out.reshape(b, h, t_pad, hd)
    return out[:, :, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, kv_valid, scale=None, causal=True,
                    interpret=False):
    """(B, H, T, hd) causal masked attention via the Pallas kernel.

    kv_valid: (B, T) bool key mask. Backward recomputes the forward
    (rematerialized attention) and uses exact softmax gradients.
    """
    return _forward(q, k, v, kv_valid, scale, causal, interpret)


def _forward(q, k, v, kv_valid, scale, causal, interpret):
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    if not _HAS_PALLAS:
        return _reference(q, k, v, kv_valid, scale, causal)
    return _pallas_attention(q, k, v, kv_valid, scale, causal, interpret)


def _reference(q, k, v, kv_valid, scale, causal):
    t = q.shape[2]
    bias = nn.key_padding_bias(kv_valid)
    if causal:
        bias = bias + nn.causal_bias(t)
    return nn.attention(q, k, v, bias=bias, scale=scale)


def _fwd(q, k, v, kv_valid, scale, causal, interpret):
    out = _forward(q, k, v, kv_valid, scale, causal, interpret)
    return out, (q, k, v, kv_valid)


def _bwd(scale, causal, interpret, res, g):
    q, k, v, kv_valid = res
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])

    def f(q, k, v):
        return _reference(q, k, v, kv_valid, scale, causal)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
