"""Pallas TPU attention kernels (forward + backward) for training.

Block-row attention: the grid tiles (batch×head, query-block); each program
loads one 128-row query tile plus the full K/V for that head into VMEM
(T ≈ 1.1k, hd = 256 → ~2.4 MB, well under the 16 MB budget), computes the
causal+key-masked softmax in f32 on the MXU/VPU, and writes one output tile
plus that tile's log-sum-exp row statistics. For GenVC's sequence lengths this
saturates the MXU without the online-softmax bookkeeping a long-context kernel
would need.

Backward is two Pallas kernels using the saved LSE (no softmax recompute
of statistics, no (B, H, T, T) score matrix in HBM):
  * dq kernel — same query-tile grid as forward: recompute the tile's
    probabilities from LSE, dq = scale · [p ∘ (dO Vᵀ − D)] K,
  * dk/dv kernel — key-tile grid with full Q/dO in VMEM:
    dv = pᵀ dO,  dk = scale · [p ∘ (dO vᵀ − D)]ᵀ Q,
with D = rowsum(dO ∘ O) computed once in XLA. Zero-padded tail rows
contribute exactly zero (their dO rows are zero), so no extra row masking is
needed.

Falls back to the pure-jax path (ops/nn.attention) off-TPU, with a
rematerializing jax.vjp backward (that fallback DOES form the score matrix —
fine at T ≈ 1.1k on CPU test runs; the Pallas path never does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.ops import nn

BQ = 128  # query/key tile rows


def _attn_fwd_kernel(q_ref, k_ref, v_ref, kv_valid_ref, o_ref, lse_ref, *,
                     scale, causal):
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
    lse_ref[0] = m + jnp.log(denom)  # (BQ, 1)


def _attn_dq_kernel(q_ref, k_ref, v_ref, kv_valid_ref, g_ref, lse_ref, d_ref,
                    dq_ref, *, scale, causal):
    iq = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)          # (BQ, hd)
    k = k_ref[0].astype(jnp.float32)          # (T, hd)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)          # (BQ, hd)
    lse = lse_ref[0]                          # (BQ, 1)
    dd = d_ref[0]                             # (BQ, 1)
    t = k.shape[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (BQ, t), 1)
    valid = kv_valid_ref[0, 0][None, :] != 0
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (BQ, t), 0) + iq * BQ
        valid = valid & (col <= row)
    s = jnp.where(valid, s, -1e9)
    p = jnp.exp(s - lse)                      # (BQ, T)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - dd)
    dq_ref[0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)


def _attn_dkdv_kernel(q_ref, k_ref, v_ref, kv_valid_ref, g_ref, lse_ref,
                      d_ref, dk_ref, dv_ref, *, scale, causal):
    ik = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)          # (T, hd) full queries
    k = k_ref[0].astype(jnp.float32)          # (BQ, hd) key tile
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)          # (T, hd)
    lse = lse_ref[0]                          # (T, 1)
    dd = d_ref[0]                             # (T, 1)
    t = q.shape[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (T, BQ)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, BQ), 1) + ik * BQ
    valid = kv_valid_ref[0, 0][None, :] != 0  # (1, BQ) this key tile
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (t, BQ), 0)
        valid = valid & (col <= row)
    s = jnp.where(valid, s, -1e9)
    p = jnp.exp(s - lse)                      # (T, BQ)
    dv_ref[0] = jnp.dot(p.T, g,
                        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)  # (T, BQ)
    ds = p * (dp - dd)
    dk_ref[0] = (jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
                 * scale).astype(dk_ref.dtype)


try:  # pallas is TPU-oriented; import guarded so CPU tests can still load us
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _pad_flatten(q, k, v, kv_valid, extras=()):
    b, h, t, hd = q.shape
    t_pad = int(np.ceil(t / BQ) * BQ)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        kv_valid = jnp.pad(kv_valid, [(0, 0), (0, t_pad - t)])
        extras = tuple(jnp.pad(e, pad) for e in extras)
    flat = lambda x: x.reshape(b * h, t_pad, hd)
    validf = jnp.repeat(kv_valid.astype(jnp.int32), h, axis=0)[:, None, :]
    return ((flat(q), flat(k), flat(v), validf)
            + tuple(flat(e) for e in extras), t_pad)


def _pallas_attention(q, k, v, kv_valid, scale, causal, interpret=False):
    b, h, t, hd = q.shape
    (qf, kf, vf, validf), t_pad = _pad_flatten(q, k, v, kv_valid)

    kernel = functools.partial(_attn_fwd_kernel, scale=scale, causal=causal)
    row_tile = pl.BlockSpec((1, BQ, hd), lambda bh, iq: (bh, iq, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, t_pad, hd), lambda bh, iq: (bh, 0, 0),
                        memory_space=pltpu.VMEM)
    valid_spec = pl.BlockSpec((1, 1, t_pad), lambda bh, iq: (bh, 0, 0),
                              memory_space=pltpu.VMEM)
    # LSE rides as (BH, T, 1): TPU block shapes need the second-to-minor dim
    # 8-aligned (or full), which a (1, BQ) 2-D block is not
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, t_pad // BQ),
        in_specs=[row_tile, full, full, valid_spec],
        out_specs=[row_tile,
                   pl.BlockSpec((1, BQ, 1), lambda bh, iq: (bh, iq, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b * h, t_pad, hd), q.dtype),
                   jax.ShapeDtypeStruct((b * h, t_pad, 1), jnp.float32)],
        interpret=interpret,
    )(qf, kf, vf, validf)
    return (out.reshape(b, h, t_pad, hd)[:, :, :t],
            lse.reshape(b, h, t_pad)[:, :, :t])


def _pallas_backward(q, k, v, kv_valid, out, lse, g, scale, causal,
                     interpret=False):
    b, h, t, hd = q.shape
    dd = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    (qf, kf, vf, validf, gf, outf), t_pad = _pad_flatten(
        q, k, v, kv_valid, extras=(g, out))
    del outf
    pad_t = t_pad - t
    lsef = jnp.pad(lse, [(0, 0), (0, 0), (0, pad_t)]).reshape(b * h, t_pad, 1)
    ddf = jnp.pad(dd, [(0, 0), (0, 0), (0, pad_t)]).reshape(b * h, t_pad, 1)

    row_tile = pl.BlockSpec((1, BQ, hd), lambda bh, i: (bh, i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, t_pad, hd), lambda bh, i: (bh, 0, 0),
                        memory_space=pltpu.VMEM)
    valid_spec = pl.BlockSpec((1, 1, t_pad), lambda bh, i: (bh, 0, 0),
                              memory_space=pltpu.VMEM)
    stat_tile = pl.BlockSpec((1, BQ, 1), lambda bh, i: (bh, i, 0),
                             memory_space=pltpu.VMEM)
    stat_full = pl.BlockSpec((1, t_pad, 1), lambda bh, i: (bh, 0, 0),
                             memory_space=pltpu.VMEM)
    # key-tile view of the validity row: (1, BQ) slice i of the (1, T) row
    valid_tile = pl.BlockSpec((1, 1, BQ), lambda bh, i: (bh, 0, i),
                              memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_attn_dq_kernel, scale=scale, causal=causal),
        grid=(b * h, t_pad // BQ),
        in_specs=[row_tile, full, full, valid_spec, row_tile, stat_tile,
                  stat_tile],
        out_specs=row_tile,
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, validf, gf, lsef, ddf)

    dk, dv = pl.pallas_call(
        functools.partial(_attn_dkdv_kernel, scale=scale, causal=causal),
        grid=(b * h, t_pad // BQ),
        in_specs=[full, row_tile, row_tile, valid_tile, full, stat_full,
                  stat_full],
        out_specs=[row_tile, row_tile],
        out_shape=[jax.ShapeDtypeStruct((b * h, t_pad, hd), q.dtype),
                   jax.ShapeDtypeStruct((b * h, t_pad, hd), q.dtype)],
        interpret=interpret,
    )(qf, kf, vf, validf, gf, lsef, ddf)

    unflat = lambda x: x.reshape(b, h, t_pad, hd)[:, :, :t]
    return unflat(dq), unflat(dk), unflat(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, kv_valid, scale=None, causal=True,
                    interpret=False):
    """(B, H, T, hd) causal masked attention via the Pallas kernels.

    kv_valid: (B, T) bool key mask. Backward runs the Pallas dq / dk/dv
    kernels from the saved LSE (the score matrix never hits HBM); the
    off-TPU fallback differentiates the dense reference path instead.
    """
    out, _ = _forward(q, k, v, kv_valid, scale, causal, interpret)
    return out


def _forward(q, k, v, kv_valid, scale, causal, interpret):
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    if not _HAS_PALLAS:
        return _reference(q, k, v, kv_valid, scale, causal), None
    return _pallas_attention(q, k, v, kv_valid, scale, causal, interpret)


def _reference(q, k, v, kv_valid, scale, causal):
    t = q.shape[2]
    bias = nn.key_padding_bias(kv_valid)
    if causal:
        bias = bias + nn.causal_bias(t)
    return nn.attention(q, k, v, bias=bias, scale=scale)


def _fwd(q, k, v, kv_valid, scale, causal, interpret):
    out, lse = _forward(q, k, v, kv_valid, scale, causal, interpret)
    return out, (q, k, v, kv_valid, out, lse)


def _bwd(scale, causal, interpret, res, g):
    q, k, v, kv_valid, out, lse = res
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])

    if _HAS_PALLAS and lse is not None:
        dq, dk, dv = _pallas_backward(q, k, v, kv_valid, out, lse, g, scale,
                                      causal, interpret)
        return dq, dk, dv, None

    def f(q, k, v):
        return _reference(q, k, v, kv_valid, scale, causal)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
