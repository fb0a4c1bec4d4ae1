"""Fused single-token decode attention over the static KV cache (Pallas).

Why this kernel exists: the batched AR decode step is KV-cache-bandwidth
bound — at B=16 the per-step cache read (layers x B x H x T x hd x 2 tensors)
is ~2x the weight stream. Storing the cache as float8_e4m3 halves that
traffic, but the XLA path (`ck.astype(bf16)` before the attention einsum)
materializes the f8->bf16 convert as a separate HBM round-trip, which erases
the saving (measured throughput-neutral, ROUND3_NOTES). This kernel reads the
f8 cache block directly into VMEM and upcasts in-register, so the HBM side of
the attention read really is half width.

Shapes (one layer of the decode stack, engine._attend_cached):
  q         (B, H, hd)   bf16/f32 — the single new token's queries
  k_cache   (B, H, T, hd) bf16 or float8_e4m3fn (static cache length T)
  v_cache   (B, H, T, hd) same dtype as k_cache
  bias      (B, T)       f32 additive key-padding bias (0 / -1e9)
  -> out    (B, H, hd)   q.dtype

Grid (B, H): each program runs the full q.K^T -> masked softmax -> .V chain
for one (row, head) — M=1 gemv work on the MXU, VPU softmax in f32, all in
one VMEM residency of the (T, hd) cache block. T is a 128 multiple
(engine.cache_size), hd=256 for the flagship — both MXU/VPU aligned.

Reference semantics matched: inference-time cached attention of the
reference's GPT decode (inference/gpt_inference.py:55-124 drives HF
attention with past_key_values); numerics identical to ops.nn.attention
(f32 softmax) up to the cache storage dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _f8e4m3_bits_to_bf16(bits_i8):
    """Upcast float8_e4m3 BITS (passed as int8) to bf16 with integer ops.

    Mosaic's native f8->bf16 convert lowers to a slow path (measured 3x the
    whole kernel's bf16 runtime); this routes around it: place sign at f32
    bit 31 and the 7 exp+man bits at the f32 exponent/mantissa positions,
    then scale by 2**(127-7) to rebase the exponent bias. Exact for e4m3
    normals AND subnormals (the bf16 round of an e4m3 value is lossless:
    3-bit mantissa into 7). e4m3 NaN (0x7F/0xFF) maps to a large finite
    value — the decode cache never stores NaN.
    """
    b = bits_i8.astype(jnp.int32)
    sign = (b & 0x80) << 24             # sign -> bit 31
    mag = (b & 0x7F) << 20              # exp+man -> f32 exp/man fields
    f = pltpu.bitcast(sign | mag, jnp.float32)
    return (f * jnp.float32(1.329227995784916e36)).astype(jnp.bfloat16)  # 2^120


def _decode_attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale,
                        f8_bits):
    q = q_ref[0, 0].astype(jnp.bfloat16)            # (1, hd) — keep 2D
    if f8_bits:
        k = _f8e4m3_bits_to_bf16(k_ref[0, 0])       # (T, hd) in-register upcast
        v = _f8e4m3_bits_to_bf16(v_ref[0, 0])
    else:
        k = k_ref[0, 0].astype(jnp.bfloat16)        # (T, hd)
        v = v_ref[0, 0].astype(jnp.bfloat16)

    # (1, hd) x (T, hd)^T -> (1, T) logits, f32 accumulation on the MXU
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[0]                    # (1, T) additive mask

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p / denom).astype(jnp.bfloat16)

    out = jax.lax.dot_general(                       # (1, T) x (T, hd) -> (1, hd)
        probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q, k_cache, v_cache, bias, *, interpret=False):
    """Single-token cached attention: see module docstring for shapes.

    ``bias`` is the (B, T) f32 key-padding bias (0 valid / -1e9 invalid).
    Works for bf16 and float8_e4m3fn caches; output dtype follows ``q``.
    """
    b, h, hd = q.shape
    t = k_cache.shape[2]
    scale = 1.0 / np.sqrt(hd)

    # 4-D/3-D layouts so every block's trailing two dims equal the array's
    # (Mosaic block-shape rule: trailing dims divisible by (8, 128) or full)
    q4 = q[:, :, None, :]                   # (B, H, 1, hd)
    bias3 = bias[:, None, :]                # (B, 1, T)

    # f8 caches enter the kernel as raw bits (int8) so the upcast runs on
    # the fast integer path — see _f8e4m3_bits_to_bf16
    f8_bits = k_cache.dtype == jnp.float8_e4m3fn
    if f8_bits:
        k_cache = jax.lax.bitcast_convert_type(k_cache, jnp.int8)
        v_cache = jax.lax.bitcast_convert_type(v_cache, jnp.int8)

    kernel = functools.partial(_decode_attn_kernel, scale=scale,
                               f8_bits=f8_bits)
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, 1, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, hd), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, hd), q.dtype),
        interpret=interpret,
    )(q4, k_cache, v_cache, bias3)
    return out[:, :, 0, :]


def _decode_attn_layer_kernel(lidx_ref, q_ref, k_ref, v_ref, bias_ref,
                              out_ref, *, scale, f8_bits):
    del lidx_ref  # consumed by the index_maps
    q = q_ref[0, 0].astype(jnp.bfloat16)            # (1, hd)
    if f8_bits:
        # in-kernel bitcast f8->i8 is free (no data movement); the integer
        # upcast then avoids Mosaic's slow native f8 convert
        k = _f8e4m3_bits_to_bf16(
            pltpu.bitcast(k_ref[0, 0, 0], jnp.int8))  # (T, hd)
        v = _f8e4m3_bits_to_bf16(
            pltpu.bitcast(v_ref[0, 0, 0], jnp.int8))
    else:
        k = k_ref[0, 0, 0].astype(jnp.bfloat16)
        v = v_ref[0, 0, 0].astype(jnp.bfloat16)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[0]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_layer(q, cache_k, cache_v, bias, layer_idx, *,
                           interpret=False):
    """Like :func:`decode_attention` but reads layer ``layer_idx`` of the FULL
    stacked cache (L, B, H, T, hd) via a scalar-prefetched index_map — no
    host-side slice, so XLA never materializes a per-layer cache copy to feed
    the kernel (measured: the slice copy costs more than the kernel saves).
    """
    b, h, hd = q.shape
    t = cache_k.shape[3]
    scale = 1.0 / np.sqrt(hd)

    q4 = q[:, :, None, :]                   # (B, H, 1, hd)
    bias3 = bias[:, None, :]                # (B, 1, T)

    # f8 caches flow in AT their storage dtype (a host-side bitcast of the
    # full stacked cache materializes a copy per layer); the kernel bitcasts
    # each block to int8 bits in VMEM, which is free
    f8_bits = cache_k.dtype == jnp.float8_e4m3fn

    lidx = jnp.asarray(layer_idx, jnp.int32).reshape((1,))
    kernel = functools.partial(_decode_attn_layer_kernel, scale=scale,
                               f8_bits=f8_bits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, 1, hd), lambda i, j, lidx: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, t, hd),
                         lambda i, j, lidx: (lidx[0], i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, t, hd),
                         lambda i, j, lidx: (lidx[0], i, j, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, j, lidx: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, hd), lambda i, j, lidx: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, hd), q.dtype),
        interpret=interpret,
    )(lidx, q4, cache_k, cache_v, bias3)
    return out[:, :, 0, :]


UPDATE_SLAB = 32  # cache write-back granularity (int8 sublane tile)


def _decode_attn_update_kernel(lidx_ref, pos_ref, q_ref, kn_ref, vn_ref,
                               k_ref, v_ref, bias_ref, out_ref, ko_ref,
                               vo_ref, *, scale, f8_bits):
    """Write the new token's K/V into this (row, head)'s cache block at the
    row's position, then attend over the updated block.

    HBM traffic stays read-dominated: the write lands in the INPUT block's
    VMEM copy (so the attention sees it) and only the UPDATE_SLAB-row slab
    containing the position flushes back through the aliased outputs —
    writing the full (T, hd) block back would double cache bandwidth and
    erase the kernel's reason to exist."""
    i = pl.program_id(0)
    p = pos_ref[i]
    t = k_ref.shape[3]

    if f8_bits:
        # native f32->f8 convert + bitcast: ONE (1, hd) row per program —
        # Mosaic's slow f8 convert path only matters at full-block width
        # (the read side, which stays on the integer bitfield upcast)
        kn = pltpu.bitcast(kn_ref[0, 0].astype(jnp.float8_e4m3fn), jnp.int8)
        vn = pltpu.bitcast(vn_ref[0, 0].astype(jnp.float8_e4m3fn), jnp.int8)
        k_store = pltpu.bitcast(k_ref[0, 0, 0], jnp.int8)   # (T, hd) bits
        v_store = pltpu.bitcast(v_ref[0, 0, 0], jnp.int8)
    else:
        kn = kn_ref[0, 0].astype(k_ref.dtype)
        vn = vn_ref[0, 0].astype(v_ref.dtype)
        k_store = k_ref[0, 0, 0]                            # (T, hd)
        v_store = v_ref[0, 0, 0]

    # masked row replacement in REGISTERS — Mosaic cannot prove alignment
    # of a dynamic single-row vector store, and a select over the block
    # (which is resident for the attention read anyway) is free
    sel = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) == p
    k_store = jnp.where(sel, kn, k_store)
    v_store = jnp.where(sel, vn, v_store)

    if f8_bits:
        k = _f8e4m3_bits_to_bf16(k_store)            # (T, hd)
        v = _f8e4m3_bits_to_bf16(v_store)
    else:
        k = k_store.astype(jnp.bfloat16)
        v = v_store.astype(jnp.bfloat16)

    q = q_ref[0, 0].astype(jnp.bfloat16)             # (1, hd)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[0]
    m = jnp.max(logits, axis=-1, keepdims=True)
    pexp = jnp.exp(logits - m)
    probs = (pexp / jnp.sum(pexp, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)

    # flush the updated slab (the out_specs index_map points this block at
    # slab pos // UPDATE_SLAB of the aliased cache): re-read the slab from
    # the input ref at the UPDATE_SLAB-aligned base (alignment is provable
    # by construction, unlike a raw dynamic row index) and apply the same
    # masked row replacement within it
    base = (p // UPDATE_SLAB) * UPDATE_SLAB
    sel_s = (jax.lax.broadcasted_iota(jnp.int32, (UPDATE_SLAB, 1), 0)
             + base) == p
    slab_k = k_ref[0, 0, 0, pl.dslice(base, UPDATE_SLAB), :]
    slab_v = v_ref[0, 0, 0, pl.dslice(base, UPDATE_SLAB), :]
    if f8_bits:
        slab_k = pltpu.bitcast(slab_k, jnp.int8)
        slab_v = pltpu.bitcast(slab_v, jnp.int8)
    ko_ref[0, 0, 0] = jnp.where(sel_s, kn, slab_k)
    vo_ref[0, 0, 0] = jnp.where(sel_s, vn, slab_v)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_update_layer(q, k_new, v_new, cache_k, cache_v, bias,
                                  pos, layer_idx, *, interpret=False):
    """Per-row-position fused decode attention WITH the cache write done
    in-kernel: write ``k_new``/``v_new`` at each row's ``pos`` into layer
    ``layer_idx`` of the FULL stacked cache, then attend over the updated
    block — one VMEM residency, no XLA scatter. The cache arrays are
    input/output aliased; only the UPDATE_SLAB-row slab containing each
    row's position flushes back.

    STATUS: correct but NOT wired into the decode engine — a documented
    negative result (round 5). Token-exact vs the XLA per-row path on TPU,
    but a full 16-slot pool tick measured 122.5 ms vs 108.5 ms for the
    XLA scatter path (bf16 flagship), and the f8 variant loses the aliasing
    through the boundary bitcasts entirely (720 ms: XLA materializes cache
    copies per layer). The XLA per-row path with int8 weights + fp8 cache
    (96.2 ms/tick) is the fastest measured pool configuration, so the
    engine keeps it (engine._attend_cached gates; ROUND5_NOTES has the full
    table). Kept because the kernel pattern (scalar-prefetched per-row
    positions, masked in-register row replacement, aligned slab write-back
    through aliased outputs) is the correct starting point if the aliasing
    or Mosaic store-alignment constraints improve.

    Shapes: q/k_new/v_new (B, H, hd); cache_k/cache_v (L, B, H, T, hd) in
    bf16 or float8_e4m3fn; bias (B, T) f32 additive key-padding mask that
    ALREADY marks each row's ``pos`` valid; pos (B,) int32. Returns
    (out (B, H, hd) in q.dtype, cache_k', cache_v')."""
    b, h, hd = q.shape
    t = cache_k.shape[3]
    scale = 1.0 / np.sqrt(hd)

    q4 = q[:, :, None, :]
    kn4 = k_new[:, :, None, :].astype(jnp.float32)
    vn4 = v_new[:, :, None, :].astype(jnp.float32)
    bias3 = bias[:, None, :]

    f8_bits = cache_k.dtype == jnp.float8_e4m3fn
    io_dtype = jnp.int8 if f8_bits else cache_k.dtype
    if f8_bits:
        cache_k = jax.lax.bitcast_convert_type(cache_k, jnp.int8)
        cache_v = jax.lax.bitcast_convert_type(cache_v, jnp.int8)
    if not f8_bits:
        kn4 = kn4.astype(cache_k.dtype)
        vn4 = vn4.astype(cache_v.dtype)

    lidx = jnp.asarray(layer_idx, jnp.int32).reshape((1,))
    pos = jnp.asarray(pos, jnp.int32)
    kernel = functools.partial(_decode_attn_update_kernel, scale=scale,
                               f8_bits=f8_bits)
    cache_in_spec = pl.BlockSpec(
        (1, 1, 1, t, hd), lambda i, j, lidx, pos: (lidx[0], i, j, 0, 0))
    # output slab: only the UPDATE_SLAB rows containing each row's position
    # flush back (cache arrays are aliased, everything else is untouched)
    slab_spec = pl.BlockSpec(
        (1, 1, 1, UPDATE_SLAB, hd),
        lambda i, j, lidx, pos: (lidx[0], i, j, pos[i] // UPDATE_SLAB, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, 1, hd), lambda i, j, lidx, pos: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd), lambda i, j, lidx, pos: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, hd), lambda i, j, lidx, pos: (i, j, 0, 0)),
            cache_in_spec,
            cache_in_spec,
            pl.BlockSpec((1, 1, t), lambda i, j, lidx, pos: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, hd), lambda i, j, lidx, pos: (i, j, 0, 0)),
            slab_spec,
            slab_spec,
        ],
    )
    out, ck, cv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, 1, hd), q.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, io_dtype),
            jax.ShapeDtypeStruct(cache_v.shape, io_dtype),
        ],
        # inputs 5/6 are the cache operands (counting the 2 scalar-prefetch
        # args); alias them onto outputs 1/2 so the update is in place
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
    )(lidx, pos, q4, kn4, vn4, cache_k, cache_v, bias3)
    if f8_bits:
        ck = jax.lax.bitcast_convert_type(ck, jnp.float8_e4m3fn)
        cv = jax.lax.bitcast_convert_type(cv, jnp.float8_e4m3fn)
    return out[:, :, 0, :], ck, cv


def decode_attention_reference(q, k_cache, v_cache, bias):
    """XLA reference (same math, cache upcast materialized) — used on
    non-TPU backends and as the parity oracle in tests."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32),
                        k_cache.astype(jnp.float32)) * scale
    logits = logits + bias[:, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bht,bhtd->bhd", probs, v_cache.astype(jnp.float32))
    return out.astype(q.dtype)
