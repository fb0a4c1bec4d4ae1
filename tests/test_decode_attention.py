"""Parity tests for the fused Pallas decode-attention kernel
(ops/decode_attention.py) — run in interpreter mode on the CPU backend;
the compiled path is exercised on TPU by bench.py and the fp8 pipeline.

Reference semantics: single-token cached attention of the decode loop
(reference inference/gpt_inference.py:55-124 via HF past_key_values),
numerically the f32-softmax attention of ops.nn.attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genvc_tpu.ops import decode_attention as da


def _mk(b, h, t, hd, cache_dtype, seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    q = jax.random.normal(ks[0], (b, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, t, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, t, hd), jnp.float32)
    lens = jax.random.randint(ks[3], (b,), 1, t + 1)
    valid = jnp.arange(t)[None, :] < lens[:, None]
    bias = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
    return q, k.astype(cache_dtype), v.astype(cache_dtype), bias


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(cache_dtype):
    q, k, v, bias = _mk(2, 2, 256, 128, cache_dtype)
    ref = da.decode_attention_reference(q, k, v, bias)
    out = da.decode_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_kernel_fp8_cache():
    f8 = jnp.float8_e4m3fn
    q, k, v, bias = _mk(2, 2, 256, 128, f8, seed=1)
    # oracle consumes the SAME f8-rounded cache: the comparison isolates the
    # kernel's math from the storage quantization
    ref = da.decode_attention_reference(q, k, v, bias)
    out = da.decode_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("cache_dtype", [jnp.bfloat16, jnp.float8_e4m3fn])
def test_layer_kernel_matches_reference(cache_dtype):
    # the engine path: full stacked (L, B, H, T, hd) cache, layer selected
    # via the scalar-prefetched index_map
    L, b, h, t, hd = 3, 2, 2, 256, 128
    ks = jax.random.split(jax.random.key(3), 4)
    q = jax.random.normal(ks[0], (b, h, hd), jnp.float32)
    ck = jax.random.normal(ks[1], (L, b, h, t, hd), jnp.float32).astype(cache_dtype)
    cv = jax.random.normal(ks[2], (L, b, h, t, hd), jnp.float32).astype(cache_dtype)
    lens = jax.random.randint(ks[3], (b,), 1, t + 1)
    bias = jnp.where(jnp.arange(t)[None, :] < lens[:, None],
                     0.0, -1e9).astype(jnp.float32)
    for lidx in range(L):
        ref = da.decode_attention_reference(q, ck[lidx], cv[lidx], bias)
        out = da.decode_attention_layer(q, ck, cv, bias, lidx, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-2, rtol=3e-2)


def test_kernel_fully_masked_rows_absent():
    # every row has >= 1 valid key by construction in the decode loop (the
    # new token's own slot is set valid before attention); check a length-1
    # row is exact
    q, k, v, _ = _mk(1, 1, 128, 128, jnp.float32, seed=2)
    bias = jnp.full((1, 128), -1e9).at[0, 0].set(0.0)
    ref = da.decode_attention_reference(q, k, v, bias)
    out = da.decode_attention(q, k, v, bias, interpret=True)
    # kernel computes in bf16 (cache upcast target) — bf16-ulp tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(v[0, 0, 0]),
                               atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("cache_dtype", [jnp.bfloat16, jnp.float8_e4m3fn])
def test_update_layer_kernel_write_and_attend(cache_dtype):
    """decode_attention_update_layer (in-kernel per-row cache write +
    attend; NOT wired into the engine — a measured negative result for
    pool-tick time, see its docstring): the returned caches must equal the
    XLA scatter bit-exactly on every layer (updated layer + untouched
    layers through the aliased outputs), and the attention output must see
    the just-written K/V."""
    rng = np.random.default_rng(0)
    L, B, H, T, hd = 3, 4, 2, 64, 128
    ck = jnp.asarray(rng.standard_normal((L, B, H, T, hd)) * 0.3
                     ).astype(cache_dtype)
    cv = jnp.asarray(rng.standard_normal((L, B, H, T, hd)) * 0.3
                     ).astype(cache_dtype)
    q = jnp.asarray(rng.standard_normal((B, H, hd)) * 0.3,
                    jnp.float32).astype(jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, H, hd)) * 0.3, jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, H, hd)) * 0.3, jnp.float32)
    positions = [5, 37, 0, 63]
    pos = jnp.asarray(positions, jnp.int32)
    valid = np.zeros((B, T), bool)
    for i, p in enumerate(positions):
        valid[i, : p + 1] = True
    bias = jnp.where(jnp.asarray(valid), 0.0, -1e9).astype(jnp.float32)

    out, ck2, cv2 = da.decode_attention_update_layer(
        q, kn, vn, ck, cv, bias, pos, 1, interpret=True)

    rows = jnp.arange(B)
    ck_ref = ck.at[1, rows, :, pos, :].set(kn.astype(cache_dtype))
    cv_ref = cv.at[1, rows, :, pos, :].set(vn.astype(cache_dtype))
    np.testing.assert_array_equal(
        np.asarray(ck2.astype(jnp.float32)),
        np.asarray(ck_ref.astype(jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(cv2.astype(jnp.float32)),
        np.asarray(cv_ref.astype(jnp.float32)))
    want = da.decode_attention_reference(q, ck_ref[1], cv_ref[1], bias)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=2e-2 if cache_dtype == jnp.float8_e4m3fn else 4e-3)
