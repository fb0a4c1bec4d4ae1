"""Pallas flash-attention kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genvc_tpu.ops import nn
from genvc_tpu.ops.flash_attention import (_reference, flash_attention,
                                           _HAS_PALLAS)


@pytest.mark.skipif(not _HAS_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("t", [128, 200])
def test_flash_matches_reference(t):
    rng = np.random.default_rng(0)
    b, h, hd = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, hd)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, hd)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, hd)) * 0.3, jnp.float32)
    kv_valid = np.ones((b, t), bool)
    kv_valid[1, t - 37:] = False
    kv_valid = jnp.asarray(kv_valid)

    ref = _reference(q, k, v, kv_valid, 1.0 / np.sqrt(hd), True)
    got = flash_attention(q, k, v, kv_valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not _HAS_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("t,masked", [(128, False), (200, True)])
def test_flash_backward_matches_reference(t, masked):
    """Pallas dq/dk/dv kernels vs dense-path autodiff, incl. the padded-tail
    (t=200 -> 256) and key-masked cases."""
    rng = np.random.default_rng(1)
    b, h, hd = 2, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, hd)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, hd)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, hd)) * 0.3, jnp.float32)
    kv_valid = np.ones((b, t), bool)
    if masked:
        kv_valid[1, t - 43:] = False
    kv_valid = jnp.asarray(kv_valid)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_valid, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, kv_valid, 1.0 / np.sqrt(hd), True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)
