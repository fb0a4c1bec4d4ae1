"""Perceiver resampler speaker encoder.

Behavioral contract (reference: layers/perceiver_encoder.py:225-319, constructed
with dim=1024, depth=4, dim_context=80, num_latents=32, dim_head=64, heads=8,
ff_mult=4 at layers/gpt.py:179-188): 32 learned latents cross-attend over
projected mel frames with the queries included in the context, GEGLU feed
forward, single final L2-RMSNorm. No per-layer norms (faithful to reference).

Key-padding mask note: the reference concatenates [latents, context] as keys
but builds its mask as [frame_mask, ones(32)] — misaligned
(layers/gpt.py:367 vs perceiver_encoder.py:310-312). The misalignment is
inert in practice because the reference collate pads all conditioning clips to
one length (dataset.py:202), making the mask uniform. We implement the
correctly aligned mask: latents always valid, frames masked by length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.ops import nn

N_LATENTS = 32


def init_params(key, dim=1024, depth=4, dim_context=80, dim_head=64, heads=8,
                ff_mult=4):
    keys = jax.random.split(key, 4 + depth * 5)
    dim_inner = dim_head * heads
    ff_inner = int(dim * ff_mult * 2 / 3)

    def layer(i):
        k = keys[4 + i * 5 : 9 + i * 5]
        return {
            "to_q": nn.init_linear(k[0], dim, dim_inner, bias=False),
            "to_kv": nn.init_linear(k[1], dim, dim_inner * 2, bias=False),
            "to_out": nn.init_linear(k[2], dim_inner, dim, bias=False),
            "ff_in": nn.init_linear(k[3], dim, ff_inner * 2),
            "ff_out": nn.init_linear(k[4], ff_inner, dim),
        }

    layers = [layer(i) for i in range(depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "proj_context": nn.init_linear(keys[0], dim_context, dim),
        "latents": jax.random.normal(keys[1], (N_LATENTS, dim), jnp.float32) * 0.02,
        "layers": stacked,
        "norm": {"gamma": jnp.ones((dim,), jnp.float32)},
    }


def forward(params, mel_frames: jnp.ndarray, frame_valid: jnp.ndarray | None = None,
            heads: int = 8) -> jnp.ndarray:
    """mel_frames: (B, T, n_mels); frame_valid: optional (B, T) bool.

    Returns (B, 32, dim) speaker latents.
    """
    x = nn.linear(params["proj_context"], mel_frames)
    b = x.shape[0]
    latents = jnp.broadcast_to(params["latents"].astype(x.dtype),
                               (b,) + params["latents"].shape)

    if frame_valid is not None:
        key_valid = jnp.concatenate(
            [jnp.ones((b, N_LATENTS), bool), frame_valid.astype(bool)], axis=1
        )
        bias = nn.key_padding_bias(key_valid)
    else:
        bias = None

    def one_layer(latents, lp):
        context = jnp.concatenate([latents, x], axis=1)  # queries included
        q = nn.split_heads(nn.linear(lp["to_q"], latents), heads)
        kv = nn.linear(lp["to_kv"], context)
        k, v = jnp.split(kv, 2, axis=-1)
        k = nn.split_heads(k, heads)
        v = nn.split_heads(v, heads)
        out = nn.merge_heads(nn.attention(q, k, v, bias=bias))
        latents = nn.linear(lp["to_out"], out) + latents

        h = nn.linear(lp["ff_in"], latents)
        val, gate = jnp.split(h, 2, axis=-1)
        h = nn.gelu_exact(gate) * val
        latents = nn.linear(lp["ff_out"], h) + latents
        return latents, None

    latents, _ = jax.lax.scan(one_layer, latents, params["layers"])
    return nn.rms_norm_l2(params["norm"], latents)
