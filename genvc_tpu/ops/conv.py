"""1-D/2-D convolution helpers in torch weight layout.

Weights keep the torch layout — Conv1d (O, I, K), ConvTranspose1d (I, O, K),
Conv2d (O, I, Kh, Kw) — so converted checkpoints apply without transposition.
All convs run at HIGHEST precision by default: dVAE codes and vocoder audio are
parity-sensitive (a bf16 rounding can flip a VQ index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGHEST


def _wn(p):
    """Effective weight: folded ('w') or weight-norm parametrized ('g','v')."""
    if "w" in p:
        return p["w"]
    v = p["v"]
    axes = tuple(range(1, v.ndim))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return p["g"] * v / jnp.maximum(norm, 1e-12)


def conv1d(p, x, stride=1, padding=0, dilation=1, groups=1):
    """x: (B, C, T), weight (O, I/groups, K) -> (B, O, T_out)."""
    w = _wn(p).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride,), [(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
        precision=_PREC)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, :, None]
    return y


def conv_transpose1d(p, x, stride, padding=0, groups=1):
    """torch ConvTranspose1d semantics; weight (I, O/groups, K).

    out_len = (T-1)*stride - 2*padding + K.
    """
    w = _wn(p).astype(x.dtype)
    k = w.shape[-1]
    if groups != 1:
        raise NotImplementedError
    # fractionally-strided conv: dilate lhs by stride, correlate with the
    # spatially-flipped, (I,O)->(O,I) transposed kernel
    w2 = jnp.flip(w, axis=-1).transpose(1, 0, 2)
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, w2, (1,), [(pad, pad)], lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"), precision=_PREC)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, :, None]
    return y


def conv2d(p, x, stride=(1, 1), padding=(0, 0), dilation=(1, 1), groups=1):
    """x: (B, C, H, W), weight (O, I/groups, Kh, Kw)."""
    w = _wn(p).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, stride, [(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=groups,
        precision=_PREC)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, :, None, None]
    return y


def leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, x * slope)


def nearest_upsample1d(x, factor: int):
    """(B, C, T) -> (B, C, T*factor), torch F.interpolate mode='nearest'."""
    return jnp.repeat(x, factor, axis=-1)


def linear_interp_x4(x, factor: int = 4, valid_len=None):
    """torch ``F.interpolate(mode='linear', align_corners=False)`` for integer
    upscale factors — the reference's latent ×4 upsampler
    (inference/inference_utils.py:81-85). x: (B, C, T) -> (B, C, T*factor).

    ``valid_len`` (scalar) clamps the sampled indices to the true length so a
    zero-padded input reproduces the exact-length result at valid outputs."""
    b, c, t = x.shape
    out_t = t * factor
    # output j samples input at position (j + 0.5)/factor - 0.5
    pos = (np.arange(out_t) + 0.5) / factor - 0.5
    lo = np.floor(pos).astype(np.int32)
    frac = jnp.asarray((pos - lo).astype(np.float32))
    if valid_len is None:
        lo_c = np.clip(lo, 0, t - 1)
        hi_c = np.clip(lo + 1, 0, t - 1)
        xl = x[..., lo_c]
        xh = x[..., hi_c]
    else:
        hi_lim = valid_len - 1
        lo_c = jnp.clip(jnp.asarray(lo), 0, hi_lim)
        hi_c = jnp.clip(jnp.asarray(lo) + 1, 0, hi_lim)
        xl = jnp.take(x, lo_c, axis=-1)
        xh = jnp.take(x, hi_c, axis=-1)
    return xl + (xh - xl) * frac


def init_conv1d(key, out_ch, in_ch, kernel, std: float | None = None,
                bias: bool = True, groups: int = 1):
    kw, kb = jax.random.split(key)
    shape = (out_ch, in_ch // groups, kernel)
    fan_in = (in_ch // groups) * kernel
    if std is None:
        lim = 1.0 / np.sqrt(fan_in)
        w = jax.random.uniform(kw, shape, jnp.float32, -lim, lim)
    else:
        w = jax.random.normal(kw, shape, jnp.float32) * std
    p = {"w": w}
    if bias:
        lim = 1.0 / np.sqrt(fan_in)
        p["b"] = jax.random.uniform(kb, (out_ch,), jnp.float32, -lim, lim)
    return p


def to_weight_norm(p):
    """Split a folded conv weight into torch weight_norm (g, v) params."""
    w = p["w"]
    axes = tuple(range(1, w.ndim))
    g = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
    out = {"g": g, "v": w}
    if "b" in p:
        out["b"] = p["b"]
    return out
