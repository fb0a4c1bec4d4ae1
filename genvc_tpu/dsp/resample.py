"""Sample-rate conversion as a strided conv (TPU) / polyphase dot (host).

Reproduces ``torchaudio.functional.resample`` numerics (kaiser / hann windowed
sinc polyphase; see reference call sites trainers/gpt_trainer.py:213-222 and
layers/hifigan.py:722,727) with the kernel precomputed on host by
``genvc_tpu.dsp.filters.resample_kernel`` and applied as a single
``conv_general_dilated`` so it lowers onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.dsp import filters


def resample(
    x: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    *,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    beta: float | None = None,
    window: str = "hann",
) -> jnp.ndarray:
    """Resample (..., T) -> (..., ceil(T * new/orig)) matching torchaudio."""
    if orig_freq == new_freq:
        return x
    kernels, width, orig_r, new_r = filters.resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff, beta, window
    )
    t = x.shape[-1]
    batch_shape = x.shape[:-1]
    xb = x.reshape((-1, 1, t)).astype(jnp.float32)
    # torchaudio pads (width, width + orig_r) then convolves with stride orig_r.
    xb = jnp.pad(xb, ((0, 0), (0, 0), (width, width + orig_r)))
    # kernels: (new_r, kernel_len) -> conv filters (new_r out-ch, 1 in-ch, L)
    k = jnp.asarray(kernels)[:, None, :]
    y = jax.lax.conv_general_dilated(
        xb, k, window_strides=(orig_r,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, new_r, blocks)
    y = jnp.swapaxes(y, -1, -2).reshape(xb.shape[0], -1)  # interleave phases
    target_len = filters.resample_output_length(t, orig_freq, new_freq)
    y = y[:, :target_len]
    return y.reshape(batch_shape + (target_len,))


def resample_np(x: np.ndarray, orig_freq: int, new_freq: int, **kwargs) -> np.ndarray:
    """Host (numpy) version with identical numerics, for the data pipeline."""
    if orig_freq == new_freq:
        return x
    kernels, width, orig_r, new_r = filters.resample_kernel(
        orig_freq, new_freq,
        kwargs.get("lowpass_filter_width", 6),
        kwargs.get("rolloff", 0.99),
        kwargs.get("beta"),
        kwargs.get("window", "hann"),
    )
    t = x.shape[-1]
    batch_shape = x.shape[:-1]
    xb = x.reshape(-1, t).astype(np.float32)
    xb = np.pad(xb, ((0, 0), (width, width + orig_r)))
    n_blocks = (t + orig_r - 1) // orig_r
    klen = kernels.shape[1]
    # gather blocks: (B, n_blocks, klen)
    idx = (np.arange(n_blocks) * orig_r)[:, None] + np.arange(klen)[None, :]
    blocks = xb[:, idx]
    y = np.einsum("bnk,pk->bnp", blocks, kernels)  # (B, blocks, phases)
    y = y.reshape(xb.shape[0], -1)
    target_len = filters.resample_output_length(t, orig_freq, new_freq)
    y = y[:, :target_len]
    return y.reshape(batch_shape + (target_len,))
