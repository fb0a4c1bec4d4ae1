"""Misc host utilities: masks, feature plotting, profiling helpers.

Counterparts of the reference's utils.py helpers that are not DSP
(get_mask_from_lengths :16-24, plot_feat :269-277) plus a jax.profiler
context manager (SURVEY.md §5.1 — the reference has no profiler; latency/RTF
prints are in the inference pipeline).
"""

from __future__ import annotations

import contextlib

import numpy as np


def get_mask_from_lengths(lengths, max_len: int | None = None):
    """(B,) lengths -> (B, max_len) bool mask (reference utils.py:16-24)."""
    import jax.numpy as jnp

    lengths = jnp.asarray(lengths)
    if max_len is None:
        max_len = int(jnp.max(lengths))
    ids = jnp.arange(max_len)[None, :]
    return ids < lengths[:, None]


def plot_feat(feat, path: str | None = None):
    """Render a (C, T) feature map (reference utils.py:269-277); returns the
    matplotlib figure, optionally saving to ``path``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(np.asarray(feat), aspect="auto", origin="lower",
                   interpolation="none")
    plt.colorbar(im, ax=ax)
    fig.canvas.draw()
    if path:
        fig.savefig(path, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return fig


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace context (no-op when log_dir is falsy)."""
    import jax

    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
