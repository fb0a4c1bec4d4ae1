"""Jittable logit transforms matching HF generation semantics.

The reference decodes through HF ``generate``/``sample_stream``
(/root/reference/layers/stream_generator.py) with repetition_penalty, then the
warper chain temperature → top-k → top-p (HF's default ordering), then
multinomial sampling. Each transform here is a pure function usable inside
``lax.scan``/``while_loop`` decode bodies.

Repetition penalty state is a boolean "seen" vector over the vocab — HF scans
``input_ids`` which, for GenVC, includes the fake prefix ids (all 1s) and the
start_audio token (gpt.py:582-592), so those two ids start out "seen".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_seen(vocab_size: int, batch: int, fake_prefix: bool = True,
              start_audio_token: int = 1024) -> jnp.ndarray:
    seen = jnp.zeros((batch, vocab_size), bool)
    if fake_prefix:
        seen = seen.at[:, 1].set(True)          # fake prefix ids are 1
        seen = seen.at[:, start_audio_token].set(True)
    return seen


def apply_repetition_penalty(logits: jnp.ndarray, seen: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, penalized, logits)


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    if temperature == 1.0:
        return logits
    return logits / temperature


def apply_top_k(logits: jnp.ndarray, k: int,
                min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """HF TopKLogitsWarper; beam modes pass ``min_tokens_to_keep=2*num_beams``
    (the warper keeps at least that many candidates so the 2N beam draws
    never run out of finite scores)."""
    if k <= 0:
        return logits
    k = min(max(k, min_tokens_to_keep), logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def apply_top_p(logits: jnp.ndarray, p: float,
                min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """HF TopPLogitsWarper: keep the smallest set of tokens whose cumulative
    probability exceeds p (the token crossing the threshold is kept); at
    least ``min_tokens_to_keep`` top tokens always survive (2*num_beams in
    beam modes)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # HF removes tokens with cumulative probability (from the top) > p:
    # in ascending order, remove sorted tokens with cum <= 1 - p
    sorted_keep = cum > (1.0 - p)
    # always keep the top min_tokens_to_keep (last in ascending order)
    keep = min(max(min_tokens_to_keep, 1), logits.shape[-1])
    sorted_keep = sorted_keep.at[..., -keep:].set(True)
    cutoff = jnp.min(jnp.where(sorted_keep, sorted_logits, jnp.inf), axis=-1,
                     keepdims=True)
    return jnp.where(logits < cutoff, -jnp.inf, logits)


def process_logits(logits: jnp.ndarray, seen: jnp.ndarray, *,
                   repetition_penalty: float = 1.0, temperature: float = 1.0,
                   top_k: int = 0, top_p: float = 1.0) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, seen, repetition_penalty)
    logits = apply_temperature(logits, temperature)
    logits = apply_top_k(logits, top_k)
    logits = apply_top_p(logits, top_p)
    return logits


def sample_token(key, logits: jnp.ndarray) -> jnp.ndarray:
    """Multinomial sample from processed logits; (B, V) -> (B,) int32."""
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def process_logits_per_row(logits: jnp.ndarray, seen: jnp.ndarray,
                           repetition_penalty: jnp.ndarray,
                           temperature: jnp.ndarray,
                           top_k: jnp.ndarray,
                           top_p: jnp.ndarray) -> jnp.ndarray:
    """Per-ROW variant of :func:`process_logits` for continuous-batching
    pools where every row carries its own decode parameters (all params are
    (B,) arrays; ``top_k <= 0`` disables top-k for that row, ``top_p >= 1``
    and ``temperature == 1`` are natural identities). Matches the scalar
    chain exactly when all rows share one config (parity test
    tests/test_sampling.py)."""
    logits = logits.astype(jnp.float32)
    b, v = logits.shape

    # repetition penalty (HF semantics) per row
    p = repetition_penalty.astype(jnp.float32)[:, None]
    penalized = jnp.where(logits < 0, logits * p, logits / p)
    logits = jnp.where(seen, penalized, logits)

    # temperature per row
    logits = logits / temperature.astype(jnp.float32)[:, None]

    # top-k per row: keep ranks < k (ties at the kth value kept, like the
    # scalar `logits < kth -> -inf` rule)
    sorted_desc = -jnp.sort(-logits, axis=-1)
    k = jnp.where(top_k <= 0, v, top_k).astype(jnp.int32)
    k = jnp.clip(k, 1, v)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    logits = jnp.where(logits < kth, -jnp.inf, logits)

    # top-p per row (HF TopPLogitsWarper, min_tokens_to_keep=1); p >= 1 rows
    # keep everything EXACTLY (not via cum > 0, where float32 softmax
    # underflow could mask tokens ~90+ logits below the row max)
    sorted_asc = jnp.sort(logits, axis=-1)
    probs = jax.nn.softmax(sorted_asc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    p_row = top_p.astype(jnp.float32)[:, None]
    sorted_keep = (cum > (1.0 - p_row)) | (p_row >= 1.0)
    sorted_keep = sorted_keep.at[..., -1].set(True)
    cutoff = jnp.min(jnp.where(sorted_keep, sorted_asc, jnp.inf), axis=-1,
                     keepdims=True)
    return jnp.where(logits < cutoff, -jnp.inf, logits)
