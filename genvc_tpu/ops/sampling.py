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


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0:
        return logits
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """HF TopPLogitsWarper: keep the smallest set of tokens whose cumulative
    probability exceeds p (the token crossing the threshold is kept)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # HF removes tokens with cumulative probability (from the top) > p:
    # in ascending order, remove sorted tokens with cum <= 1 - p
    sorted_keep = cum > (1.0 - p)
    # min_tokens_to_keep=1: always keep the argmax (last in ascending order)
    sorted_keep = sorted_keep.at[..., -1].set(True)
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
