"""Sampling logit-transform parity vs HF transformers processors/warpers."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from genvc_tpu.ops import sampling


def test_repetition_penalty_matches_hf():
    from transformers import RepetitionPenaltyLogitsProcessor

    rng = np.random.default_rng(0)
    vocab = 50
    logits = rng.standard_normal((1, vocab)).astype(np.float32)
    input_ids = torch.tensor([[1, 1, 1, 7, 20, 33]])
    proc = RepetitionPenaltyLogitsProcessor(penalty=2.0)
    ref = proc(input_ids, torch.from_numpy(logits.copy())).numpy()

    seen = np.zeros((1, vocab), bool)
    seen[0, [1, 7, 20, 33]] = True
    got = sampling.apply_repetition_penalty(jnp.asarray(logits),
                                            jnp.asarray(seen), 2.0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


def test_top_k_matches_hf():
    from transformers import TopKLogitsWarper

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 100)).astype(np.float32)
    ref = TopKLogitsWarper(top_k=15)(None, torch.from_numpy(logits.copy())).numpy()
    got = np.asarray(sampling.apply_top_k(jnp.asarray(logits), 15))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_top_p_matches_hf():
    from transformers import TopPLogitsWarper

    rng = np.random.default_rng(2)
    logits = (rng.standard_normal((3, 40)) * 2).astype(np.float32)
    ref = TopPLogitsWarper(top_p=0.85)(None, torch.from_numpy(logits.copy())).numpy()
    got = np.asarray(sampling.apply_top_p(jnp.asarray(logits), 0.85))
    # same kept set (both use -inf for filtered)
    np.testing.assert_array_equal(np.isinf(got), np.isinf(ref))
    np.testing.assert_allclose(got[~np.isinf(got)], ref[~np.isinf(ref)],
                               rtol=1e-6)


def test_full_chain_matches_hf():
    from transformers import (RepetitionPenaltyLogitsProcessor,
                              TemperatureLogitsWarper, TopKLogitsWarper,
                              TopPLogitsWarper)

    rng = np.random.default_rng(3)
    vocab = 1026
    logits = (rng.standard_normal((1, vocab)) * 3).astype(np.float32)
    input_ids = torch.tensor([[1] * 10 + [1024, 5, 900]])
    x = torch.from_numpy(logits.copy())
    x = RepetitionPenaltyLogitsProcessor(2.0)(input_ids, x)
    x = TemperatureLogitsWarper(0.85)(input_ids, x)
    x = TopKLogitsWarper(15)(input_ids, x)
    ref = TopPLogitsWarper(0.85)(input_ids, x).numpy()

    seen = np.zeros((1, vocab), bool)
    seen[0, [1, 1024, 5, 900]] = True
    got = np.asarray(sampling.process_logits(
        jnp.asarray(logits), jnp.asarray(seen), repetition_penalty=2.0,
        temperature=0.85, top_k=15, top_p=0.85))
    np.testing.assert_array_equal(np.isinf(got), np.isinf(ref))
    np.testing.assert_allclose(got[~np.isinf(got)], ref[~np.isinf(ref)],
                               rtol=1e-5)


def test_per_row_chain_matches_scalar():
    """process_logits_per_row with every row sharing one config must equal
    the scalar chain; with per-row configs each row must equal the scalar
    chain run at that row's config."""
    rng = np.random.default_rng(5)
    b, v = 4, 64
    logits = jnp.asarray(rng.standard_normal((b, v)) * 3, jnp.float32)
    seen = jnp.asarray(rng.random((b, v)) < 0.2)

    configs = [
        dict(repetition_penalty=2.0, temperature=0.85, top_k=15, top_p=0.85),
        dict(repetition_penalty=1.0, temperature=1.0, top_k=0, top_p=1.0),
        dict(repetition_penalty=1.5, temperature=0.5, top_k=1, top_p=1.0),
        dict(repetition_penalty=1.0, temperature=1.3, top_k=40, top_p=0.4),
    ]
    # uniform rows
    for cfg in configs:
        want = sampling.process_logits(logits, seen, **cfg)
        got = sampling.process_logits_per_row(
            logits, seen,
            repetition_penalty=jnp.full((b,), cfg["repetition_penalty"]),
            temperature=jnp.full((b,), cfg["temperature"]),
            top_k=jnp.full((b,), cfg["top_k"], jnp.int32),
            top_p=jnp.full((b,), cfg["top_p"]))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
    # mixed rows: row i under configs[i]
    got = sampling.process_logits_per_row(
        logits, seen,
        repetition_penalty=jnp.asarray(
            [c["repetition_penalty"] for c in configs]),
        temperature=jnp.asarray([c["temperature"] for c in configs]),
        top_k=jnp.asarray([c["top_k"] for c in configs], jnp.int32),
        top_p=jnp.asarray([c["top_p"] for c in configs]))
    for i, cfg in enumerate(configs):
        want = sampling.process_logits(logits[i : i + 1], seen[i : i + 1],
                                       **cfg)
        np.testing.assert_allclose(np.asarray(got[i : i + 1]),
                                   np.asarray(want), atol=1e-6)
