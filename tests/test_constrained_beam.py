"""Constrained-beam-search parity: engine.decode_constrained (KV-cached
batched forwards + host bank bookkeeping) vs the REAL HF
``ConstrainedBeamSearchScorer`` (still shipped in transformers 4.57 core)
driven by the removed ``_constrained_beam_search`` protocol over full-forward
logits. Covers the ``constraints`` / ``force_words_ids`` route of the
reference's vendored generator (layers/stream_generator.py:260-276) —
unreachable from reference entry points, implemented for surface completeness.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genvc_tpu.decode import engine
from genvc_tpu.decode.constraints import PhraseListState, completes_all

from test_beam import model, _make_step_logits  # noqa: F401 (fixture)


def _hf_constrained(step_logits, *, constraints, num_beams, length_penalty,
                    rep_pen, max_new, fake_prefix, stop, vocab):
    """Oracle: the HF scorer itself, driven by the documented (pre-removal)
    driver protocol — log-softmax, rep-penalty processor, +beam scores,
    top 2*nb flat, scorer.process(scores_for_all_vocab), cache-free
    full-forward logits. ``decoder_prompt_len=0`` keeps the reference-era
    full-length normalization (vendored stream_generator semantics)."""
    import torch
    from transformers.generation.beam_search import ConstrainedBeamSearchScorer
    from transformers.generation import (PhrasalConstraint,
                                         RepetitionPenaltyLogitsProcessor)

    nb = num_beams
    cons = [PhrasalConstraint([int(t) for t in p]) for p in constraints]
    scorer = ConstrainedBeamSearchScorer(
        batch_size=1, num_beams=nb, constraints=cons,
        device=torch.device("cpu"), length_penalty=length_penalty,
        do_early_stopping=False)
    proc = (RepetitionPenaltyLogitsProcessor(rep_pen)
            if rep_pen != 1.0 else None)

    p = len(fake_prefix)
    input_ids = torch.tensor([list(fake_prefix)] * nb, dtype=torch.long)
    beam_scores = torch.zeros(nb)
    beam_scores[1:] = -1e9
    next_tokens = next_indices = None
    while input_ids.shape[-1] < p + max_new:
        logits = torch.stack([
            torch.tensor(step_logits(input_ids[i, p:].tolist()),
                         dtype=torch.float64)
            for i in range(nb)])
        next_scores = torch.log_softmax(logits, dim=-1)
        if proc is not None:
            next_scores = proc(input_ids, next_scores)
        next_scores = next_scores + beam_scores[:, None].double()
        scores_for_all_vocab = next_scores.clone().float()
        topv, topi = torch.topk(next_scores.view(1, nb * vocab), 2 * nb,
                                dim=1, largest=True, sorted=True)
        next_indices = torch.div(topi, vocab, rounding_mode="floor")
        next_tokens = topi % vocab
        out = scorer.process(input_ids, topv.float(), next_tokens,
                             next_indices, scores_for_all_vocab,
                             pad_token_id=stop, eos_token_id=stop,
                             decoder_prompt_len=0)
        beam_scores = out["next_beam_scores"]
        beam_idx = out["next_beam_indices"].long()
        beam_tokens = out["next_beam_tokens"].long()
        input_ids = torch.cat([input_ids[beam_idx], beam_tokens[:, None]],
                              dim=-1)
        if scorer.is_done:
            break
    seq_out = scorer.finalize(input_ids, beam_scores, next_tokens,
                              next_indices, max_length=p + max_new,
                              pad_token_id=stop, eos_token_id=stop,
                              decoder_prompt_len=0)
    gen = seq_out["sequences"][0].tolist()[p:]
    if gen and gen[-1] == stop:
        gen = gen[:-1]
    return gen


@pytest.mark.parametrize(
    "num_beams,length_penalty,rep_pen,constraints",
    [
        (2, 1.0, 1.0, [[7, 9]]),
        (3, 1.8, 2.0, [[5], [11, 3]]),
        (2, 1.0, 1.0, [[123, 77, 9]]),
        # phrase on the natural continuation path -> completes, exercising
        # the completed-hypothesis finalize branch
        (2, 1.0, 1.0, [[868, 245]]),
    ],
)
def test_decode_constrained_matches_hf_scorer(model, num_beams,  # noqa: F811
                                              length_penalty, rep_pen,
                                              constraints):
    cfg, params, cond, text, text_len, prefix, valid = model
    max_new = 10
    prefix_fake_len = prefix.shape[1] + 1
    nb = num_beams

    prefix_t = jnp.broadcast_to(prefix, (nb,) + prefix.shape[1:])
    valid_t = jnp.broadcast_to(valid, (nb, valid.shape[1]))
    state = engine.init_state(cfg, prefix.shape[1], nb, cfg.heads,
                              cfg.model_dim // cfg.heads, jax.random.key(0),
                              cache_dtype=jnp.float32)
    buf, n_tok = engine.decode_constrained(
        params, cfg, state, prefix_t, valid_t, max_new=max_new,
        num_beams=nb, constraints=constraints,
        length_penalty=length_penalty, repetition_penalty=rep_pen,
        prefix_fake_len=prefix_fake_len)
    got = list(np.asarray(buf)[: int(n_tok)])
    if got and got[-1] == cfg.stop_audio_token:
        got = got[:-1]

    step_logits = _make_step_logits(cfg, params, prefix, valid, max_new)
    fake_prefix = [1] * (prefix_fake_len - 1) + [cfg.start_audio_token]
    want = _hf_constrained(
        step_logits, constraints=constraints, num_beams=nb,
        length_penalty=length_penalty, rep_pen=rep_pen, max_new=max_new,
        fake_prefix=fake_prefix, stop=cfg.stop_audio_token,
        vocab=cfg.num_audio_tokens)
    assert got == want
    # when the oracle's winner satisfies the constraints, ours must too (HF's
    # finalize fallback can legitimately return an unconstrained beam when no
    # hypothesis completes within max_new — parity covers that case above)
    if completes_all(constraints, want):
        assert completes_all(constraints, got)


@pytest.mark.fast
def test_phrase_list_state_semantics():
    """Tracker parity vs HF's ConstraintListState on random token streams."""
    from transformers.generation.beam_constraints import (ConstraintListState,
                                                          PhrasalConstraint)

    rng = np.random.default_rng(0)
    phrases = [[3, 4, 5], [7], [4, 9]]
    for _ in range(50):
        seq = rng.integers(0, 12, size=rng.integers(1, 15)).tolist()
        ours = PhraseListState(phrases)
        ours.reset(seq)
        theirs = ConstraintListState(
            [PhrasalConstraint(list(p)) for p in phrases])
        theirs.reset([int(t) for t in seq])
        assert ours.completed == theirs.completed, seq
        assert ours.get_bank() == theirs.get_bank(), seq
        adv_ours = sorted(ours.advance())
        adv_theirs = sorted(theirs.advance() or [])
        assert adv_ours == adv_theirs, seq
