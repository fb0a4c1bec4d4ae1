"""Group (diverse) beam-search parity: engine.decode_group_beam (jitted,
KV-cached, cache-reordering) vs the REAL HF ``BeamSearchScorer`` group mode +
``HammingDiversityLogitsProcessor`` (both still shipped in transformers 4.57
core) driven by the removed ``_group_beam_search`` protocol over full-forward
logits. Covers the ``num_beam_groups > 1`` route of the reference's vendored
generator (layers/stream_generator.py:308-317) — the last routed decode mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genvc_tpu.decode import engine

from test_beam import model, _make_step_logits  # noqa: F401 (fixture)


def _hf_group_beam(step_logits, *, num_beams, num_beam_groups,
                   diversity_penalty, length_penalty, rep_pen, max_new,
                   fake_prefix, stop, vocab):
    """Oracle: the HF scorer itself, driven by the documented (pre-removal)
    ``_group_beam_search`` protocol — per step one logits batch for all
    beams, then groups select sequentially: log-softmax, Hamming-diversity
    processor (penalizing tokens chosen by previous groups THIS step), then
    the repetition-penalty processor (HF's ``_get_logits_processor`` order),
    + beam scores, top 2*group_size flat, ``scorer.process(group_index=g)``.
    ``decoder_prompt_len=0`` keeps the reference-era full-length
    normalization (vendored stream_generator semantics)."""
    import torch
    from transformers.generation.beam_search import BeamSearchScorer
    from transformers.generation.logits_process import (
        HammingDiversityLogitsProcessor, RepetitionPenaltyLogitsProcessor)

    nb, G = num_beams, num_beam_groups
    gs = nb // G
    scorer = BeamSearchScorer(
        batch_size=1, num_beams=nb, device=torch.device("cpu"),
        length_penalty=length_penalty, do_early_stopping=False,
        num_beam_groups=G)
    div_proc = HammingDiversityLogitsProcessor(
        diversity_penalty, num_beams=nb, num_beam_groups=G)
    rep_proc = (RepetitionPenaltyLogitsProcessor(rep_pen)
                if rep_pen != 1.0 else None)

    p = len(fake_prefix)
    input_ids = torch.tensor([list(fake_prefix)] * nb, dtype=torch.long)
    beam_scores = torch.full((1, nb), -1e9)
    beam_scores[:, ::gs] = 0
    beam_scores = beam_scores.view(nb)
    next_tokens = next_indices = None
    while input_ids.shape[-1] < p + max_new:
        logits = torch.stack([
            torch.tensor(step_logits(input_ids[i, p:].tolist()),
                         dtype=torch.float64)
            for i in range(nb)])
        current_tokens = torch.zeros(nb, dtype=torch.long)
        for g in range(G):
            idx = slice(g * gs, (g + 1) * gs)
            group_input_ids = input_ids[idx]
            next_scores = torch.log_softmax(logits[idx], dim=-1)
            next_scores = div_proc(group_input_ids, next_scores,
                                   current_tokens=current_tokens,
                                   beam_group_idx=g)
            if rep_proc is not None:
                next_scores = rep_proc(group_input_ids, next_scores)
            next_scores = next_scores + beam_scores[idx][:, None].double()
            topv, topi = torch.topk(next_scores.view(1, gs * vocab), 2 * gs,
                                    dim=1, largest=True, sorted=True)
            next_indices = torch.div(topi, vocab, rounding_mode="floor")
            next_tokens = topi % vocab
            out = scorer.process(group_input_ids, topv.float(), next_tokens,
                                 next_indices, pad_token_id=stop,
                                 eos_token_id=stop, group_index=g,
                                 decoder_prompt_len=0)
            beam_scores[idx] = out["next_beam_scores"]
            beam_idx = out["next_beam_indices"].long()
            beam_tokens = out["next_beam_tokens"].long()
            # HF: rows reorder to parents now; the chosen tokens append once
            # after ALL groups (input_ids grows one column per step)
            input_ids[idx] = group_input_ids[beam_idx]
            current_tokens[idx] = beam_tokens
        input_ids = torch.cat([input_ids, current_tokens[:, None]], dim=-1)
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
    "num_beams,num_beam_groups,diversity_penalty,length_penalty,rep_pen",
    [
        (2, 2, 1.0, 1.0, 1.0),    # gs=1: pure diversity-driven divergence
        (4, 2, 0.5, 1.0, 1.0),    # 2 groups of 2
        (4, 4, 2.0, 1.8, 2.0),    # strong penalty + length/rep penalties
        (6, 3, 1.0, 1.2, 1.0),    # 3 groups of 2
    ],
)
def test_decode_group_beam_matches_hf_scorer(model, num_beams,  # noqa: F811
                                             num_beam_groups,
                                             diversity_penalty,
                                             length_penalty, rep_pen):
    cfg, params, cond, text, text_len, prefix, valid = model
    max_new = 10
    prefix_fake_len = prefix.shape[1] + 1
    nb = num_beams

    prefix_t = jnp.broadcast_to(prefix, (nb,) + prefix.shape[1:])
    valid_t = jnp.broadcast_to(valid, (nb, valid.shape[1]))
    state = engine.init_state(cfg, prefix.shape[1], nb, cfg.heads,
                              cfg.model_dim // cfg.heads, jax.random.key(0),
                              cache_dtype=jnp.float32)
    fn = jax.jit(lambda p, st, pe, pv: engine.decode_group_beam(
        p, cfg, st, pe, pv, max_new=max_new, num_beams=nb,
        num_beam_groups=num_beam_groups,
        diversity_penalty=diversity_penalty, length_penalty=length_penalty,
        repetition_penalty=rep_pen, prefix_fake_len=prefix_fake_len))
    buf, n_tok = fn(params, state, prefix_t, valid_t)
    got = list(np.asarray(buf)[: int(n_tok)])
    if got and got[-1] == cfg.stop_audio_token:
        got = got[:-1]

    step_logits = _make_step_logits(cfg, params, prefix, valid, max_new)
    fake_prefix = [1] * (prefix_fake_len - 1) + [cfg.start_audio_token]
    want = _hf_group_beam(
        step_logits, num_beams=nb, num_beam_groups=num_beam_groups,
        diversity_penalty=diversity_penalty, length_penalty=length_penalty,
        rep_pen=rep_pen, max_new=max_new, fake_prefix=fake_prefix,
        stop=cfg.stop_audio_token, vocab=cfg.num_audio_tokens)
    assert got == want


def test_group_beam_requires_divisible_groups(model):  # noqa: F811
    cfg, params, cond, text, text_len, prefix, valid = model
    state = engine.init_state(cfg, prefix.shape[1], 3, cfg.heads,
                              cfg.model_dim // cfg.heads, jax.random.key(0),
                              cache_dtype=jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        engine.decode_group_beam(
            params, cfg, state,
            jnp.broadcast_to(prefix, (3,) + prefix.shape[1:]),
            jnp.broadcast_to(valid, (3, valid.shape[1])),
            max_new=4, num_beams=3, num_beam_groups=2)
