"""Beam-search decode parity: engine.decode_beam (jitted, KV-cached, with
cache reordering) vs an independent numpy beam search driven by full-sequence
forwards (no cache). Covers the reference's ``num_beams > 1`` /
``length_penalty`` decode surface (HiFiGANTrainer.inference,
trainers/hifigan_trainer.py:458-470; vendored HF beam_search,
layers/stream_generator.py:44-643)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genvc_tpu.decode import engine
from genvc_tpu.models import gpt as gpt_model
from genvc_tpu.ops import nn

from test_gpt_parity import SMALL, hf_to_core, make_hf_gpt2


@pytest.fixture(scope="module")
def model():
    cfg = SMALL
    hf = make_hf_gpt2(cfg)
    params, _ = hf_to_core(hf, cfg)
    rng = np.random.default_rng(3)
    text = jnp.asarray(rng.integers(0, 256, (1, 10)), jnp.int32)
    text_len = jnp.asarray([10], jnp.int32)
    cond = jnp.asarray(rng.standard_normal((1, 32, cfg.model_dim)) * 0.1,
                       jnp.float32)
    prefix, valid = gpt_model.build_prefix_emb(params, cfg, cond, text,
                                               text_len)
    return cfg, params, cond, text, text_len, prefix, valid


def _make_step_logits(cfg, params, prefix, valid, max_new):
    """Full-forward logits at the position after [prefix|start|toks] — fixed
    width (single compile), masked beyond the true length."""
    start = cfg.start_audio_token
    width = max_new + 1

    @jax.jit
    def f(toks_padded, n_toks):
        seq = jnp.concatenate([jnp.asarray([start]), toks_padded])
        emb = params["mel_embedding"][seq][None] + \
            params["mel_pos"][None, :width]
        full = jnp.concatenate([prefix, emb], axis=1)
        kv = jnp.concatenate(
            [valid, jnp.arange(width)[None] <= n_toks], axis=1)
        h = gpt_model.core_forward(params["core"], full, cfg, key_valid=kv)
        enc = nn.layer_norm(params["final_norm"],
                            h[:, prefix.shape[1] + n_toks])
        return nn.linear(params["mel_head"], enc)[0]

    def step_logits(toks):
        padded = np.zeros((max_new,), np.int32)
        padded[: len(toks)] = toks
        return np.asarray(f(jnp.asarray(padded), jnp.int32(len(toks))),
                          np.float64)

    return step_logits


def _numpy_beam(step_logits, *, num_beams, length_penalty, rep_pen, max_new,
                prefix_fake_len, stop, base_seen):
    """Independent HF-semantics beam search on raw per-step logits."""
    def log_softmax(x):
        m = x.max()
        e = np.exp(x - m)
        return (x - m) - np.log(e.sum())

    seqs, scores = [[]], [0.0]
    finished = []  # (norm_score, tokens, len)
    s = 0
    while s < max_new:
        # early-stop heuristic (matches engine.decode_beam's rule)
        if len(finished) >= num_beams:
            top_fin = sorted(finished, key=lambda x: -x[0])[:num_beams]
            worst_fin = top_fin[-1][0]
            best_possible = max(scores) / (
                max(prefix_fake_len + s, 1.0) ** length_penalty)
            if worst_fin >= best_possible:
                break
        cands = []
        for toks, sc in zip(seqs, scores):
            logits = step_logits(toks)
            # HF beam modes apply the repetition-penalty processor to the
            # log-softmaxed scores (not the raw logits)
            logp = log_softmax(logits)
            seen = set(base_seen) | set(toks)
            for t in seen:
                logp[t] = logp[t] * rep_pen if logp[t] < 0 else logp[t] / rep_pen
            for t in np.argsort(-logp)[: 2 * num_beams]:
                cands.append((sc + logp[t], toks, int(t)))
        cands.sort(key=lambda c: -c[0])
        cands = cands[: 2 * num_beams]
        next_seqs, next_scores = [], []
        for rank, (sc, toks, t) in enumerate(cands):
            if t == stop:
                if rank < num_beams:
                    norm = max(prefix_fake_len + s, 1.0) ** length_penalty
                    finished.append((sc / norm, list(toks), s))
                continue
            if len(next_seqs) < num_beams:
                next_seqs.append(list(toks) + [t])
                next_scores.append(sc)
        seqs, scores = next_seqs, next_scores
        s += 1
    for toks, sc in zip(seqs, scores):
        norm = max(prefix_fake_len + s, 1.0) ** length_penalty
        finished.append((sc / norm, list(toks), s))
    finished.sort(key=lambda x: -x[0])
    return finished[0]


@pytest.mark.parametrize("num_beams,length_penalty,rep_pen",
                         [(2, 1.0, 1.0), (3, 1.8, 2.0), (3, 0.0, 1.0)])
def test_decode_beam_matches_numpy_reference(model, num_beams,
                                             length_penalty, rep_pen):
    cfg, params, cond, text, text_len, prefix, valid = model
    max_new = 12
    prefix_fake_len = prefix.shape[1] + 1

    nb = num_beams
    prefix_t = jnp.broadcast_to(prefix, (nb,) + prefix.shape[1:])
    valid_t = jnp.broadcast_to(valid, (nb, valid.shape[1]))
    state = engine.init_state(cfg, prefix.shape[1], nb, cfg.heads,
                              cfg.model_dim // cfg.heads, jax.random.key(0),
                              cache_dtype=jnp.float32)
    beam_jit = jax.jit(lambda p, st, pe, pv: engine.decode_beam(
        p, cfg, st, pe, pv, max_new=max_new, num_beams=nb,
        length_penalty=length_penalty, repetition_penalty=rep_pen,
        prefix_fake_len=prefix_fake_len))
    buf, n_tok = beam_jit(params, state, prefix_t, valid_t)
    got = list(np.asarray(buf)[: int(n_tok)])
    if got and got[-1] == cfg.stop_audio_token:
        got = got[:-1]

    step_logits = _make_step_logits(cfg, params, prefix, valid, max_new)
    base_seen = {1, cfg.start_audio_token}
    _, want, _ = _numpy_beam(
        step_logits, num_beams=nb, length_penalty=length_penalty,
        rep_pen=rep_pen, max_new=max_new, prefix_fake_len=prefix_fake_len,
        stop=cfg.stop_audio_token, base_seen=base_seen)
    assert got == want


def _hf_top_p(warped, top_p, min_keep):
    """HF TopPLogitsWarper rule per row (min_tokens_to_keep=min_keep); rows
    with no finite entry pass through (engine's masked comparisons do the
    same)."""
    out = warped.copy()
    for i in range(out.shape[0]):
        row = out[i]
        if not np.isfinite(row).any():
            continue
        asc = np.sort(row)
        e = np.exp(asc - np.max(asc[np.isfinite(asc)]))
        cum = np.cumsum(e / e.sum())
        keep = cum > (1.0 - top_p)
        keep[-min_keep:] = True
        cutoff = asc[keep].min()
        row[row < cutoff] = -np.inf
    return out


def _numpy_beam_sample(step_logits, *, num_beams, length_penalty, rep_pen,
                       temp, top_k_warp, top_p, max_new, prefix_fake_len,
                       stop, base_seen, noise_fn, vocab):
    """Independent HF ``beam_sample`` on raw per-step logits: warpers applied
    to the score-added log-probs, candidates drawn by Gumbel-top-k with the
    SAME noise the engine uses (``noise_fn(s)``), sorted by warped score."""
    def log_softmax(x):
        m = x.max()
        e = np.exp(x - m)
        return (x - m) - np.log(e.sum())

    nb = num_beams
    seqs = [[] for _ in range(nb)]
    scores = np.full((nb,), -np.inf)
    scores[0] = 0.0
    finished = []
    s = 0
    while s < max_new:
        if len(finished) >= nb:
            top_fin = sorted(finished, key=lambda x: -x[0])[:nb]
            best_possible = scores.max() / (
                max(prefix_fake_len + s, 1.0) ** length_penalty)
            if top_fin[-1][0] >= best_possible:
                break
        cand = np.full((nb, vocab), -np.inf)
        for i in range(nb):
            if not np.isfinite(scores[i]):
                continue
            logp = log_softmax(step_logits(seqs[i]))
            seen = set(base_seen) | set(seqs[i])
            for t in seen:
                logp[t] = logp[t] * rep_pen if logp[t] < 0 else logp[t] / rep_pen
            cand[i] = scores[i] + logp
        warped = cand / temp
        if top_k_warp > 0:
            # HF beam-mode warpers: min_tokens_to_keep = 2*num_beams
            k_eff = max(top_k_warp, 2 * nb)
            for i in range(nb):
                kth = np.sort(warped[i])[-k_eff]
                warped[i][warped[i] < kth] = -np.inf
        if top_p < 1.0:
            warped = _hf_top_p(warped, top_p, 2 * nb)
        flat = warped.reshape(-1)
        noisy = flat + noise_fn(s)
        drawn = np.argsort(-noisy, kind="stable")[: 2 * nb]
        dscores = flat[drawn]
        order = np.argsort(-dscores, kind="stable")
        top_idx, top_scores = drawn[order], dscores[order]

        next_seqs, next_scores = [], []
        for rank in range(2 * nb):
            parent, t = divmod(int(top_idx[rank]), vocab)
            sc = float(top_scores[rank])
            if t == stop:
                if rank < nb:
                    norm = max(prefix_fake_len + s, 1.0) ** length_penalty
                    finished.append((sc / norm, list(seqs[parent]), s))
                continue
            if len(next_seqs) < nb:
                next_seqs.append(list(seqs[parent]) + [t])
                next_scores.append(sc)
        seqs = next_seqs
        scores = np.asarray(next_scores)
        s += 1
    for toks, sc in zip(seqs, scores):
        norm = max(prefix_fake_len + s, 1.0) ** length_penalty
        finished.append((sc / norm, list(toks), s))
    finished.sort(key=lambda x: -x[0])
    return finished[0]


@pytest.mark.parametrize("num_beams,temp,top_k_warp,top_p,lp,rep_pen",
                         [(2, 1.3, 8, 1.0, 1.0, 1.0),
                          (3, 0.9, 0, 0.9, 1.8, 2.0),
                          # top_k=1 < 2*nb: min_tokens_to_keep floor active
                          # (the README-recommended top_k for quality)
                          (2, 1.0, 1, 1.0, 1.0, 1.0)])
def test_decode_beam_sample_matches_numpy_reference(model, num_beams, temp,
                                                    top_k_warp, top_p, lp,
                                                    rep_pen):
    """HF beam_sample (do_sample=True, num_beams>1) parity: engine vs numpy
    oracle consuming the identical Gumbel noise sequence."""
    cfg, params, cond, text, text_len, prefix, valid = model
    max_new = 12
    prefix_fake_len = prefix.shape[1] + 1
    v = cfg.num_audio_tokens

    nb = num_beams
    key = jax.random.key(42)
    prefix_t = jnp.broadcast_to(prefix, (nb,) + prefix.shape[1:])
    valid_t = jnp.broadcast_to(valid, (nb, valid.shape[1]))
    state = engine.init_state(cfg, prefix.shape[1], nb, cfg.heads,
                              cfg.model_dim // cfg.heads, key,
                              cache_dtype=jnp.float32)
    fn = jax.jit(lambda p, st, pe, pv: engine.decode_beam(
        p, cfg, st, pe, pv, max_new=max_new, num_beams=nb,
        length_penalty=lp, repetition_penalty=rep_pen,
        prefix_fake_len=prefix_fake_len, do_sample=True, temperature=temp,
        top_k=top_k_warp, top_p=top_p))
    buf, n_tok = fn(params, state, prefix_t, valid_t)
    got = list(np.asarray(buf)[: int(n_tok)])
    if got and got[-1] == cfg.stop_audio_token:
        got = got[:-1]

    def noise_fn(s):
        return np.asarray(jax.random.gumbel(
            jax.random.fold_in(key, s), (nb * v,), jnp.float32), np.float64)

    step_logits = _make_step_logits(cfg, params, prefix, valid, max_new)
    _, want, _ = _numpy_beam_sample(
        step_logits, num_beams=nb, length_penalty=lp, rep_pen=rep_pen,
        temp=temp, top_k_warp=top_k_warp, top_p=top_p, max_new=max_new,
        prefix_fake_len=prefix_fake_len, stop=cfg.stop_audio_token,
        base_seen={1, cfg.start_audio_token}, noise_fn=noise_fn, vocab=v)
    assert got == want


def test_pipeline_beam_surface(tmp_path_factory):
    """generate_segment_codes(num_beams>1) runs end-to-end and returns a
    deterministic token list (API surface of the reference inference)."""
    import sys
    sys.path.insert(0, "tests")
    from synthetic_bundle import write_bundle
    from genvc_tpu.inference.pipeline import model_init

    path = str(tmp_path_factory.mktemp("beam") / "tiny.pth")
    write_bundle(path)
    pipe = model_init(path)
    pipe.gen_cap_tokens_per_code = 1.0
    rng = np.random.default_rng(5)
    src = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    pipe._cond_latent = pipe.get_gpt_cond_latents(ref)
    codes, n = pipe.extract_content_codes(src)
    t1, _ = pipe.generate_segment_codes(codes, n, num_beams=3,
                                        length_penalty=1.2)
    t2, _ = pipe.generate_segment_codes(codes, n, num_beams=3,
                                        length_penalty=1.2)
    assert t1 == t2 and len(t1) > 0
    assert all(0 <= t < pipe.gpt_cfg.num_audio_tokens for t in t1)