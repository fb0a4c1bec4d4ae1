"""Contrastive-search decode parity: engine.decode_contrastive (jitted,
KV-cached, winner-slot cache broadcast) vs an independent numpy contrastive
search driven by full-sequence forwards (no cache). Covers the
``penalty_alpha > 0`` decode mode of the reference's vendored HF generator
(layers/stream_generator.py:264-276, 366-380) — the last mode of its routing
table (greedy/sample/beam already covered elsewhere).

HF semantics under test: processors (repetition penalty) -> softmax -> top-k
candidate probabilities; degeneration penalty = max cosine between a
candidate's post-ln_f hidden and ALL previous positions' hiddens (prompt
included, padded positions excluded); score = (1-alpha)*p - alpha*penalty.
"""

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
    rng = np.random.default_rng(7)
    text = jnp.asarray(rng.integers(0, 256, (1, 10)), jnp.int32)
    text_len = jnp.asarray([10], jnp.int32)
    cond = jnp.asarray(rng.standard_normal((1, 32, cfg.model_dim)) * 0.1,
                       jnp.float32)
    prefix, valid = gpt_model.build_prefix_emb(params, cfg, cond, text,
                                               text_len)
    return cfg, params, prefix, valid


def _make_step_outputs(cfg, params, prefix, valid, max_new):
    """Full-forward oracle: for [prefix | start | toks], return (logits at the
    last real position, post-ln_f hiddens of every position, validity mask).
    Fixed width (single compile), masked beyond the true length."""
    start = cfg.start_audio_token
    width = max_new + 1
    p = prefix.shape[1]

    @jax.jit
    def f(toks_padded, n_toks):
        seq = jnp.concatenate([jnp.asarray([start]), toks_padded])
        emb = params["mel_embedding"][seq][None] + \
            params["mel_pos"][None, :width]
        full = jnp.concatenate([prefix, emb], axis=1)
        kv = jnp.concatenate(
            [valid, jnp.arange(width)[None] <= n_toks], axis=1)
        h = gpt_model.core_forward(params["core"], full, cfg, key_valid=kv)
        enc = nn.layer_norm(params["final_norm"], h[:, p + n_toks])
        logits = nn.linear(params["mel_head"], enc)[0]
        return logits, h[0], kv[0]

    def step(toks):
        padded = np.zeros((max_new,), np.int32)
        padded[: len(toks)] = toks
        logits, h, kv = f(jnp.asarray(padded), jnp.int32(len(toks)))
        return (np.asarray(logits, np.float64), np.asarray(h, np.float64),
                np.asarray(kv))

    return step, p


def _numpy_contrastive(step, *, p, top_k, alpha, rep_pen, max_new, stop,
                       base_seen):
    """Independent HF-semantics contrastive search on full-forward outputs."""
    def softmax(x):
        e = np.exp(x - x.max())
        return e / e.sum()

    logits, h_all, kv = step([])
    # context = every valid position of [prefix | start]
    ctx = [h_all[i] for i in range(p + 1) if kv[i]]
    seen = set(base_seen)
    out = []
    s = 0
    while s < max_new:
        pl = logits.copy()
        for t in seen:
            pl[t] = pl[t] * rep_pen if pl[t] < 0 else pl[t] / rep_pen
        probs = softmax(pl)
        cands = np.argsort(-probs)[:top_k]
        best = None
        for c in cands:
            l_c, h_c_all, _ = step(out + [int(c)])
            h_c = h_c_all[p + 1 + s]
            cos = max(
                float(np.dot(h_c, x)
                      / max(np.linalg.norm(h_c) * np.linalg.norm(x), 1e-12))
                for x in ctx)
            score = (1.0 - alpha) * probs[c] - alpha * cos
            if best is None or score > best[0]:
                best = (score, int(c), l_c, h_c)
        _, c, logits, h_c = best
        out.append(c)
        seen.add(c)
        ctx.append(h_c)
        s += 1
        if c == stop:
            break
    return out


@pytest.mark.parametrize("top_k,alpha,rep_pen",
                         [(4, 0.6, 1.0), (3, 0.4, 2.0), (2, 0.9, 1.0)])
def test_decode_contrastive_matches_numpy_reference(model, top_k, alpha,
                                                    rep_pen):
    cfg, params, prefix, valid = model
    max_new = 12

    prefix_t = jnp.broadcast_to(prefix, (top_k,) + prefix.shape[1:])
    valid_t = jnp.broadcast_to(valid, (top_k, valid.shape[1]))
    state = engine.init_state(cfg, prefix.shape[1], top_k, cfg.heads,
                              cfg.model_dim // cfg.heads, jax.random.key(0),
                              cache_dtype=jnp.float32)
    fn = jax.jit(lambda pr, st, pe, pv: engine.decode_contrastive(
        pr, cfg, st, pe, pv, max_new=max_new, top_k=top_k,
        penalty_alpha=alpha, repetition_penalty=rep_pen))
    buf, n_tok = fn(params, state, prefix_t, valid_t)
    got = list(np.asarray(buf)[: int(n_tok)])

    step, p = _make_step_outputs(cfg, params, prefix, valid, max_new)
    want = _numpy_contrastive(
        step, p=p, top_k=top_k, alpha=alpha, rep_pen=rep_pen,
        max_new=max_new, stop=cfg.stop_audio_token,
        base_seen={1, cfg.start_audio_token})
    assert got == want


def test_pipeline_contrastive_surface(tmp_path_factory):
    """generate_segment_codes(penalty_alpha>0) runs end-to-end and returns a
    deterministic token list (API surface of the vendored generator)."""
    import sys
    sys.path.insert(0, "tests")
    from synthetic_bundle import write_bundle
    from genvc_tpu.inference.pipeline import model_init

    path = str(tmp_path_factory.mktemp("contrastive") / "tiny.pth")
    write_bundle(path)
    pipe = model_init(path)
    pipe.gen_cap_tokens_per_code = 1.0
    rng = np.random.default_rng(11)
    src = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    pipe._cond_latent = pipe.get_gpt_cond_latents(ref)
    codes, n = pipe.extract_content_codes(src)
    t1, _ = pipe.generate_segment_codes(codes, n, penalty_alpha=0.6,
                                        contrastive_top_k=3)
    t2, _ = pipe.generate_segment_codes(codes, n, penalty_alpha=0.6,
                                        contrastive_top_k=3)
    assert t1 == t2 and len(t1) > 0
    assert all(0 <= t < pipe.gpt_cfg.num_audio_tokens for t in t1)
