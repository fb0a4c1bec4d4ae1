"""Static-shape autoregressive decode engine with KV cache.

Replaces the reference's HF ``generate`` / monkey-patched Python generator
(layers/gpt_inference.py, layers/stream_generator.py) with a TPU-native design:

* a preallocated KV cache pytree (layer-stacked, static length),
* one jitted ``prefill`` that embeds the [cond | text | start_audio] prefix,
  fills the cache, and samples the first audio code,
* one jitted ``decode_chunk`` that runs N decode steps under ``lax.scan``,
  emitting N (token, latent) pairs per device call — the streaming consumer
  reads completed chunks instead of a per-token Python yield, so there is no
  host↔device sync inside the hot loop.

Semantics mirrored from the reference decode path:
* mel positional index of the t-th AR input = t (gpt_inference.py:92-96),
* latent yielded with token t is ``final_norm`` of the post-ln_f hidden at the
  position that *generated* t (stream_generator.py:865),
* finished rows emit ``stop_audio_token`` (pad token) forever,
* sampling chain: repetition penalty over all previously seen ids (including
  the fake prefix ids = 1 and start_audio), then temperature → top-k → top-p,
  then multinomial (stream_generator.py:837-858).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.models import gpt as gpt_model
from genvc_tpu.ops import nn, sampling


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    temperature: float = 0.85
    top_k: int = 15
    top_p: float = 0.85
    repetition_penalty: float = 2.0
    do_sample: bool = True


class DecodeState(NamedTuple):
    cache_k: jnp.ndarray      # (L, B, H, T, hd)
    cache_v: jnp.ndarray      # (L, B, H, T, hd)
    key_valid: jnp.ndarray    # (B, T) bool — filled & unmasked cache slots
    cur_index: jnp.ndarray    # () int32 — next cache slot to write; (B,) in
                              # per-row mode (continuous-batching slot pools,
                              # where rows sit at different decode depths)
    n_generated: jnp.ndarray  # () int32 — number of audio tokens sampled;
                              # (B,) in per-row mode
    last_token: jnp.ndarray   # (B,) int32
    seen: jnp.ndarray         # (B, V) bool — repetition-penalty state
    finished: jnp.ndarray     # (B,) bool
    rng: jax.Array


def cache_size(cfg: gpt_model.GPTConfig, prefix_width: int,
               gen_tokens: int | None = None) -> int:
    """Static KV-cache length: prefix + start_audio + generation capacity,
    rounded up to a 128 multiple (TPU lane tiling). ``gen_tokens`` overrides
    the architectural max (``cfg.max_gen_mel_tokens``) when the caller bounds
    generation below it (serving caps): every decode step reads the whole
    static cache, so right-sizing it is a direct HBM-bandwidth win."""
    gen = cfg.max_gen_mel_tokens if gen_tokens is None else gen_tokens
    raw = prefix_width + 1 + gen
    return int(np.ceil(raw / 128) * 128)


def _attend_cached(bp, h, state_k, state_v, layer_idx, cur_index, key_valid,
                   heads, fused=False):
    """One block forward for a single token, reading/writing the cache.

    ``cur_index`` scalar: all rows write the same cache slot (lockstep decode;
    one cheap ``dynamic_update_slice``). ``cur_index`` (B,): per-row write
    positions (continuous-batching pools; lowers to a scatter — the write is
    B*H*hd elements per layer, negligible next to the full-cache read).

    ``fused``: read the cache through the Pallas fused decode-attention
    kernel (ops.decode_attention) — in-register fp8->bf16 upcast instead of
    a materialized convert; no-op off TPU."""
    x = nn.layer_norm(bp["ln_1"], h)
    qkv = nn.linear(bp["attn"]["c_attn"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    b = h.shape[0]
    hd = h.shape[-1] // heads
    q = q.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)

    if cur_index.ndim == 0:
        state_k = jax.lax.dynamic_update_slice(
            state_k, k.astype(state_k.dtype)[None],
            (layer_idx, 0, 0, cur_index, 0))
        state_v = jax.lax.dynamic_update_slice(
            state_v, v.astype(state_v.dtype)[None],
            (layer_idx, 0, 0, cur_index, 0))
    else:
        rows = jnp.arange(b)
        state_k = state_k.at[layer_idx, rows, :, cur_index, :].set(
            k[:, :, 0, :].astype(state_k.dtype))
        state_v = state_v.at[layer_idx, rows, :, cur_index, :].set(
            v[:, :, 0, :].astype(state_v.dtype))

    # fused-path gates (beyond the backend check):
    # * f32 caches stay on the XLA branch — the kernel computes in bf16, so
    #   engaging it under an f32 cache/compute pipeline would silently change
    #   decode numerics (token argmax can flip) vs the materialized f32 path;
    # * Mosaic's trailing-dim block rule needs hd a 128 multiple and the
    #   cache length an 8 multiple — other geometries (e.g. hd=64) fall back
    #   instead of failing pallas_call compilation;
    # * per-row position states (continuous-batching pools) stay on the XLA
    #   branch: the per-row cache write is a scatter, and scatter-output ->
    #   full-stacked-cache pallas operand defeats XLA's in-place aliasing —
    #   measured 6.4x SLOWER pool ticks (103.6 -> 662.6 ms at a full
    #   16-slot pool, interleaved A/B tools/ab_serving_drain.py; round 4's
    #   serving drain regression, VERDICT r4 item 2). An in-kernel-write
    #   variant (ops.decode_attention_update_layer: masked row replacement
    #   + aliased slab flush, token-exact) measured 122.5 vs 108.5 ms/tick
    #   bf16 and lost aliasing through the f8 bitcasts entirely (720 ms) —
    #   kept as a tested, documented negative result (ROUND5_NOTES); the
    #   XLA per-row path with int8 weights + fp8 cache is the fastest pool
    #   configuration measured (96.2 ms/tick).
    fused = (fused and state_k.dtype != jnp.float32
             and cur_index.ndim == 0
             and hd % 128 == 0 and state_k.shape[3] % 8 == 0)
    if fused and jax.default_backend() == "tpu":
        from genvc_tpu.ops import decode_attention as da
        bias2 = jnp.where(key_valid, 0.0, nn.NEG_INF).astype(jnp.float32)
        # layer-indexed kernel reads the FULL stacked cache via a
        # scalar-prefetched index_map — no materialized per-layer slice
        out = da.decode_attention_layer(q[:, :, 0, :], state_k, state_v,
                                        bias2, layer_idx)  # (B, H, hd)
        out = out.reshape(b, 1, heads * hd)
    else:
        ck = jax.lax.dynamic_index_in_dim(state_k, layer_idx, 0,
                                          keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(state_v, layer_idx, 0,
                                          keepdims=False)
        bias = nn.key_padding_bias(key_valid)
        out = nn.attention(q, ck.astype(q.dtype), cv.astype(q.dtype),
                           bias=bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, heads * hd)
    h = h + nn.linear(bp["attn"]["c_proj"], out)
    x = nn.layer_norm(bp["ln_2"], h)
    x = nn.gelu_new(nn.linear(bp["mlp"]["c_fc"], x))
    h = h + nn.linear(bp["mlp"]["c_proj"], x)
    return h, state_k, state_v


def _decode_forward(params, cfg, state: DecodeState):
    """One AR forward (no sampling): embed last token, run the cached stack.
    Returns (cache_k, cache_v, key_valid, latent, logits, hidden) where
    ``hidden`` is the post-``ln_f`` (pre-``final_norm``) hidden state — what
    HF surfaces as ``hidden_states[-1]`` and contrastive search's
    degeneration penalty consumes."""
    compute_dtype = params["mel_embedding"].dtype
    tok_emb = params["mel_embedding"][state.last_token]
    pos_emb = params["mel_pos"][state.n_generated]  # (D,) or per-row (B, D)
    h = (tok_emb + pos_emb)[:, None, :].astype(compute_dtype)

    if state.cur_index.ndim == 0:
        key_valid = state.key_valid.at[:, state.cur_index].set(True)
    else:
        rows = jnp.arange(state.key_valid.shape[0])
        key_valid = state.key_valid.at[rows, state.cur_index].set(True)

    def body(carry, bp_with_idx):
        h, ck, cv, idx = carry
        h, ck, cv = _attend_cached(bp_with_idx, h, ck, cv, idx,
                                   state.cur_index, key_valid, cfg.heads,
                                   fused=cfg.fused_decode_attention)
        return (h, ck, cv, idx + 1), None

    (h, cache_k, cache_v, _), _ = jax.lax.scan(
        body, (h, state.cache_k, state.cache_v, jnp.int32(0)),
        params["core"]["blocks"])
    h = nn.layer_norm(params["core"]["ln_f"], h)
    hidden = h[:, 0].astype(jnp.float32)
    latent = nn.layer_norm(params["final_norm"], h[:, 0]).astype(jnp.float32)
    logits = nn.linear(params["mel_head"], latent.astype(jnp.float32))
    return cache_k, cache_v, key_valid, latent, logits, hidden


def _select_token(key, logits, seen, sampler: SamplerConfig,
                  row_params=None):
    """Sampling chain + token selection. ``row_params`` (optional dict of
    (B,) arrays: temperature / top_k / top_p / repetition_penalty /
    do_sample) overrides the scalar ``sampler`` per row — the per-request
    decode-config path of serving.StreamServer."""
    if row_params is None:
        processed = sampling.process_logits(
            logits, seen, repetition_penalty=sampler.repetition_penalty,
            temperature=sampler.temperature, top_k=sampler.top_k,
            top_p=sampler.top_p)
        if sampler.do_sample:
            return sampling.sample_token(key, processed)
        return jnp.argmax(processed, axis=-1).astype(jnp.int32)
    processed = sampling.process_logits_per_row(
        logits, seen,
        repetition_penalty=row_params["repetition_penalty"],
        temperature=row_params["temperature"],
        top_k=row_params["top_k"], top_p=row_params["top_p"])
    sampled = sampling.sample_token(key, processed)
    greedy = jnp.argmax(processed, axis=-1).astype(jnp.int32)
    return jnp.where(row_params["do_sample"], sampled, greedy)


def _decode_one(params, cfg, state: DecodeState, sampler: SamplerConfig,
                row_params=None):
    """One AR step: embed last token, forward through the cached stack, sample."""
    cache_k, cache_v, key_valid, latent, logits, _ = _decode_forward(
        params, cfg, state)

    rng, key = jax.random.split(state.rng)
    next_token = _select_token(key, logits, state.seen, sampler, row_params)
    # finished rows keep emitting the pad (=stop) token
    next_token = jnp.where(state.finished, cfg.stop_audio_token, next_token)
    finished = state.finished | (next_token == cfg.stop_audio_token)
    seen = state.seen.at[jnp.arange(state.seen.shape[0]), next_token].set(True)

    new_state = DecodeState(
        cache_k=cache_k, cache_v=cache_v, key_valid=key_valid,
        cur_index=state.cur_index + 1, n_generated=state.n_generated + 1,
        last_token=next_token, seen=seen, finished=finished, rng=rng)
    return new_state, next_token, latent


def init_state(cfg: gpt_model.GPTConfig, prefix_width: int, batch: int,
               heads: int, head_dim: int, rng, cache_dtype=jnp.bfloat16,
               gen_tokens: int | None = None,
               per_row: bool = False) -> DecodeState:
    t = cache_size(cfg, prefix_width, gen_tokens)
    idx0 = (jnp.zeros((batch,), jnp.int32) if per_row else jnp.int32(0))
    return DecodeState(
        cache_k=jnp.zeros((cfg.layers, batch, heads, t, head_dim), cache_dtype),
        cache_v=jnp.zeros((cfg.layers, batch, heads, t, head_dim), cache_dtype),
        key_valid=jnp.zeros((batch, t), bool),
        cur_index=idx0,
        n_generated=idx0,
        last_token=jnp.full((batch,), cfg.start_audio_token, jnp.int32),
        seen=sampling.init_seen(cfg.num_audio_tokens, batch,
                                start_audio_token=cfg.start_audio_token),
        finished=jnp.zeros((batch,), bool),
        rng=rng)


def prefill_logits(params, cfg: gpt_model.GPTConfig, state: DecodeState,
                   prefix_emb: jnp.ndarray, prefix_valid: jnp.ndarray,
                   return_hidden: bool = False):
    """Embed [prefix | start_audio], fill the cache; return
    (cache-filled DecodeState, first_latent, first-position logits) WITHOUT
    sampling — shared by :func:`prefill` (sampling), :func:`decode_beam`
    (beam selection) and :func:`decode_contrastive`. With
    ``return_hidden=True`` a fourth element is appended: the post-``ln_f``
    hidden states of the full [prefix | start_audio] sequence (B, P+1, D) —
    the context that contrastive search's degeneration penalty compares
    candidates against."""
    compute_dtype = params["mel_embedding"].dtype
    b, p, d = prefix_emb.shape
    start_emb = (params["mel_embedding"][cfg.start_audio_token]
                 + params["mel_pos"][0])[None, None, :]
    h = jnp.concatenate(
        [prefix_emb, jnp.broadcast_to(start_emb, (b, 1, d))], axis=1
    ).astype(compute_dtype)
    seq_valid = jnp.concatenate([prefix_valid, jnp.ones((b, 1), bool)], axis=1)

    t_cache = state.cache_k.shape[3]
    heads = cfg.heads
    hd = d // heads

    bias = nn.causal_bias(p + 1) + nn.key_padding_bias(seq_valid)

    def body(carry, bp):
        h = carry
        x = nn.layer_norm(bp["ln_1"], h)
        qkv = nn.linear(bp["attn"]["c_attn"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = nn.split_heads(q, heads)
        kh = nn.split_heads(k, heads)
        vh = nn.split_heads(v, heads)
        a = nn.merge_heads(nn.attention(qh, kh, vh, bias=bias))
        h = h + nn.linear(bp["attn"]["c_proj"], a)
        x = nn.layer_norm(bp["ln_2"], h)
        h = h + nn.linear(bp["mlp"]["c_proj"], nn.gelu_new(nn.linear(bp["mlp"]["c_fc"], x)))
        return h, (kh, vh)

    h, (all_k, all_v) = jax.lax.scan(body, h, params["core"]["blocks"])
    # all_k: (L, B, H, P+1, hd) -> pad to cache length
    pad = t_cache - (p + 1)
    cache_k = jnp.pad(all_k, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))
                      ).astype(state.cache_k.dtype)
    cache_v = jnp.pad(all_v, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))
                      ).astype(state.cache_v.dtype)
    key_valid = jnp.pad(seq_valid, ((0, 0), (0, pad)))

    h = nn.layer_norm(params["core"]["ln_f"], h)
    latent = nn.layer_norm(params["final_norm"], h[:, -1]).astype(jnp.float32)
    logits = nn.linear(params["mel_head"], latent)

    idx = jnp.full_like(state.cur_index, p + 1)  # scalar or per-row vector
    filled = DecodeState(
        cache_k=cache_k, cache_v=cache_v, key_valid=key_valid,
        cur_index=idx, n_generated=jnp.zeros_like(state.n_generated),
        last_token=state.last_token, seen=state.seen,
        finished=state.finished, rng=state.rng)
    if return_hidden:
        return filled, latent, logits, h.astype(jnp.float32)
    return filled, latent, logits


def prefill(params, cfg: gpt_model.GPTConfig, state: DecodeState,
            prefix_emb: jnp.ndarray, prefix_valid: jnp.ndarray,
            sampler: SamplerConfig, row_params=None):
    """Embed [prefix | start_audio], fill the cache, sample the first token.

    prefix_emb: (B, P, D) — cond latents + formatted text embeddings
    (gpt.build_prefix_emb). ``row_params`` optionally overrides the sampler
    per row (see ``_select_token``). Returns (state, first_token,
    first_latent).
    """
    b = prefix_emb.shape[0]
    filled, latent, logits = prefill_logits(params, cfg, state, prefix_emb,
                                            prefix_valid)
    rng, key = jax.random.split(filled.rng)
    first_token = _select_token(key, logits, filled.seen, sampler, row_params)
    finished = first_token == cfg.stop_audio_token
    seen = filled.seen.at[jnp.arange(b), first_token].set(True)

    new_state = DecodeState(
        cache_k=filled.cache_k, cache_v=filled.cache_v,
        key_valid=filled.key_valid, cur_index=filled.cur_index,
        n_generated=jnp.full_like(filled.n_generated, 1),
        last_token=first_token, seen=seen,
        finished=finished, rng=rng)
    return new_state, first_token, latent


def decode_chunk(params, cfg: gpt_model.GPTConfig, state: DecodeState,
                 sampler: SamplerConfig, chunk: int = 8, row_params=None):
    """Run ``chunk`` AR steps; returns (state, tokens (B, chunk),
    latents (B, chunk, D), already-finished-before-step mask (B, chunk)).

    The latent at slot i is the hidden of the input position that generated
    tokens[i] — exactly the pair the reference's ``sample_stream`` yields.
    ``row_params`` optionally overrides the sampler per row.
    """

    def step(state, _):
        was_finished = state.finished
        new_state, tok, latent = _decode_one(params, cfg, state, sampler,
                                             row_params)
        return new_state, (tok, latent, was_finished)

    state, (tokens, latents, pre_finished) = jax.lax.scan(
        step, state, None, length=chunk)
    # scan stacks along axis 0: (chunk, B, ...) -> (B, chunk, ...)
    tokens = jnp.swapaxes(tokens, 0, 1)
    latents = jnp.swapaxes(latents, 0, 1)
    pre_finished = jnp.swapaxes(pre_finished, 0, 1)
    return state, tokens, latents, pre_finished


def insert_row(pool: DecodeState, row: DecodeState, slot) -> DecodeState:
    """Continuous-batching admission: write a single-row decode state
    (B=1, per-row positions — e.g. a fresh segment prefill) into ``slot`` of
    a per-row pool state. Only that row's cache/positions/sampling state are
    touched; the pool keeps its own rng. ``slot`` may be a traced scalar, so
    one compiled program serves every slot."""
    z = jnp.int32(0)
    s = jnp.asarray(slot, jnp.int32)
    return DecodeState(
        cache_k=jax.lax.dynamic_update_slice(
            pool.cache_k, row.cache_k.astype(pool.cache_k.dtype),
            (z, s, z, z, z)),
        cache_v=jax.lax.dynamic_update_slice(
            pool.cache_v, row.cache_v.astype(pool.cache_v.dtype),
            (z, s, z, z, z)),
        key_valid=jax.lax.dynamic_update_slice(pool.key_valid, row.key_valid,
                                               (s, z)),
        cur_index=jax.lax.dynamic_update_slice(pool.cur_index, row.cur_index,
                                               (s,)),
        n_generated=jax.lax.dynamic_update_slice(pool.n_generated,
                                                 row.n_generated, (s,)),
        last_token=jax.lax.dynamic_update_slice(pool.last_token,
                                                row.last_token, (s,)),
        seen=jax.lax.dynamic_update_slice(pool.seen, row.seen, (s, z)),
        finished=jax.lax.dynamic_update_slice(pool.finished, row.finished,
                                              (s,)),
        rng=pool.rng)


def decode_all(params, cfg: gpt_model.GPTConfig, state: DecodeState,
               sampler: SamplerConfig, max_new: int):
    """Generate until every row is finished or ``max_new`` tokens, entirely on
    device (one dispatch): ``lax.while_loop`` over single-token steps writing
    into a preallocated token buffer. The buffer includes the prefill token at
    slot 0 (``state.last_token`` on entry).

    Returns (state, tokens (B, max_new), n_generated (B,)) where tokens beyond
    each row's stop token are stop-padded.
    """
    if state.n_generated.ndim != 0:
        raise ValueError("decode_all is a lockstep-decode driver; per-row "
                         "position states belong to decode_chunk pools "
                         "(serving.StreamServer)")
    b = state.last_token.shape[0]
    buf = jnp.full((b, max_new), cfg.stop_audio_token, jnp.int32)
    buf = buf.at[:, 0].set(state.last_token)

    def cond(carry):
        st, _ = carry
        return (st.n_generated < max_new) & ~jnp.all(st.finished)

    def body(carry):
        st, buf = carry
        new_st, tok, _ = _decode_one(params, cfg, st, sampler)
        buf = jax.lax.dynamic_update_slice(buf, tok[:, None],
                                           (0, st.n_generated))
        return new_st, buf

    state, buf = jax.lax.while_loop(cond, body, (state, buf))
    # per-row generated count = index of first stop + 1, capped at max_new
    is_stop = buf == cfg.stop_audio_token
    first_stop = jnp.argmax(is_stop, axis=1)
    has_stop = jnp.any(is_stop, axis=1)
    n_gen = jnp.where(has_stop, first_stop + 1, max_new)
    return state, buf, n_gen


def decode_beam(params, cfg: gpt_model.GPTConfig, state: DecodeState,
                prefix_emb: jnp.ndarray, prefix_valid: jnp.ndarray,
                max_new: int, num_beams: int, length_penalty: float = 1.0,
                repetition_penalty: float = 1.0,
                prefix_fake_len: jnp.ndarray | int | None = None,
                do_sample: bool = False, temperature: float = 1.0,
                top_k: int = 0, top_p: float = 1.0):
    """Beam search over the KV-cached engine — the ``num_beams > 1`` decode
    modes of the reference's vendored HF generator
    (layers/stream_generator.py:44-643, reachable via
    ``HiFiGANTrainer.inference(num_beams=..., length_penalty=...)``,
    trainers/hifigan_trainer.py:458-470). ``do_sample=False`` is HF
    ``beam_search``; ``do_sample=True`` is HF ``beam_sample`` (multinomial
    beam search, stream_generator.py:474-511).

    HF semantics reproduced:
    * per step: log-softmax over the logits, then the logits *processors*
      (repetition penalty) on the log-probs — beam modes process scores
      post-softmax, unlike sample/greedy which process raw logits,
    * candidate selection: beam_search takes the top ``2*num_beams`` flat
      candidates by accumulated score. beam_sample adds the running beam
      scores, applies the sampling *warpers* (temperature → top-k → top-p)
      to those accumulated scores (HF's exact — if unusual — order), then
      draws ``2*num_beams`` candidates without replacement from the softmax
      over the flattened (num_beams*V) scores and sorts them by score
      descending. The draw uses the Gumbel-top-k construction (equal in
      distribution to sequential multinomial without replacement), keyed by
      ``fold_in(state.rng, step)`` so runs are reproducible,
    * EOS candidates ranked inside the top ``num_beams`` finalize a
      hypothesis with score ``sum_scores / (cur_len ** length_penalty)``
      where ``cur_len`` counts HF's ``input_ids`` length — fake prefix ids
      included (``prefix_fake_len``; gpt.py:572-592 builds them) — matching
      the reference's normalization exactly,
    * surviving beams are the best non-EOS candidates in rank order; the KV
      cache is reordered by parent beam (``_reorder_cache`` analogue,
      gpt_inference.py:126-136),
    * stop when no running beam can beat the worst finalized hypothesis
      (HF ``early_stopping=False`` heuristic), then finalize running beams.

    ``state`` must be ``init_state`` with ``batch == num_beams``;
    ``prefix_emb``/``prefix_valid`` are the single hypothesis tiled to
    ``num_beams`` rows. Returns (tokens (max_new,), n_tokens) of the best
    hypothesis, stop-token-padded, including its stop token when present.
    """
    nb = num_beams
    v = cfg.num_audio_tokens
    stop = cfg.stop_audio_token
    if prefix_fake_len is None:
        prefix_fake_len = prefix_emb.shape[1] + 1
    prefix_fake_len = jnp.asarray(prefix_fake_len, jnp.float32)

    filled, _, logits0 = prefill_logits(params, cfg, state, prefix_emb,
                                        prefix_valid)
    sample_rng = filled.rng

    neg = jnp.finfo(jnp.float32).min

    def select(logits, seen, scores, bufs, fin_scores, fin_bufs,
               fin_lens, s):
        """One beam-selection step. ``s`` = tokens generated so far (int32).
        Returns (parent, tok, new_scores, new fin set)."""
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # HF beam modes apply the repetition-penalty processor to the
        # log-softmaxed scores (always <= 0, so seen tokens multiply)
        logp = sampling.apply_repetition_penalty(logp, seen,
                                                 repetition_penalty)
        cand = scores[:, None] + logp                     # (nb, V)
        if do_sample:
            # HF beam-mode warpers keep at least 2*num_beams tokens per row
            # (min_tokens_to_keep) so the 2N draws never hit -inf candidates
            warped = sampling.apply_temperature(cand, temperature)
            warped = sampling.apply_top_k(warped, top_k,
                                          min_tokens_to_keep=2 * nb)
            warped = sampling.apply_top_p(warped, top_p,
                                          min_tokens_to_keep=2 * nb)
            flat = warped.reshape(-1)
            g = jax.random.gumbel(jax.random.fold_in(sample_rng, s),
                                  flat.shape, jnp.float32)
            _, drawn = jax.lax.top_k(flat + g, 2 * nb)
            drawn_scores = flat[drawn]
            order = jnp.argsort(-drawn_scores)
            top_scores = drawn_scores[order]
            top_idx = drawn[order]
        else:
            top_scores, top_idx = jax.lax.top_k(cand.reshape(-1), 2 * nb)
        parent = (top_idx // v).astype(jnp.int32)
        tok = (top_idx % v).astype(jnp.int32)
        is_eos = tok == stop
        rank = jnp.arange(2 * nb)

        # EOS candidates ranked in the top nb finalize hypotheses; their
        # sequence is the parent beam's tokens so far (eos excluded), with
        # sum-logprob including the eos step, normalized by HF's input_ids
        # length (fake prefix + s)
        cur_len = prefix_fake_len + s.astype(jnp.float32)
        norm = jnp.power(jnp.maximum(cur_len, 1.0), length_penalty)
        cand_fin_scores = jnp.where(is_eos & (rank < nb),
                                    top_scores / norm, neg)
        all_scores = jnp.concatenate([fin_scores, cand_fin_scores])
        all_bufs = jnp.concatenate([fin_bufs, bufs[parent]], axis=0)
        all_lens = jnp.concatenate(
            [fin_lens, jnp.full((2 * nb,), s, jnp.int32)])
        keep_s, keep_i = jax.lax.top_k(all_scores, nb)
        new_fin = (keep_s, all_bufs[keep_i], all_lens[keep_i])

        # surviving beams: best non-EOS candidates in rank order
        order = jnp.argsort(rank + jnp.where(is_eos, 4 * nb, 0))[:nb]
        sel_parent = parent[order]
        sel_tok = tok[order]
        sel_scores = top_scores[order]
        return sel_parent, sel_tok, sel_scores, new_fin

    # ---- step 0: selection on the prefill logits (all rows identical; the
    # [0, -inf, ...] score init deduplicates like HF)
    scores0 = jnp.full((nb,), neg).at[0].set(0.0)
    bufs0 = jnp.full((nb, max_new), stop, jnp.int32)
    fin0 = (jnp.full((nb,), neg), jnp.full((nb, max_new), stop, jnp.int32),
            jnp.zeros((nb,), jnp.int32))
    parent, tok, scores, fin = select(
        logits0, filled.seen, scores0, bufs0, *fin0, jnp.int32(0))
    bufs = bufs0[parent].at[:, 0].set(tok)
    seen = filled.seen[parent].at[jnp.arange(nb), tok].set(True)
    st = DecodeState(
        cache_k=filled.cache_k[:, parent], cache_v=filled.cache_v[:, parent],
        key_valid=filled.key_valid[parent], cur_index=filled.cur_index,
        n_generated=jnp.int32(1), last_token=tok, seen=seen,
        finished=jnp.zeros((nb,), bool), rng=filled.rng)

    def not_done(carry):
        st, bufs, scores, fin, s = carry
        fin_scores = fin[0]
        cur_len = prefix_fake_len + s.astype(jnp.float32)
        best_possible = jnp.max(scores) / jnp.power(
            jnp.maximum(cur_len, 1.0), length_penalty)
        worst_fin = jnp.min(fin_scores)
        done = worst_fin >= best_possible
        return (s < max_new) & ~done

    def body(carry):
        st, bufs, scores, fin, s = carry
        cache_k, cache_v, key_valid, _, logits, _ = _decode_forward(
            params, cfg, st)
        parent, tok, new_scores, new_fin = select(
            logits, st.seen, scores, bufs, *fin, s)
        bufs = bufs[parent].at[:, s].set(tok)
        seen = st.seen[parent].at[jnp.arange(nb), tok].set(True)
        new_st = DecodeState(
            cache_k=cache_k[:, parent], cache_v=cache_v[:, parent],
            key_valid=key_valid[parent], cur_index=st.cur_index + 1,
            n_generated=st.n_generated + 1, last_token=tok, seen=seen,
            finished=st.finished, rng=st.rng)
        return new_st, bufs, new_scores, new_fin, s + 1

    st, bufs, scores, fin, s = jax.lax.while_loop(
        not_done, body, (st, bufs, scores, fin, jnp.int32(1)))

    # HF finalize: running beams join the hypothesis pool (normalized at the
    # final length) in case fewer than nb hypotheses hit EOS
    fin_scores, fin_bufs, fin_lens = fin
    cur_len = prefix_fake_len + s.astype(jnp.float32)
    run_norm = scores / jnp.power(jnp.maximum(cur_len, 1.0), length_penalty)
    all_scores = jnp.concatenate([fin_scores, run_norm])
    all_bufs = jnp.concatenate([fin_bufs, bufs], axis=0)
    all_lens = jnp.concatenate([fin_lens, jnp.full((nb,), s, jnp.int32)])
    best = jnp.argmax(all_scores)
    best_buf = all_bufs[best]
    best_len = all_lens[best]
    # append the stop token (finalized hypotheses exclude it; callers strip
    # stop tokens like the reference inference does)
    has_room = best_len < max_new
    best_buf = jnp.where(
        has_room,
        best_buf.at[jnp.minimum(best_len, max_new - 1)].set(stop), best_buf)
    n_tokens = jnp.where(has_room, best_len + 1, best_len)
    return best_buf, n_tokens


def decode_group_beam(params, cfg: gpt_model.GPTConfig, state: DecodeState,
                      prefix_emb: jnp.ndarray, prefix_valid: jnp.ndarray,
                      max_new: int, num_beams: int, num_beam_groups: int,
                      diversity_penalty: float = 1.0,
                      length_penalty: float = 1.0,
                      repetition_penalty: float = 1.0,
                      prefix_fake_len: jnp.ndarray | int | None = None):
    """Group (diverse) beam search — the ``num_beam_groups > 1`` route of the
    reference's vendored HF generator (layers/stream_generator.py:308-317,
    mapping to HF ``group_beam_search``). The last routed decode mode.

    HF semantics reproduced (parity-tested against the real
    ``BeamSearchScorer`` group mode + ``HammingDiversityLogitsProcessor`` in
    tests/test_group_beam.py):
    * ``num_beams`` beams split into ``num_beam_groups`` groups of
      ``gs = num_beams // num_beam_groups``; ONE forward per step for all
      beams, then groups select sequentially,
    * group ``g``'s log-softmax scores are penalized by
      ``diversity_penalty * freq(token)`` where ``freq`` counts the tokens
      already chosen by groups ``< g`` at THIS step (Hamming diversity);
      the diversity processor runs BEFORE the repetition penalty (HF's
      ``_get_logits_processor`` ordering), and group 0 is never penalized,
    * per group: top ``2*gs`` flat candidates; EOS candidates ranked inside
      the top ``gs`` finalize into that GROUP's hypothesis pool (capacity
      ``gs``), normalized by HF's input_ids length (fake prefix included),
    * score init: the FIRST beam of each group starts at 0, the rest at
      -inf (HF ``beam_scores[:, ::num_sub_beams] = 0``) — groups diverge
      through the diversity penalty even though all rows share the prefix,
    * a group whose pool can no longer be beaten freezes exactly like HF's
      done groups: its rows all copy local beam 0, emit the pad (=stop)
      token — which later groups' diversity then penalizes — and its
      running scores leave the race; frozen groups add nothing at finalize,
    * loop ends when every group is done or ``max_new``; finalize adds the
      running beams of non-done groups to their pools at the final length.

    ``state`` must be ``init_state`` with ``batch == num_beams``. Returns
    (tokens (max_new,), n_tokens) of the globally best hypothesis across all
    group pools, stop-token-padded, including its stop token when room.
    """
    nb = num_beams
    G = num_beam_groups
    if nb % G != 0:
        raise ValueError("num_beams must be divisible by num_beam_groups "
                         f"(got {nb} / {G})")
    gs = nb // G
    v = cfg.num_audio_tokens
    stop = cfg.stop_audio_token
    if prefix_fake_len is None:
        prefix_fake_len = prefix_emb.shape[1] + 1
    prefix_fake_len = jnp.asarray(prefix_fake_len, jnp.float32)
    neg = jnp.finfo(jnp.float32).min

    filled, _, logits0 = prefill_logits(params, cfg, state, prefix_emb,
                                        prefix_valid)

    def step_groups(logits, seen, scores, bufs, fins, done, s):
        """One full selection step: all groups in order. ``fins`` =
        (fin_scores (G, gs), fin_bufs (G, gs, max_new), fin_lens (G, gs)).
        Returns (parent_global (nb,), toks (nb,), scores, fins, done)."""
        fin_scores, fin_bufs, fin_lens = fins
        cur_len = prefix_fake_len + s.astype(jnp.float32)
        norm = jnp.power(jnp.maximum(cur_len, 1.0), length_penalty)
        # is_done is evaluated at HF's post-append length (input_ids + 1)
        norm_next = jnp.power(jnp.maximum(cur_len + 1.0, 1.0), length_penalty)
        rank = jnp.arange(2 * gs)

        parents, toks, new_scores = [], [], []
        new_fs, new_fb, new_fl, new_done = [], [], [], []
        prev_toks = []   # tokens chosen by earlier groups this step
        for g in range(G):
            rows = slice(g * gs, (g + 1) * gs)
            done_g = done[g]
            logp = jax.nn.log_softmax(logits[rows].astype(jnp.float32),
                                      axis=-1)
            if g > 0:
                freq = jnp.zeros((v,), jnp.float32).at[
                    jnp.concatenate(prev_toks)].add(1.0)
                logp = logp - diversity_penalty * freq[None, :]
            logp = sampling.apply_repetition_penalty(logp, seen[rows],
                                                     repetition_penalty)
            cand = scores[rows][:, None] + logp            # (gs, V)
            top_scores, top_idx = jax.lax.top_k(cand.reshape(-1), 2 * gs)
            parent_local = (top_idx // v).astype(jnp.int32)
            tok = (top_idx % v).astype(jnp.int32)
            is_eos = tok == stop

            # EOS candidates in the top gs finalize into group g's pool
            # (a frozen group adds nothing)
            cand_fin = jnp.where(is_eos & (rank < gs) & ~done_g,
                                 top_scores / norm, neg)
            pool_scores = jnp.concatenate([fin_scores[g], cand_fin])
            pool_bufs = jnp.concatenate(
                [fin_bufs[g], bufs[g * gs + parent_local]], axis=0)
            pool_lens = jnp.concatenate(
                [fin_lens[g], jnp.full((2 * gs,), s, jnp.int32)])
            keep_s, keep_i = jax.lax.top_k(pool_scores, gs)
            new_fs.append(keep_s)
            new_fb.append(pool_bufs[keep_i])
            new_fl.append(pool_lens[keep_i])

            # surviving beams: best non-EOS candidates in rank order;
            # frozen groups copy local beam 0 and emit the pad (=stop) token
            order = jnp.argsort(rank + jnp.where(is_eos, 4 * gs, 0))[:gs]
            sel_parent = jnp.where(done_g, 0, parent_local[order])
            sel_tok = jnp.where(done_g, stop, tok[order])
            sel_scores = jnp.where(done_g, 0.0, top_scores[order])
            parents.append(g * gs + sel_parent)
            toks.append(sel_tok)
            new_scores.append(sel_scores)
            prev_toks.append(sel_tok)

            # HF BeamHypotheses.is_done (early_stopping=False): pool full AND
            # its worst kept score >= the best candidate's ceiling at the
            # next length. Sticky once set.
            best_cand = top_scores[0]
            new_done.append(done_g | (jnp.min(keep_s) >= best_cand /
                                      norm_next))

        return (jnp.concatenate(parents), jnp.concatenate(toks),
                jnp.concatenate(new_scores),
                (jnp.stack(new_fs), jnp.stack(new_fb), jnp.stack(new_fl)),
                jnp.stack(new_done))

    # ---- step 0: selection on the prefill logits (rows identical; the
    # per-group [0, -inf, ...] score init deduplicates like HF)
    scores0 = jnp.where(jnp.arange(nb) % gs == 0, 0.0, neg)
    bufs0 = jnp.full((nb, max_new), stop, jnp.int32)
    fins0 = (jnp.full((G, gs), neg),
             jnp.full((G, gs, max_new), stop, jnp.int32),
             jnp.zeros((G, gs), jnp.int32))
    done0 = jnp.zeros((G,), bool)
    parent, tok, scores, fins, done = step_groups(
        logits0, filled.seen, scores0, bufs0, fins0, done0, jnp.int32(0))
    bufs = bufs0[parent].at[:, 0].set(tok)
    seen = filled.seen[parent].at[jnp.arange(nb), tok].set(True)
    st = DecodeState(
        cache_k=filled.cache_k[:, parent], cache_v=filled.cache_v[:, parent],
        key_valid=filled.key_valid[parent], cur_index=filled.cur_index,
        n_generated=jnp.int32(1), last_token=tok, seen=seen,
        finished=jnp.zeros((nb,), bool), rng=filled.rng)

    def not_done(carry):
        _, _, _, _, done, s = carry
        return (s < max_new) & ~jnp.all(done)

    def body(carry):
        st, bufs, scores, fins, done, s = carry
        cache_k, cache_v, key_valid, _, logits, _ = _decode_forward(
            params, cfg, st)
        parent, tok, new_scores, new_fins, new_done = step_groups(
            logits, st.seen, scores, bufs, fins, done, s)
        bufs = bufs[parent].at[:, s].set(tok)
        seen = st.seen[parent].at[jnp.arange(nb), tok].set(True)
        new_st = DecodeState(
            cache_k=cache_k[:, parent], cache_v=cache_v[:, parent],
            key_valid=key_valid[parent], cur_index=st.cur_index + 1,
            n_generated=st.n_generated + 1, last_token=tok, seen=seen,
            finished=st.finished, rng=st.rng)
        return new_st, bufs, new_scores, new_fins, new_done, s + 1

    st, bufs, scores, fins, done, s = jax.lax.while_loop(
        not_done, body, (st, bufs, scores, fins, done, jnp.int32(1)))

    # finalize: non-done groups add their running beams at the final length
    fin_scores, fin_bufs, fin_lens = fins
    cur_len = prefix_fake_len + s.astype(jnp.float32)
    run_norm = scores / jnp.power(jnp.maximum(cur_len, 1.0), length_penalty)
    run_norm = jnp.where(done[:, None], neg, run_norm.reshape(G, gs))
    all_scores = jnp.concatenate([fin_scores, run_norm], axis=1).reshape(-1)
    all_bufs = jnp.concatenate(
        [fin_bufs, bufs.reshape(G, gs, max_new)], axis=1
    ).reshape(-1, max_new)
    all_lens = jnp.concatenate(
        [fin_lens, jnp.full((G, gs), s, jnp.int32)], axis=1).reshape(-1)
    best = jnp.argmax(all_scores)
    best_buf = all_bufs[best]
    best_len = all_lens[best]
    has_room = best_len < max_new
    best_buf = jnp.where(
        has_room,
        best_buf.at[jnp.minimum(best_len, max_new - 1)].set(stop), best_buf)
    n_tokens = jnp.where(has_room, best_len + 1, best_len)
    return best_buf, n_tokens


def decode_constrained(params, cfg: gpt_model.GPTConfig, state: DecodeState,
                       prefix_emb: jnp.ndarray, prefix_valid: jnp.ndarray,
                       max_new: int, num_beams: int, constraints,
                       length_penalty: float = 1.0,
                       repetition_penalty: float = 1.0,
                       prefix_fake_len: int | None = None):
    """Constrained beam search — the ``constraints`` / ``force_words_ids``
    route of the reference's vendored generator
    (layers/stream_generator.py:260-276; HF ``ConstrainedBeamSearchScorer``,
    still shipped in transformers 4.57 core even though the *driver* moved to
    a Hub recipe). Unreachable from every reference entry point, covered for
    surface completeness; parity-tested against the real HF scorer
    (tests/test_constrained_beam.py).

    Design: unlike the on-device ``decode_beam``, the banked candidate
    selection here is inherently sequence-dependent bookkeeping (per-beam
    phrase-progress states, sequence-dedup of advance candidates, bank
    round-robin), so the selection runs on host while every forward stays the
    jitted KV-cached batch-``num_beams`` program — the same split the
    contrastive/beam drivers use for their device side. This mode is never on
    a reference hot path; the VC decode surface (sample/greedy/beam/
    contrastive) remains fully on-device.

    HF semantics reproduced (installed-4.57 scorer, ``decoder_prompt_len=0``):
    * per step: log-softmax, repetition-penalty processor on the log-probs,
      add running beam scores → ``scores_for_all_vocab``; top ``2*num_beams``
      flat candidates,
    * EOS candidates ranked inside the top ``num_beams`` finalize ONLY if the
      parent sequence already satisfies every constraint; normalization is
      ``sum_logprobs / (len(input_ids)+1) ** length_penalty`` (fake prefix
      ids included, gpt.py:572-592),
    * ``step_sentence_constraint``: each running beam whose constraints are
      unmet proposes "advance" candidates (next token of its in-progress
      phrase, or the first token of each pending phrase) scored from
      ``scores_for_all_vocab``; duplicates of already-tracked sequences are
      dropped; all candidates sort by ``bank*100 + score`` descending and the
      next beams are drawn round-robin across banks (highest bank first),
    * early-stop heuristic (``early_stopping=False``) and finalize fallback
      (running beams that satisfy constraints join the pool; if none do, the
      best running beams are returned regardless) match the scorer.

    ``constraints``: list of token phrases (``force_words_ids`` style).
    ``state`` must be ``init_state`` with ``batch == num_beams``. Returns
    (tokens (max_new,) np.ndarray stop-padded incl. the stop token when there
    is room, n_tokens) like ``decode_beam``.
    """
    from genvc_tpu.decode.constraints import PhraseListState, completes_all

    nb = num_beams
    v = cfg.num_audio_tokens
    stop = cfg.stop_audio_token
    if prefix_fake_len is None:
        prefix_fake_len = prefix_emb.shape[1] + 1

    filled, _, logits0 = prefill_logits(params, cfg, state, prefix_emb,
                                        prefix_valid)

    fwd = _constrained_fwd_jit
    reorder = _constrained_reorder_jit

    # host bookkeeping: full sequences start with HF's fake input_ids
    # (prefix_fake_len-1 ones + start_audio, gpt.py:572-592) so constraint
    # resets and the repetition-penalty processor see what HF's would
    fake_prefix = [1] * (int(prefix_fake_len) - 1) + [cfg.start_audio_token]
    seqs = [list(fake_prefix) for _ in range(nb)]
    scores = np.full((nb,), -1e9, np.float32)
    scores[0] = 0.0
    seen = np.zeros((nb, v), bool)
    seen[:, [1, cfg.start_audio_token]] = True
    hyps: list = []     # (norm_score, token_list)

    def add_hyp(norm_score, toks):
        hyps.append((norm_score, toks))
        hyps.sort(key=lambda x: -x[0])
        del hyps[nb:]

    def select(logits):
        logp = np.asarray(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
        if repetition_penalty != 1.0:
            pen = np.where(logp < 0, logp * repetition_penalty,
                           logp / repetition_penalty)
            logp = np.where(seen, pen, logp)
        cand = scores[:, None] + logp                       # (nb, V)
        flat = cand.reshape(-1)
        top = np.argsort(-flat, kind="stable")[: 2 * nb]
        sel = []                                            # (score,tok,parent)
        cur_len = len(seqs[0]) + 1
        for rank, fi in enumerate(top):
            parent, tok = int(fi) // v, int(fi) % v
            sc = float(flat[fi])
            if tok == stop:
                if rank < nb and completes_all(constraints, seqs[parent]):
                    add_hyp(sc / cur_len ** length_penalty, list(seqs[parent]))
                continue
            sel.append((sc, tok, parent))
            if len(sel) == nb:
                break

        # step_sentence_constraint: advance candidates from the running beams
        tracked = [seqs[p] + [t] for (_, t, p) in sel]
        cands = [(sc, t, p, _reset_state(constraints, seqs[p] + [t]))
                 for (sc, t, p) in sel]
        for row in range(nb):
            st_row = _reset_state(constraints, seqs[row])
            if st_row.completed:
                continue
            for adv in st_row.advance():
                adv_seq = seqs[row] + [adv]
                if adv_seq in tracked:
                    continue
                tracked.append(adv_seq)
                st_new = st_row.copy()
                st_new.add(adv)
                cands.append((float(cand[row, adv]), adv, row, st_new))

        # bank round-robin: sort by bank*100+score desc, then stable-argsort
        # the within-bank position (HF's exact construction). HF only
        # reorders when advance candidates were actually added; otherwise the
        # rank-ordered top-nb selection stands as-is.
        if len(cands) > len(sel):
            zipped = [c[3].get_bank() * 100.0 + c[0] for c in cands]
            order = sorted(range(len(cands)), key=lambda i: -zipped[i])
            incr, counter, cur_bank = [], -1, None
            for i in order:
                b = cands[i][3].get_bank()
                counter = counter + 1 if b == cur_bank else 0
                cur_bank = b
                incr.append(counter)
            rearranged = [order[j]
                          for j in np.argsort(incr, kind="stable")][:nb]
            picked = [cands[i] for i in rearranged]
        else:
            picked = cands
        best_possible = float(flat[top[0]])
        return picked, best_possible

    def is_done(best_possible):
        if len(hyps) < nb:
            return False
        cur_len = len(seqs[0]) + 1
        return hyps[-1][0] >= best_possible / cur_len ** length_penalty

    st = filled
    logits = logits0
    done = False
    for s in range(max_new):
        picked, best_possible = select(logits)
        done = is_done(best_possible)   # HF: evaluated pre-update, inside process
        parents = jnp.asarray([p for (_, _, p, _) in picked], jnp.int32)
        tokens = jnp.asarray([t for (_, t, _, _) in picked], jnp.int32)
        if s == 0:
            # prefill already wrote the cache through slot cur_index-1; the
            # selected token's (k, v) lands at cur_index on the NEXT forward
            # (decode_beam's step-0 convention)
            st = DecodeState(
                cache_k=st.cache_k[:, parents], cache_v=st.cache_v[:, parents],
                key_valid=st.key_valid[parents], cur_index=st.cur_index,
                n_generated=jnp.ones_like(st.n_generated), last_token=tokens,
                seen=st.seen, finished=st.finished, rng=st.rng)
        else:
            st = reorder(st, cache_k, cache_v, key_valid, parents, tokens)
        seqs[:] = [seqs[p] + [t] for (_, t, p, _) in picked]
        seen = seen[[p for (_, _, p, _) in picked]]
        seen[np.arange(nb), [t for (_, t, _, _) in picked]] = True
        scores = np.asarray([sc for (sc, _, _, _) in picked], np.float32)
        if done:
            break
        if s + 1 == max_new:
            break
        cache_k, cache_v, key_valid, _, logits, _ = fwd(params, cfg, st)

    # finalize: running beams that satisfy constraints join the pool (unless
    # the early-stop heuristic fired — HF skips done batches). When NO
    # running beam completes its constraints, HF's fallback adds ALL running
    # beams to the pool (its break condition checks a list the fallback loop
    # never appends to), so the best normalized score wins regardless of
    # constraint completion — reproduced exactly.
    if not done:
        collected = 0
        for row in range(nb):
            if completes_all(constraints, seqs[row]):
                add_hyp(scores[row] / len(seqs[row]) ** length_penalty,
                        list(seqs[row]))
                collected += 1
        if collected < 1:
            for row in range(nb):
                add_hyp(scores[row] / len(seqs[row]) ** length_penalty,
                        list(seqs[row]))

    best = hyps[0][1][len(fake_prefix):]
    out = np.full((max_new,), stop, np.int32)
    out[: len(best)] = best
    n_tokens = len(best) + 1 if len(best) < max_new else len(best)
    return out, n_tokens


def _reset_state(constraints, token_ids):
    from genvc_tpu.decode.constraints import PhraseListState
    st = PhraseListState(constraints)
    st.reset(token_ids)
    return st


# module-level jits so repeated decode_constrained calls reuse the compiled
# programs (cfg is a frozen dataclass -> hashable static arg)
_constrained_fwd_jit = jax.jit(
    lambda params, cfg, st: _decode_forward(params, cfg, st),
    static_argnums=1)


@jax.jit
def _constrained_reorder_jit(st, cache_k, cache_v, key_valid, parents,
                             tokens):
    return st._replace(
        cache_k=cache_k[:, parents], cache_v=cache_v[:, parents],
        key_valid=key_valid[parents], cur_index=st.cur_index + 1,
        n_generated=st.n_generated + 1, last_token=tokens)


def decode_contrastive(params, cfg: gpt_model.GPTConfig, state: DecodeState,
                       prefix_emb: jnp.ndarray, prefix_valid: jnp.ndarray,
                       max_new: int, top_k: int = 4,
                       penalty_alpha: float = 0.6,
                       repetition_penalty: float = 1.0):
    """Contrastive search — the ``penalty_alpha > 0`` decode mode of the
    reference's vendored HF generator (layers/stream_generator.py:264-276,
    366-380; HF ``_contrastive_search``). The last decode mode of that
    generator's routing table (greedy/sample/beam are already covered).

    HF semantics reproduced per step:
    * logits of the current hypothesis run through the logits *processors*
      (repetition penalty over all previously seen ids, fake prefix ids
      included) then softmax; the top ``top_k`` tokens become candidates,
    * every candidate is forwarded one step; its degeneration penalty is the
      max cosine similarity between its post-``ln_f`` hidden state (HF's
      ``hidden_states[-1]``) and the hidden states of ALL previous positions
      (prompt included),
    * candidate score = ``(1 - penalty_alpha) * p(candidate) -
      penalty_alpha * degeneration_penalty``; argmax wins, its next-step
      logits seed the following iteration,
    * generation stops at ``stop_audio_token`` (sequence keeps the stop
      token) or after ``max_new`` tokens.

    TPU design: the KV cache lives at ``batch == top_k`` the whole time so
    the per-step candidate fan-out is one batched forward; after selection
    only the single just-written cache slot differs between rows, so the
    winner's (k, v) at that slot is broadcast to every row — a two-slice
    fix-up instead of beam search's full-cache gather. Context hiddens
    accumulate in a preallocated (P+1+max_new, D) buffer; invalid (padded)
    prefix positions are masked out of the cosine max.

    ``state`` must be ``init_state`` with ``batch == top_k``;
    ``prefix_emb``/``prefix_valid`` are the single hypothesis tiled to
    ``top_k`` rows. Returns (tokens (max_new,), n_tokens) stop-padded,
    including the stop token when generated.
    """
    k = top_k
    stop = cfg.stop_audio_token
    neg = jnp.finfo(jnp.float32).min

    filled, _, logits0, h0 = prefill_logits(params, cfg, state, prefix_emb,
                                            prefix_valid, return_hidden=True)
    p1 = prefix_emb.shape[1] + 1
    ctx_cap = p1 + max_new
    d = prefix_emb.shape[-1]
    ctx_h = jnp.zeros((ctx_cap, d), jnp.float32).at[:p1].set(h0[0])
    ctx_valid = jnp.zeros((ctx_cap,), bool).at[:p1].set(
        jnp.concatenate([prefix_valid[0], jnp.ones((1,), bool)]))

    buf = jnp.full((max_new,), stop, jnp.int32)

    def cond(carry):
        st, _, _, _, _, _, s, finished = carry
        return (s < max_new) & ~finished

    def body(carry):
        st, l, ctx_h, ctx_valid, seen, buf, s, _ = carry
        # candidate selection: processors -> softmax -> top-k probabilities
        pl = sampling.apply_repetition_penalty(
            l[None].astype(jnp.float32), seen[None], repetition_penalty)[0]
        probs = jax.nn.softmax(pl)
        cand_p, cand_ids = jax.lax.top_k(probs, k)

        # one batched forward evaluates every candidate
        st_c = st._replace(last_token=cand_ids)
        cache_k, cache_v, key_valid, _, cand_logits, cand_h = _decode_forward(
            params, cfg, st_c)

        # degeneration penalty: max cosine vs all previous hiddens
        cn = cand_h / jnp.maximum(
            jnp.linalg.norm(cand_h, axis=-1, keepdims=True), 1e-12)
        xn = ctx_h / jnp.maximum(
            jnp.linalg.norm(ctx_h, axis=-1, keepdims=True), 1e-12)
        sim = xn @ cn.T                                   # (ctx_cap, k)
        sim = jnp.where(ctx_valid[:, None], sim, neg)
        degen = jnp.max(sim, axis=0)                      # (k,)

        score = (1.0 - penalty_alpha) * cand_p - penalty_alpha * degen
        best = jnp.argmax(score)
        tok = cand_ids[best]

        # cache fix-up: rows differ only at the slot just written — broadcast
        # the winner's (k, v) there (cur_index is scalar in this driver)
        idx = st.cur_index
        z = jnp.int32(0)
        nl, _, nh, _, hd = cache_k.shape
        win_k = jax.lax.dynamic_slice(cache_k, (z, best, z, idx, z),
                                      (nl, 1, nh, 1, hd))
        win_v = jax.lax.dynamic_slice(cache_v, (z, best, z, idx, z),
                                      (nl, 1, nh, 1, hd))
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, jnp.broadcast_to(win_k, (nl, k, nh, 1, hd)),
            (z, z, z, idx, z))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, jnp.broadcast_to(win_v, (nl, k, nh, 1, hd)),
            (z, z, z, idx, z))

        new_st = st._replace(
            cache_k=cache_k, cache_v=cache_v, key_valid=key_valid,
            cur_index=st.cur_index + 1, n_generated=st.n_generated + 1,
            last_token=jnp.broadcast_to(tok, (k,)))
        l_next = cand_logits[best]
        ctx_h = jax.lax.dynamic_update_slice(ctx_h, cand_h[best][None],
                                             (p1 + s, z))
        ctx_valid = ctx_valid.at[p1 + s].set(True)
        seen = seen.at[tok].set(True)
        buf = buf.at[s].set(tok)
        return (new_st, l_next, ctx_h, ctx_valid, seen, buf, s + 1,
                tok == stop)

    # candidates at iteration s are the s-th generated tokens -> mel position
    # s+1 (start_audio holds position 0), so the position counter enters the
    # loop at 1 (decode_beam/step-0-prefill convention)
    filled = filled._replace(n_generated=jnp.ones_like(filled.n_generated))
    carry0 = (filled, logits0[0], ctx_h, ctx_valid, filled.seen[0], buf,
              jnp.int32(0), jnp.bool_(False))
    _, _, _, _, _, buf, s, finished = jax.lax.while_loop(cond, body, carry0)
    return buf, s
