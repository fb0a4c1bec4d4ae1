"""End-to-end voice-conversion inference (non-streaming + streaming).

Mirrors the reference orchestration (inference/model_init.py,
inference/inference_utils.py) with a TPU-first execution plan:

* every device function is jitted once with static shapes; variable lengths
  ride through as valid-length scalars (masked-conv / masked-attention
  parity — see models/*),
* the streaming hot loop fuses [decode steps → ×4 interp → vocoder] into one
  device call per ``chunks_per_call`` 8-token windows, keeps
  ``pipeline_depth`` calls in flight, prefetches device→host copies at
  dispatch, and consumes each call with a single combined fetch — the
  round-trip latency of the link amortizes over depth × chunk compute,
* the non-streaming path keeps the reference's teacher-forced second pass
  (latent re-forward) and single full-utterance vocoder call, with generation
  lengths bucketed to limit recompilation.

Host-side reflect-padding trick: torchaudio's center=True mel reflects the
*true-length* signal; we reflect on host around the real extent, then zero-pad
to the static width, and run the device mel with ``pre_padded=True`` — all
valid frames then match the reference bit-for-tolerance.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu import checkpoint
from genvc_tpu.config import GenVCConfig
from genvc_tpu.decode import engine
from genvc_tpu.dsp import mel as mel_mod
from genvc_tpu.models import contentvec, dvae, gpt as gpt_model, hifigan
from genvc_tpu.ops.conv import linear_interp_x4

COND_CHUNK_SECONDS = 6
COND_MAX_SECONDS = 30
SEG_SECONDS = 6.0
MIN_CHUNK_FRACTION = 0.32
STREAM_CHUNK = 8
CROSSFADE = 1024
TEXT_WIDTH = 80  # static content-code width (6 s @ 12.5 Hz = 75 codes)
LATENT_BUCKET = 64


def _bucket(n: int, step: int = LATENT_BUCKET) -> int:
    return max(step, int(np.ceil(n / step) * step))


@dataclasses.dataclass
class GenVCPipeline:
    config: GenVCConfig
    gpt_cfg: gpt_model.GPTConfig
    gpt_params: dict
    hifigan_params: dict
    content_dvae_params: dict
    content_dvae_cfg: dvae.DVAEConfig
    acoustic_dvae_params: Optional[dict]
    acoustic_dvae_cfg: Optional[dvae.DVAEConfig]
    contentvec_params: dict
    mel_norms: jnp.ndarray
    seed: int = 0
    quantize: Optional[str] = None  # None | "int8" (ops.quant decode weights)
    kv_cache_dtype: Optional[str] = None  # None | "fp8" (e4m3 KV cache)

    def __post_init__(self):
        cfg = self.config
        # KV-cache storage dtype: every decode step reads the ENTIRE static
        # cache, so at serving batch the cache read dominates even the weight
        # stream — "fp8" stores it as float8_e4m3 (half the bf16 traffic;
        # values upcast to the compute dtype inside attention). Opt-in like
        # quantize="int8": scores move at the ~1e-2 level.
        if self.kv_cache_dtype is None:
            self._cache_dtype = self.gpt_params["mel_embedding"].dtype
        elif self.kv_cache_dtype == "fp8":
            self._cache_dtype = jnp.float8_e4m3fn
        else:
            raise ValueError(f"unsupported kv_cache_dtype "
                             f"{self.kv_cache_dtype!r}; supported: 'fp8'")
        self.sample_rate = cfg.audio.sample_rate
        self.content_sample_rate = cfg.audio.content_sample_rate
        self.hifigan_scale_factor = int(
            cfg.model_args.gpt_code_stride_len // cfg.vocoder_config.hop_length)
        self.style_spec = mel_mod.MelSpec(
            sample_rate=self.sample_rate, n_fft=2048, win_length=1024,
            hop_length=256, n_mels=80, fmin=0, fmax=8000.0, scale="htk")
        self.sampler = engine.SamplerConfig(
            temperature=cfg.temperature, top_k=cfg.top_k, top_p=cfg.top_p,
            repetition_penalty=cfg.repetition_penalty)
        self._seg_len_16k = int(SEG_SECONDS * self.content_sample_rate)
        self._min_chunk_16k = int(MIN_CHUNK_FRACTION * self.content_sample_rate)
        self._cond_chunk = COND_CHUNK_SECONDS * self.sample_rate
        self._prefix_width = self.gpt_cfg.n_cond_latents + TEXT_WIDTH + 2
        self._rng = jax.random.key(self.seed)
        self.last_timing: dict = {}
        # benchmarking aid: with random (untrained) weights generation never
        # hits the stop token; cap new tokens at ratio × content codes to make
        # compute match a trained checkpoint (audio codes are ~1.875× content
        # codes: 23.44 Hz vs 12.5 Hz)
        self.gen_cap_tokens_per_code: float | None = None
        # KV-cache generation capacity actually compiled in ("unset" until
        # the first prefill trace; then None = architectural max or an int —
        # see _cache_gen_tokens)
        self._cache_gen_traced: int | None | str = "unset"
        # streaming calls kept in flight; raise when dispatch/fetch round-trip
        # latency is high relative to per-chunk compute (e.g. remote tunnels)
        self.pipeline_depth: int = 4
        # chunks decoded+vocoded per device call (each chunk still emitted as
        # a standalone 8-token window, byte-identical to single-chunk calls)
        self.chunks_per_call: int = 2
        # first emitted window size in AR tokens (latency knob): 4 halves the
        # prefill+decode+vocode compute floor before first audio vs the
        # reference's 8 (inference_utils.py:187-211); later windows keep the
        # 8-token cadence. Set to STREAM_CHUNK to mirror the reference exactly.
        self.first_chunk_tokens: int = 4
        self._build_jits()

    def _host_n_codes(self, t_real: int) -> int:
        """Content-code count for a segment of ``t_real`` samples — the exact
        host-side mirror of the device conv stride chains (ContentVec
        extractor + content dVAE), so no device fetch is needed to know it."""
        valid = t_real
        for _, k, s in contentvec.CONV_LAYERS:
            valid = max((valid - k) // s + 1, 0)
        for _ in range(self.content_dvae_cfg.num_layers):
            valid = (valid - 1) // 2 + 1
        return valid

    def _max_new(self, n_codes: int) -> int:
        max_new = self.gpt_cfg.max_gen_mel_tokens
        if self.gen_cap_tokens_per_code is not None:
            cap = max(8, int(n_codes * self.gen_cap_tokens_per_code))
            cap = int(np.ceil(cap / 16) * 16)  # bound decode_all recompiles
            max_new = min(max_new, cap)
        traced = self._cache_gen_traced
        if traced not in (None, "unset"):
            # the KV cache was traced right-sized to the generation cap; a
            # later cap increase would overflow it (writes clamp => silent
            # corruption). Fail loudly instead. The limit is derived from the
            # ACTUAL compiled cache length (incl. its 128-rounding headroom):
            # the streaming driver may dispatch up to one extra in-flight
            # call (call_sz steps) past max_new, so writes reach slot
            # prefix + max_new + call_sz - 1.
            t_cache = engine.cache_size(self.gpt_cfg, self._prefix_width,
                                        traced)
            limit = t_cache - self._prefix_width \
                - STREAM_CHUNK * self.chunks_per_call
            if max_new > limit:
                raise ValueError(
                    f"generation of {max_new} tokens exceeds the KV-cache "
                    f"capacity ({limit}) this pipeline was compiled with "
                    f"(gen_cap_tokens_per_code={self.gen_cap_tokens_per_code} "
                    "was raised after the first synthesize call); rebuild the "
                    "pipeline with the final cap")
        return max_new

    def _cache_gen_tokens(self) -> int | None:
        """Serving-sized KV-cache generation capacity (None = architectural
        max, 602 slots). Every decode step reads the ENTIRE static cache
        (L x B x H x T x hd), so its length sets the HBM floor of the AR
        loop — at large serving batch the cache read dominates even the
        weight stream. When a per-segment generation cap is active
        (``gen_cap_tokens_per_code``), generation for a full 6 s segment is
        bounded by the cap, so the cache only needs that worst case plus the
        speculative-pipeline overshoot (one extra in-flight call of
        ``STREAM_CHUNK * chunks_per_call`` decode steps) — 768 -> 384 slots
        for the flagship, halving per-step cache traffic. Evaluated at jit
        trace time and memoized so every program shares ONE cache geometry;
        set the cap before the first synthesize call (``_max_new`` raises if
        the cap is raised past the traced capacity afterwards)."""
        if self._cache_gen_traced != "unset":
            return self._cache_gen_traced
        if self.gen_cap_tokens_per_code is None:
            self._cache_gen_traced = None
            return None
        full_codes = self._host_n_codes(self._seg_len_16k)
        slack = STREAM_CHUNK * self.chunks_per_call
        self._cache_gen_traced = min(self.gpt_cfg.max_gen_mel_tokens,
                                     self._max_new(full_codes) + slack)
        return self._cache_gen_traced

    # ------------------------------------------------------------------ jits

    def _build_jits(self):
        # serving jits (serving.server) close over the programs built here
        # and the current sampler — invalidate their cache
        self._serving_jit_cache = None
        gcfg = self.gpt_cfg
        style_spec = self.style_spec
        mel_norms = self.mel_norms
        voc_cfg = self.config.vocoder_config
        sampler = self.sampler

        @jax.jit
        def cond_latent_fn(gpt_params, wav_prepadded, n_frames_valid):
            m = mel_mod.mel_torchaudio(wav_prepadded, style_spec, mel_norms,
                                       pre_padded=True)
            n_frames = m.shape[-1]
            frame_valid = jnp.arange(n_frames)[None, :] < n_frames_valid
            return gpt_model.get_style_emb(gpt_params, m, frame_valid)

        @jax.jit
        def content_fn(cv_params, cd_params, wav16k, sample_valid):
            if jnp.issubdtype(wav16k.dtype, jnp.integer):
                wav16k = wav16k.astype(jnp.float32) / 32768.0
            feats = contentvec.extract_content_features(
                cv_params, wav16k, sample_valid=sample_valid)
            feats = jnp.swapaxes(feats, 1, 2)  # (B, 256, T')
            valid = sample_valid
            for _, k, s in contentvec.CONV_LAYERS:
                valid = jnp.maximum((valid - k) // s + 1, 0)
            codes = dvae.get_codebook_indices(
                cd_params, feats, self.content_dvae_cfg, valid_len=valid)
            n_codes = valid
            for _ in range(self.content_dvae_cfg.num_layers):
                n_codes = (n_codes - 1) // 2 + 1
            return codes, n_codes

        @jax.jit
        def prefill_fn(gpt_params, cond_latents, text_codes, text_len, rng):
            prefix, valid = gpt_model.build_prefix_emb(
                gpt_params, gcfg, cond_latents, text_codes, text_len)
            state = engine.init_state(
                gcfg, self._prefix_width, text_codes.shape[0], gcfg.heads,
                gcfg.model_dim // gcfg.heads, rng,
                cache_dtype=self._cache_dtype,
                gen_tokens=self._cache_gen_tokens())
            return engine.prefill(gpt_params, gcfg, state, prefix, valid,
                                  sampler)

        @functools.partial(jax.jit, static_argnums=(2,))
        def decode_chunk_fn(gpt_params, state, chunk=STREAM_CHUNK):
            return engine.decode_chunk(gpt_params, gcfg, state, sampler,
                                       chunk=chunk)

        @functools.partial(jax.jit, static_argnums=(2,))
        def vocode_fn(hifigan_params, latents, n_static):
            # latents: (1, n_static, 1024) exact-width streaming chunk
            x = jnp.swapaxes(latents, 1, 2)
            x = linear_interp_x4(x, self.hifigan_scale_factor)
            wav = hifigan.generator_forward(hifigan_params, x, voc_cfg)
            return wav[:, 0]

        @jax.jit
        def vocode_masked_fn(hifigan_params, latents, n_valid):
            # latents: (1, W, 1024) zero-padded; n_valid true latent count
            x = jnp.swapaxes(latents, 1, 2)
            x = linear_interp_x4(x, self.hifigan_scale_factor, valid_len=n_valid)
            wav = hifigan.generator_forward(
                hifigan_params, x, voc_cfg,
                valid_len=n_valid * self.hifigan_scale_factor)
            return wav[:, 0]

        @functools.partial(jax.jit, static_argnames=("win",))
        def vocode_tail_fn(hifigan_params, all_lats, row, start, rem,
                           win=STREAM_CHUNK):
            """EOS-window remainder vocode: ``rem`` latents (traced count)
            starting at traced offset ``start`` of row ``row``, padded to the
            static ``win`` width and masked so the valid samples exactly
            match an exact-width run (vocode_masked_fn's contract). ONE
            compiled program per (B, W, win) geometry — a host-side slice
            bakes (row, start, rem) into the HLO, so live traffic with novel
            EOS geometry paid a fresh multi-hundred-ms tunnel compile
            mid-stream (profiled at 356 ms inside a timed run; see
            ROUND3_NOTES). Output is win*1024 wide; callers trim to
            rem*1024 samples."""
            # +win zero pad: start+win may overrun the buffer by up to win-1
            # (e.g. the serving tick's W=9, start=8, rem=1); without it
            # dynamic_slice would clamp start and silently shift the window
            padded = jnp.pad(all_lats, ((0, 0), (0, win), (0, 0)))
            lat = jax.lax.dynamic_slice(
                padded, (row, start, 0), (1, win, all_lats.shape[-1]))
            x = jnp.swapaxes(lat, 1, 2)
            x = linear_interp_x4(x, self.hifigan_scale_factor, valid_len=rem)
            wav = hifigan.generator_forward(
                hifigan_params, x, voc_cfg,
                valid_len=rem * self.hifigan_scale_factor)
            return wav[:, 0]

        def latent_fn(gpt_params, text_codes, text_len, gen_codes, n_gen,
                      cond_latents):
            wav_lengths = n_gen * gcfg.code_stride_len
            lat = gpt_model.forward_train(
                gpt_params, gcfg, text_codes, text_len, gen_codes, wav_lengths,
                cond_latents=cond_latents, return_latent=True, train=False)
            return lat

        # ---- fused low-sync-count paths -----------------------------------
        # the hot streaming loop runs at most ONE host<->device round trip per
        # emitted chunk: content extraction + prefill fuse into one dispatch,
        # and each chunk's [k decode steps -> x4 interp -> vocoder] is a single
        # dispatch whose outputs are double-buffered by the host driver.

        @jax.jit
        def segment_prefill_fn(cv_params, cd_params, gpt_params, hifi_params,
                               cond_latents, wav16k, sample_valid, rng):
            if jnp.issubdtype(wav16k.dtype, jnp.integer):
                # int16 PCM transfer (halves the per-segment host->device
                # bytes; exact for PCM16-derived sources)
                wav16k = wav16k.astype(jnp.float32) / 32768.0
            codes, n_codes = content_fn(cv_params, cd_params, wav16k,
                                        sample_valid)
            codes = jnp.pad(codes, ((0, 0), (0, TEXT_WIDTH - codes.shape[1])))
            state, tok0, lat0 = prefill_fn(gpt_params, cond_latents, codes,
                                           n_codes.astype(jnp.int32), rng)
            return state, tok0, lat0, n_codes, codes

        @functools.partial(jax.jit, static_argnames=("k", "win"))
        def stream_chunk_fn(gpt_params, hifi_params, state, k, carry_latents,
                            win=STREAM_CHUNK):
            """k decode steps + per-``win``-latent-window vocoding in one
            dispatch. carry width + k must be a multiple of ``win``; each
            window is vocoded EXACTLY like a standalone reference chunk
            (independent conv context), so emitting w windows per call is
            byte-identical to w single-chunk calls — it just halves
            dispatch/fetch round trips. ``win`` defaults to the 8-token
            reference cadence; the latency-critical first call uses a shorter
            window (first_chunk_tokens) to emit audio after fewer AR steps.
            Returns wavs stacked (n_windows, win*stride*4)."""
            st, toks, lats, pre_fin = engine.decode_chunk(
                gpt_params, gcfg, state, sampler, chunk=k)
            all_lats = jnp.concatenate([carry_latents, lats], axis=1)
            n_windows = all_lats.shape[1] // win
            w = all_lats[:, : n_windows * win].reshape(
                n_windows, win, all_lats.shape[-1])
            x = jnp.swapaxes(w, 1, 2)
            x = linear_interp_x4(x, self.hifigan_scale_factor)
            wavs = hifigan.generator_forward(hifi_params, x, voc_cfg)[:, 0]
            return st, toks, all_lats, pre_fin, wavs

        @functools.partial(jax.jit, static_argnames=("k", "win"))
        def stream_chunk_batch_fn(gpt_params, hifi_params, state, k,
                                  carry_latents, win=STREAM_CHUNK,
                                  row_params=None):
            """B-row variant of stream_chunk_fn: each row's completed
            ``win``-token windows fold into the vocoder batch dim. Returns
            wavs (B, n_windows, win*stride*4) — per-row windows remain
            byte-identical to standalone single-row chunks. ``row_params``
            (optional dict of (B,) arrays) decodes each row under its own
            sampler parameters — the StreamServer's per-request config path
            (None traces the scalar chain, which elides identity warpers)."""
            st, toks, lats, pre_fin = engine.decode_chunk(
                gpt_params, gcfg, state, sampler, chunk=k,
                row_params=row_params)
            all_lats = jnp.concatenate([carry_latents, lats], axis=1)
            wavs = batch_window_vocode(hifi_params, all_lats, win, voc_cfg,
                                       self.hifigan_scale_factor)
            return st, toks, all_lats, pre_fin, wavs

        @functools.partial(jax.jit, static_argnums=(2,))
        def decode_all_fn(gpt_params, state, max_new):
            return engine.decode_all(gpt_params, gcfg, state, sampler, max_new)

        @functools.partial(jax.jit, static_argnames=(
            "max_new", "num_beams", "length_penalty", "do_sample"))
        def beam_fn(gpt_params, cond_latents, text_codes, text_len,
                    prefix_fake_len, rng, max_new, num_beams,
                    length_penalty=1.0, do_sample=False):
            """Beam search (reference num_beams>1 decode modes,
            HiFiGANTrainer.inference, hifigan_trainer.py:458-470): the single
            hypothesis is tiled over the engine's batch dim. ``do_sample``
            selects HF beam_sample (multinomial beam search with the
            sampler's temperature/top-k/top-p warpers) — the mode the
            reference's ``inference(num_beams>1)`` actually reaches, since
            its ``do_sample`` defaults to True (hifigan_trainer.py:462)."""
            nb = num_beams
            cond_t = jnp.broadcast_to(
                cond_latents, (nb,) + cond_latents.shape[1:])
            codes_t = jnp.broadcast_to(text_codes,
                                       (nb, text_codes.shape[1]))
            lens_t = jnp.broadcast_to(text_len, (nb,))
            prefix, valid = gpt_model.build_prefix_emb(
                gpt_params, gcfg, cond_t, codes_t, lens_t)
            state = engine.init_state(
                gcfg, self._prefix_width, nb, gcfg.heads,
                gcfg.model_dim // gcfg.heads, rng,
                cache_dtype=self._cache_dtype,
                gen_tokens=self._cache_gen_tokens())
            return engine.decode_beam(
                gpt_params, gcfg, state, prefix, valid, max_new, nb,
                length_penalty=length_penalty,
                repetition_penalty=sampler.repetition_penalty,
                prefix_fake_len=prefix_fake_len, do_sample=do_sample,
                temperature=sampler.temperature, top_k=sampler.top_k,
                top_p=sampler.top_p)

        @functools.partial(jax.jit, static_argnames=(
            "max_new", "num_beams", "num_beam_groups", "diversity_penalty",
            "length_penalty"))
        def group_beam_fn(gpt_params, cond_latents, text_codes, text_len,
                          prefix_fake_len, rng, max_new, num_beams,
                          num_beam_groups, diversity_penalty=1.0,
                          length_penalty=1.0):
            """Group (diverse) beam search — the ``num_beam_groups > 1``
            route of the reference's vendored generator
            (stream_generator.py:308-317). Deterministic (HF rejects
            do_sample with group mode)."""
            nb = num_beams
            cond_t = jnp.broadcast_to(
                cond_latents, (nb,) + cond_latents.shape[1:])
            codes_t = jnp.broadcast_to(text_codes,
                                       (nb, text_codes.shape[1]))
            lens_t = jnp.broadcast_to(text_len, (nb,))
            prefix, valid = gpt_model.build_prefix_emb(
                gpt_params, gcfg, cond_t, codes_t, lens_t)
            state = engine.init_state(
                gcfg, self._prefix_width, nb, gcfg.heads,
                gcfg.model_dim // gcfg.heads, rng,
                cache_dtype=self._cache_dtype,
                gen_tokens=self._cache_gen_tokens())
            return engine.decode_group_beam(
                gpt_params, gcfg, state, prefix, valid, max_new, nb,
                num_beam_groups, diversity_penalty=diversity_penalty,
                length_penalty=length_penalty,
                repetition_penalty=sampler.repetition_penalty,
                prefix_fake_len=prefix_fake_len)

        @functools.partial(jax.jit, static_argnames=(
            "max_new", "top_k", "penalty_alpha"))
        def contrastive_fn(gpt_params, cond_latents, text_codes, text_len,
                           rng, max_new, top_k, penalty_alpha):
            """Contrastive search (reference penalty_alpha>0 decode mode,
            vendored HF generator stream_generator.py:264-276, 366-380): the
            single hypothesis is tiled over the engine's candidate batch."""
            k = top_k
            cond_t = jnp.broadcast_to(
                cond_latents, (k,) + cond_latents.shape[1:])
            codes_t = jnp.broadcast_to(text_codes, (k, text_codes.shape[1]))
            lens_t = jnp.broadcast_to(text_len, (k,))
            prefix, valid = gpt_model.build_prefix_emb(
                gpt_params, gcfg, cond_t, codes_t, lens_t)
            state = engine.init_state(
                gcfg, self._prefix_width, k, gcfg.heads,
                gcfg.model_dim // gcfg.heads, rng,
                cache_dtype=self._cache_dtype,
                gen_tokens=self._cache_gen_tokens())
            return engine.decode_contrastive(
                gpt_params, gcfg, state, prefix, valid, max_new, top_k=k,
                penalty_alpha=penalty_alpha,
                repetition_penalty=sampler.repetition_penalty)

        @jax.jit
        def cond_latent_batch_fn(gpt_params, ref_chunks, n_frames_valid,
                                 chunk_valid):
            """Up to 5 statically padded 6 s reference chunks -> masked-mean
            speaker latent (1, 32, D); invalid chunk rows drop out of the
            mean. One dispatch instead of one per chunk. ``ref_chunks`` ships
            as int16 PCM (exact for PCM16 sources, halves the host->device
            transfer) and converts on device; float inputs pass through
            unscaled (same guard as content_fn)."""
            if jnp.issubdtype(ref_chunks.dtype, jnp.integer):
                ref_chunks = ref_chunks.astype(jnp.float32) / 32768.0
            m = mel_mod.mel_torchaudio(ref_chunks, style_spec, mel_norms,
                                       pre_padded=True)
            n_frames = m.shape[-1]
            frame_valid = jnp.arange(n_frames)[None, :] < n_frames_valid[:, None]
            embs = gpt_model.get_style_emb(gpt_params, m, frame_valid)
            w = chunk_valid.astype(jnp.float32)[:, None, None]
            return (jnp.sum(embs * w, axis=0) /
                    jnp.maximum(jnp.sum(w), 1.0))[None]

        @jax.jit
        def cond_latent_multi_fn(gpt_params, ref_chunks, n_frames_valid,
                                 chunk_valid):
            """Batched-references variant of cond_latent_batch_fn:
            (B, 5, W) chunk rows -> (B, 32, D) per-reference masked-mean
            latents in ONE dispatch — the per-ref loop costs one tunnel RTT
            per reference in the batch/serving paths."""
            b, n_max, w_static = ref_chunks.shape
            flat = ref_chunks.reshape(b * n_max, w_static)
            if jnp.issubdtype(flat.dtype, jnp.integer):
                flat = flat.astype(jnp.float32) / 32768.0
            m = mel_mod.mel_torchaudio(flat, style_spec, mel_norms,
                                       pre_padded=True)
            n_frames = m.shape[-1]
            frame_valid = (jnp.arange(n_frames)[None, :]
                           < n_frames_valid.reshape(-1)[:, None])
            embs = gpt_model.get_style_emb(gpt_params, m, frame_valid)
            embs = embs.reshape(b, n_max, *embs.shape[1:])
            w = chunk_valid.astype(jnp.float32)[:, :, None, None]
            return (jnp.sum(embs * w, axis=1) /
                    jnp.maximum(jnp.sum(w, axis=1), 1.0))

        @functools.partial(jax.jit, static_argnames=("first_win",))
        def first_audio_fn(cv_params, cd_params, gpt_params, hifi_params,
                           ref_chunks, n_frames_valid, chunk_valid,
                           seg16k, sample_valid, rng,
                           first_win=STREAM_CHUNK):
            """Everything from raw reference + source segment to the first
            audio chunk in ONE dispatch: cond latents, content codes, prefill,
            first_win-1 decode steps, vocoder. ``first_win`` < STREAM_CHUNK
            (default 4 via first_chunk_tokens) emits the first audio after
            fewer AR steps — roughly halving the compute floor of the
            time-to-first-audio; the driver then resumes the 8-token cadence
            (the crossfade assembler smooths the one short seam exactly like
            any reference chunk boundary)."""
            cond = cond_latent_batch_fn(gpt_params, ref_chunks,
                                        n_frames_valid, chunk_valid)
            state, tok0, lat0, n_codes, codes = segment_prefill_fn(
                cv_params, cd_params, gpt_params, hifi_params, cond, seg16k,
                sample_valid, rng)
            st, toks, lats, pre_fin, wav = stream_chunk_fn(
                gpt_params, hifi_params, state, first_win - 1,
                lat0[:, None, :], win=first_win)
            return cond, st, tok0, toks, lats, pre_fin, wav, n_codes

        self._cond_latent_batch_fn = cond_latent_batch_fn
        self._cond_latent_multi_fn = cond_latent_multi_fn
        self._first_audio_fn = first_audio_fn
        self._beam_fn = beam_fn
        self._group_beam_fn = group_beam_fn
        self._contrastive_fn = contrastive_fn
        self._stream_chunk_batch_fn = stream_chunk_batch_fn
        self._segment_prefill_fn = segment_prefill_fn
        self._stream_chunk_fn = stream_chunk_fn
        self._decode_all_fn = decode_all_fn
        self._cond_latent_fn = cond_latent_fn
        self._content_fn = content_fn
        self._prefill_fn = prefill_fn
        self._decode_chunk_fn = decode_chunk_fn
        self._vocode_fn = vocode_fn
        self._vocode_masked_fn = vocode_masked_fn
        self._vocode_tail_fn = vocode_tail_fn
        self._latent_fn = jax.jit(latent_fn)

    # ------------------------------------------------------- building blocks

    def _prep_ref_chunks(self, ref_audio: np.ndarray):
        """Host prep for the conditioning reference: split into up to 5 6-s
        chunks, reflect-pad each around its true extent (host-side center
        padding trick), zero-pad to the static width. Returns
        (chunks (5, W), n_frames_valid (5,), chunk_valid (5,))."""
        sr = self.sample_rate
        audio = np.asarray(ref_audio)
        if audio.shape[1] > sr * COND_MAX_SECONDS:
            audio = audio[:, : sr * COND_MAX_SECONDS]
        pad_fft = self.style_spec.n_fft // 2
        static_w = self._cond_chunk + 2 * pad_fft
        n_max = COND_MAX_SECONDS // COND_CHUNK_SECONDS
        chunks = np.zeros((n_max, static_w), np.float32)  # quantized to int16 on return
        n_frames = np.zeros((n_max,), np.int32)
        valid = np.zeros((n_max,), bool)
        row = 0
        for i in range(0, audio.shape[1], self._cond_chunk):
            chunk = audio[:, i : i + self._cond_chunk]
            if chunk.shape[-1] < sr * 0.33:
                continue
            t_real = chunk.shape[-1]
            padded = np.pad(chunk, ((0, 0), (pad_fft, pad_fft)), mode="reflect")
            chunks[row, : padded.shape[1]] = padded[0]
            n_frames[row] = t_real // self.style_spec.hop_length + 1
            valid[row] = True
            row += 1
        pcm = np.clip(np.rint(chunks * 32768.0), -32768, 32767).astype(np.int16)
        return pcm, n_frames, valid

    def get_gpt_cond_latents(self, ref_audio: np.ndarray) -> jnp.ndarray:
        """(1, T) 24 kHz reference audio -> (1, 32, D) speaker latents
        (reference: hifigan_trainer.py:438-455 — 6 s chunks, ≤30 s, mean)."""
        chunks, n_frames, valid = self._prep_ref_chunks(ref_audio)
        return self._cond_latent_batch_fn(
            self.gpt_params, jnp.asarray(chunks), jnp.asarray(n_frames),
            jnp.asarray(valid))

    def get_gpt_cond_latents_batch(self, ref_audios) -> jnp.ndarray:
        """List of B (1, T) references -> (B, 32, D) latents in ONE dispatch
        (vs one per reference): host-side chunk prep stacks to (B, 5, W) and
        the masked-mean over each reference's valid chunks runs on device."""
        preps = [self._prep_ref_chunks(r) for r in ref_audios]
        chunks = np.stack([p[0] for p in preps])
        frames = np.stack([p[1] for p in preps])
        valid = np.stack([p[2] for p in preps])
        return self._cond_latent_multi_fn(
            self.gpt_params, jnp.asarray(chunks), jnp.asarray(frames),
            jnp.asarray(valid))

    def _get_gpt_cond_latents_loop(self, ref_audio: np.ndarray) -> jnp.ndarray:
        """Per-chunk variant kept for parity testing against the batch path."""
        sr = self.sample_rate
        audio = np.asarray(ref_audio)
        if audio.shape[1] > sr * COND_MAX_SECONDS:
            audio = audio[:, : sr * COND_MAX_SECONDS]
        pad_fft = self.style_spec.n_fft // 2
        static_w = self._cond_chunk + 2 * pad_fft
        embs = []
        for i in range(0, audio.shape[1], self._cond_chunk):
            chunk = audio[:, i : i + self._cond_chunk]
            if chunk.shape[-1] < sr * 0.33:
                continue
            t_real = chunk.shape[-1]
            padded = np.pad(chunk, ((0, 0), (pad_fft, pad_fft)), mode="reflect")
            padded = np.pad(padded, ((0, 0), (0, static_w - padded.shape[1])))
            n_frames = t_real // self.style_spec.hop_length + 1
            emb = self._cond_latent_fn(self.gpt_params, jnp.asarray(padded),
                                       jnp.int32(n_frames))
            embs.append(emb)
        return jnp.mean(jnp.stack(embs), axis=0)

    @staticmethod
    def _pcm16(x: np.ndarray) -> np.ndarray:
        """Quantize to int16 PCM for the host->device transfer (halves bytes
        through slow links). Quantization noise is bounded at 1 LSB (~-90 dB)
        — resampled sources are float-valued by the time they reach here — and
        every source driver quantizes identically, so all code paths see the
        same signal."""
        return np.clip(np.rint(np.asarray(x) * 32768.0),
                       -32768, 32767).astype(np.int16)

    def extract_content_codes(self, seg16k: np.ndarray):
        """(1, t) 16 kHz segment (t <= 6 s) -> (codes (1, TEXT_WIDTH), n)."""
        t_real = seg16k.shape[-1]
        padded = np.pad(seg16k, ((0, 0), (0, self._seg_len_16k - t_real)))
        codes, n = self._content_fn(self.contentvec_params,
                                    self.content_dvae_params,
                                    jnp.asarray(self._pcm16(padded)),
                                    jnp.asarray([t_real], jnp.int32))
        n = int(n[0])
        codes = jnp.pad(codes, ((0, 0), (0, TEXT_WIDTH - codes.shape[1])))
        return codes, n

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _segments(self, src_wav: np.ndarray):
        """Split the source into 6 s segments, final one padded to >= 0.32 s
        (reference inference_utils.py:43-50); yields (padded_seg, true_len)."""
        total = src_wav.shape[-1]
        for i in range(0, total, self._seg_len_16k):
            seg = src_wav[:, i : i + self._seg_len_16k]
            t_real = seg.shape[-1]
            if t_real < self._min_chunk_16k:
                t_real = self._min_chunk_16k
            padded = np.pad(seg, ((0, 0), (0, self._seg_len_16k - seg.shape[-1])))
            yield padded, t_real

    def _start_segment(self, seg_padded: np.ndarray, t_real: int):
        return self._segment_prefill_fn(
            self.contentvec_params, self.content_dvae_params, self.gpt_params,
            self.hifigan_params, self._cond_latent,
            jnp.asarray(self._pcm16(seg_padded)),
            jnp.asarray([t_real], jnp.int32), self._next_rng())

    def generate_segment_codes(self, codes, n_codes: int, num_beams: int = 1,
                               length_penalty: float = 1.0,
                               penalty_alpha: float = 0.0,
                               contrastive_top_k: int = 4,
                               beam_do_sample: bool = False,
                               num_beam_groups: int = 1,
                               diversity_penalty: float = 1.0):
        """AR generation for one segment via the single-dispatch on-device
        while_loop; returns (list of generated tokens incl. the stop token,
        None). ``num_beams > 1`` switches to beam search with
        ``length_penalty`` (``beam_do_sample=True`` = HF beam_sample with
        the pipeline sampler's warpers — what the reference's
        ``inference(num_beams>1)`` reaches, do_sample defaulting True);
        ``num_beam_groups > 1`` (with ``num_beams > 1``) to group/diverse
        beam search with ``diversity_penalty`` (stream_generator.py:308-317);
        ``penalty_alpha > 0`` (with ``num_beams == 1``) switches to
        contrastive search over ``contrastive_top_k`` candidates
        (vendored HF generator modes, stream_generator.py:264-380). Kept for
        API parity/tests."""
        max_new = self._max_new(n_codes)
        if num_beams <= 1 and penalty_alpha > 0.0:
            buf, n_tok = self._contrastive_fn(
                self.gpt_params, self._cond_latent, codes,
                jnp.asarray([n_codes], jnp.int32)[0], self._next_rng(),
                max_new=max_new, top_k=contrastive_top_k,
                penalty_alpha=float(penalty_alpha))
            n = int(n_tok)
            return [int(t) for t in np.asarray(buf)[:n]], None
        if num_beams > 1 and num_beam_groups > 1:
            if beam_do_sample:
                raise ValueError("group beam search is deterministic; "
                                 "do_sample is not supported with "
                                 "num_beam_groups > 1 (HF rejects it too)")
            prefix_fake_len = self.gpt_cfg.n_cond_latents + n_codes + 3
            buf, n_tok = self._group_beam_fn(
                self.gpt_params, self._cond_latent, codes,
                jnp.asarray([n_codes], jnp.int32)[0],
                jnp.float32(prefix_fake_len), self._next_rng(),
                max_new=max_new, num_beams=num_beams,
                num_beam_groups=num_beam_groups,
                diversity_penalty=float(diversity_penalty),
                length_penalty=length_penalty)
            n = int(n_tok)
            return [int(t) for t in np.asarray(buf)[:n]], None
        if num_beams > 1:
            # HF normalizes by the fake input_ids length: cond latents +
            # [start_text | codes | stop_text] + start_audio
            prefix_fake_len = self.gpt_cfg.n_cond_latents + n_codes + 3
            buf, n_tok = self._beam_fn(
                self.gpt_params, self._cond_latent, codes,
                jnp.asarray([n_codes], jnp.int32)[0],
                jnp.float32(prefix_fake_len), self._next_rng(),
                max_new=max_new, num_beams=num_beams,
                length_penalty=length_penalty, do_sample=beam_do_sample)
            n = int(n_tok)
            return [int(t) for t in np.asarray(buf)[:n]], None
        state, tok0, lat0 = self._prefill_fn(
            self.gpt_params, self._cond_latent, codes,
            jnp.asarray([n_codes], jnp.int32), self._next_rng())
        state, toks, n_gen = self._decode_all_fn(self.gpt_params, state,
                                                 max_new)
        n = int(n_gen[0])
        return [int(t) for t in np.asarray(toks)[0, :n]], None

    # ------------------------------------------------------------ public API

    def synthesize(self, src_wav: np.ndarray, ref_audio: np.ndarray,
                   num_beams: int = 1, length_penalty: float = 1.0,
                   penalty_alpha: float = 0.0, contrastive_top_k: int = 4,
                   beam_do_sample: bool = False, num_beam_groups: int = 1,
                   diversity_penalty: float = 1.0) -> np.ndarray:
        """Non-streaming VC (reference synthesize_utt, inference_utils.py:24-89).

        src_wav: (1, T) @16 kHz; ref_audio: (1, T) @24 kHz -> (T_out,) @24 kHz.
        Four device dispatches per segment: cond latent (once), fused
        content+prefill, decode_all while_loop, teacher-forced latent pass;
        then one masked full-utterance vocoder call. ``num_beams > 1``
        decodes each segment with deterministic beam search (the reference
        HiFiGANTrainer.inference surface, hifigan_trainer.py:458-470);
        ``penalty_alpha > 0`` with contrastive search (vendored HF generator
        mode, stream_generator.py:264-380).
        """
        self._cond_latent = self.get_gpt_cond_latents(ref_audio)
        final_latents = []
        for seg, t_real in self._segments(src_wav):
            state, tok0, lat0, n_codes_dev, codes = self._start_segment(seg, t_real)
            n_codes = int(n_codes_dev[0])
            max_new = self._max_new(n_codes)
            if num_beams > 1 or penalty_alpha > 0.0:
                toks_list, _ = self.generate_segment_codes(
                    codes, n_codes, num_beams=num_beams,
                    length_penalty=length_penalty,
                    penalty_alpha=penalty_alpha,
                    contrastive_top_k=contrastive_top_k,
                    beam_do_sample=beam_do_sample,
                    num_beam_groups=num_beam_groups,
                    diversity_penalty=diversity_penalty)
                toks_np = np.asarray(toks_list, np.int32)
            else:
                state, toks, n_gen = self._decode_all_fn(self.gpt_params,
                                                         state, max_new)
                toks_np = np.asarray(toks)[0, : int(n_gen[0])]
            gen = [int(t) for t in toks_np if t != self.gpt_cfg.stop_audio_token]
            if not gen:
                continue
            n = len(gen)
            wm = _bucket(n + 3)
            gen_arr = np.zeros((1, wm), np.int32)
            gen_arr[0, :n] = gen
            lat = self._latent_fn(self.gpt_params, codes,
                                  jnp.asarray([n_codes], jnp.int32),
                                  jnp.asarray(gen_arr),
                                  jnp.asarray([n], jnp.int32),
                                  self._cond_latent)
            final_latents.append(np.asarray(lat)[0, :n])
        if not final_latents:
            # every segment decoded straight to the stop token (a legal HF
            # outcome — e.g. beam modes may finalize an empty hypothesis);
            # return empty audio instead of crashing
            return np.zeros((0,), np.float32)
        lat_all = np.concatenate(final_latents, axis=0)
        n_lat = lat_all.shape[0]
        w = _bucket(n_lat)
        lat_pad = np.zeros((1, w, lat_all.shape[-1]), np.float32)
        lat_pad[0, :n_lat] = lat_all
        wav = self._vocode_masked_fn(self.hifigan_params, jnp.asarray(lat_pad),
                                     jnp.int32(n_lat))
        n_out = n_lat * self.gpt_cfg.code_stride_len
        return np.asarray(wav)[0, :n_out]

    def synthesize_batch(self, src_wavs, ref_audios):
        """Batched offline conversion — throughput serving mode (no reference
        analogue; the engine's batch dimension does B utterances' AR decode in
        the same device passes).

        src_wavs / ref_audios: lists of (1, T) arrays @16 kHz / @24 kHz.
        Returns a list of (T_out,) waveforms @24 kHz, one per utterance.
        """
        bsz = len(src_wavs)
        conds = self.get_gpt_cond_latents_batch(ref_audios)

        # segment-align across the batch: round r processes every utterance's
        # r-th 6 s segment (missing segments ride along masked and are dropped)
        seg_lists = [list(self._segments(s)) for s in src_wavs]
        max_rounds = max(len(s) for s in seg_lists)
        latents_per_utt = [[] for _ in range(bsz)]

        for r in range(max_rounds):
            rows = []
            t_reals = []
            active = []
            for i, segs in enumerate(seg_lists):
                if r < len(segs):
                    seg, t_real = segs[r]
                    active.append(True)
                else:
                    seg = np.zeros((1, self._seg_len_16k), np.float32)
                    t_real = self._min_chunk_16k
                    active.append(False)
                rows.append(seg[0])
                t_reals.append(t_real)
            seg_batch = jnp.asarray(self._pcm16(np.stack(rows)))
            sv = jnp.asarray(t_reals, jnp.int32)
            codes, n_codes_dev = self._content_fn(
                self.contentvec_params, self.content_dvae_params, seg_batch, sv)
            codes = jnp.pad(codes, ((0, 0), (0, TEXT_WIDTH - codes.shape[1])))
            n_codes = [self._host_n_codes(t) for t in t_reals]
            state, tok0, lat0 = self._prefill_fn(
                self.gpt_params, conds, codes,
                jnp.asarray(n_codes, jnp.int32), self._next_rng())
            max_new = max(self._max_new(n) for n in n_codes)
            state, toks, n_gen = self._decode_all_fn(self.gpt_params, state,
                                                     max_new)
            toks_np = np.asarray(toks)
            n_gen_np = np.asarray(n_gen)

            gens = []
            stop = self.gpt_cfg.stop_audio_token
            for i in range(bsz):
                if active[i]:
                    g = [int(t) for t in toks_np[i, : int(n_gen_np[i])]
                         if t != stop]
                    # per-row generation cap (the batch decodes to the max cap)
                    g = g[: self._max_new(n_codes[i])]
                else:
                    g = []
                gens.append(g)
            n_max = max((len(g) for g in gens), default=0)
            if n_max == 0:
                continue
            wm = _bucket(n_max + 3)
            gen_arr = np.zeros((bsz, wm), np.int32)
            n_arr = np.zeros((bsz,), np.int32)
            for i, g in enumerate(gens):
                gen_arr[i, : len(g)] = g
                n_arr[i] = max(len(g), 1)
            lat = self._latent_fn(self.gpt_params, codes,
                                  jnp.asarray(n_codes, jnp.int32),
                                  jnp.asarray(gen_arr), jnp.asarray(n_arr),
                                  conds)
            lat_np = np.asarray(lat)
            for i, g in enumerate(gens):
                if active[i] and g:
                    latents_per_utt[i].append(lat_np[i, : len(g)])

        outs = []
        for i in range(bsz):
            if not latents_per_utt[i]:
                outs.append(np.zeros((0,), np.float32))
                continue
            lat_all = np.concatenate(latents_per_utt[i], axis=0)
            n_lat = lat_all.shape[0]
            w = _bucket(n_lat)
            lat_pad = np.zeros((1, w, lat_all.shape[-1]), np.float32)
            lat_pad[0, :n_lat] = lat_all
            wav = self._vocode_masked_fn(self.hifigan_params,
                                         jnp.asarray(lat_pad), jnp.int32(n_lat))
            outs.append(np.asarray(wav)[0, : n_lat * self.gpt_cfg.code_stride_len])
        return outs

    def synthesize_streaming(self, src_wav: np.ndarray, ref_audio: np.ndarray,
                             stream_chunk_size: int = STREAM_CHUNK,
                             verbose: bool = True):
        """Streaming VC (reference synthesize_utt_streaming,
        inference_utils.py:136-217). Returns (wav, latency_s, rtf).

        Double-buffered driver: chunk N+1 is dispatched before chunk N's audio
        is fetched, so the tunnel/dispatch round trip overlaps with decode.
        Python GC is paused for the duration of the call (a collection pause
        inside the first-chunk window is a latency-tail outlier); timings of
        the first-chunk sub-phases land in ``self.last_timing``.
        """
        import gc

        gc_was_enabled = gc.isenabled()
        gc.disable()
        try:
            return self._synthesize_streaming(src_wav, ref_audio,
                                              stream_chunk_size, verbose)
        finally:
            if gc_was_enabled:
                gc.enable()

    def _synthesize_streaming(self, src_wav, ref_audio,
                              stream_chunk_size=STREAM_CHUNK,
                              verbose=True):
        begin = time.perf_counter()
        timing = self.last_timing = {}
        total = src_wav.shape[-1]
        stop = self.gpt_cfg.stop_audio_token
        csz = stream_chunk_size
        d = self.gpt_cfg.model_dim
        pred_audios = []
        wav_overlap = None
        latency = None

        def emit(wav_gen):
            nonlocal wav_overlap, latency
            chunk_wav, wav_overlap = _handle_chunk(np.asarray(wav_gen),
                                                   wav_overlap, CROSSFADE)
            pred_audios.append(chunk_wav)
            if latency is None:
                latency = time.perf_counter() - begin
                if verbose:
                    print(f"Latency: {latency:.3f}s")

        empty_carry = jnp.zeros((1, 0, d), jnp.float32)
        depth = self.pipeline_depth
        ref_chunks, ref_frames, ref_valid = self._prep_ref_chunks(ref_audio)
        timing["host_prep_ms"] = (time.perf_counter() - begin) * 1000
        self._cond_latent = None

        def prefetch(entry):
            # start the device->host copies as soon as the chunk is dispatched
            # so the consuming device_get is a local cache hit (fetch latency
            # overlaps decode instead of serializing after it)
            (_, toks, _, pre_fin, wav), _, _ = entry
            try:
                toks.copy_to_host_async()
                pre_fin.copy_to_host_async()
                wav.copy_to_host_async()
            except Exception:
                pass
            return entry

        # inflight entries: ((state, toks, lats, pre_fin, wavs), win, carry_n)
        # — win is the vocoder window size this call used (first window may be
        # shorter than csz for latency), carry_n the latents carried in from
        # the previous context (1 for the prefill latent, else 0)
        first_win = max(1, min(self.first_chunk_tokens, csz))
        for seg, t_real in self._segments(src_wav):
            if self._cond_latent is None:
                # first segment: ref conditioning -> ... -> first audio chunk
                # in a single device dispatch (latency-critical); the first
                # window is first_win tokens (prefill latent + first_win-1
                # decode steps) — audio leaves the device after ~half the AR
                # steps of the reference's 8-token first chunk
                (cond, state, tok0, ctoks, clats, cpre_fin, cwav,
                 n_codes_dev) = self._first_audio_fn(
                    self.contentvec_params, self.content_dvae_params,
                    self.gpt_params, self.hifigan_params,
                    jnp.asarray(ref_chunks), jnp.asarray(ref_frames),
                    jnp.asarray(ref_valid), jnp.asarray(self._pcm16(seg)),
                    jnp.asarray([t_real], jnp.int32), self._next_rng(),
                    first_win=first_win)
                timing["first_dispatch_ms"] = \
                    (time.perf_counter() - begin) * 1000
                self._cond_latent = cond
                inflight = [prefetch(
                    ((state, ctoks, clats, cpre_fin, cwav), first_win, 1))]
            else:
                state, tok0, lat0, n_codes_dev, _ = self._start_segment(
                    seg, t_real)
                # first fused chunk: prefill latent + (csz-1) decode steps
                # (later segments are not latency-critical; keep the 8-cadence)
                inflight = [prefetch((self._stream_chunk_fn(
                    self.gpt_params, self.hifigan_params, state, csz - 1,
                    lat0[:, None, :]), csz, 1))]
            # speculative pipeline: keep `depth` chunks in flight so the
            # host<->device round trip amortizes over depth x chunk compute.
            # Chunks decoded past EOS are garbage (finished rows emit stop
            # tokens) and are simply dropped.
            # n_codes is a deterministic function of the segment length
            # (conv stride chains) — computed on host so the latency path has
            # ZERO scalar fetches before the first audio chunk
            n_codes = self._host_n_codes(t_real)
            max_new = self._max_new(n_codes)
            n_total = 1
            call_sz = csz * self.chunks_per_call
            while (len(inflight) < depth and
                   n_total + sum(e[0][1].shape[1] for e in inflight) < max_new):
                inflight.append(prefetch((self._stream_chunk_fn(
                    self.gpt_params, self.hifigan_params, inflight[-1][0][0],
                    call_sz, empty_carry), csz, 0)))

            first_chunk = True
            seg_done = False
            while inflight and not seg_done:
                (st, toks, lats, pre_fin, wavs), win, carry_n = \
                    inflight.pop(0)
                # top up the pipeline before consuming this call (each later
                # call is chunks_per_call chunks of csz)
                queued = sum(e[0][1].shape[1] for e in inflight)
                if n_total + queued + call_sz < max_new:
                    tail_state = inflight[-1][0][0] if inflight else st
                    inflight.append(prefetch((self._stream_chunk_fn(
                        self.gpt_params, self.hifigan_params, tail_state,
                        call_sz, empty_carry), csz, 0)))
                toks_np, wavs_np, pre_fin_np = jax.device_get(
                    (toks, wavs, pre_fin))  # one sync
                timing.setdefault("first_fetch_ms",
                                  (time.perf_counter() - begin) * 1000)
                toks_np = toks_np[0]
                if first_chunk and bool(pre_fin_np[0, 0]):
                    # EOS at the very first (prefill-sampled) token: the
                    # reference vocodes just that token's latent
                    wav_gen = self._vocode_tail_fn(self.hifigan_params, lats,
                                                   0, 0, 1, win=win)
                    emit(np.asarray(wav_gen)[0, : self.gpt_cfg.code_stride_len])
                    break
                first_chunk = False
                k = len(toks_np)
                # emit complete windows up to (and including) the EOS window
                eos_j, n_lat_valid, full, rem = window_accounting(
                    toks_np, n_total, max_new, stop, carry_n, win)
                n_windows = wavs_np.shape[0]
                for w in range(min(full, n_windows)):
                    emit(wavs_np[w])
                if eos_j is not None:
                    if rem > 0:
                        wav_gen = self._vocode_tail_fn(
                            self.hifigan_params, lats, 0, full * win, rem,
                            win=win)
                        emit(np.asarray(wav_gen)
                             [0, : rem * self.gpt_cfg.code_stride_len])
                    seg_done = True
                else:
                    n_total += k

        wav = np.concatenate(pred_audios, axis=-1)
        elapsed = time.perf_counter() - begin
        rtf = elapsed / (total / self.content_sample_rate)
        if verbose:
            print(f"Real-time factor: {rtf:.3f}")
        return wav, latency, rtf

    def synthesize_streaming_batch(self, src_wavs, ref_audios,
                                   stream_chunk_size: int = STREAM_CHUNK,
                                   verbose: bool = True):
        """Streaming serving mode: B utterances stream in lockstep through the
        batched decode engine — per-row EOS, per-row crossfade assembly. This
        is the TPU throughput play (no reference analogue; the reference
        streams one utterance per GPU): aggregate RTF per chip scales with B
        at nearly flat per-call cost because decode is HBM-bound gemv work.

        src_wavs / ref_audios: lists of (1, T) arrays @16 kHz / @24 kHz.
        Returns (list of (T_out,) wavs @24 kHz, per-row first-chunk latency
        list in seconds, aggregate RTF = elapsed / total input audio).
        """
        import gc

        # same latency-tail mitigations as the single-row path: GC pauses
        # inside a first-chunk window are avoidable outliers
        gc_was_enabled = gc.isenabled()
        gc.disable()
        try:
            return self._synthesize_streaming_batch(
                src_wavs, ref_audios, stream_chunk_size, verbose)
        finally:
            if gc_was_enabled:
                gc.enable()

    def _synthesize_streaming_batch(self, src_wavs, ref_audios,
                                    stream_chunk_size: int = STREAM_CHUNK,
                                    verbose: bool = True):
        begin = time.perf_counter()
        bsz = len(src_wavs)
        stop = self.gpt_cfg.stop_audio_token
        csz = stream_chunk_size
        d = self.gpt_cfg.model_dim
        outs = [[] for _ in range(bsz)]
        overlaps = [None] * bsz
        latencies = [None] * bsz

        def emit(i, wav_np):
            chunk, overlaps[i] = _handle_chunk(wav_np, overlaps[i], CROSSFADE)
            outs[i].append(chunk)
            if latencies[i] is None:
                latencies[i] = time.perf_counter() - begin

        conds = self.get_gpt_cond_latents_batch(ref_audios)
        seg_lists = [list(self._segments(s)) for s in src_wavs]
        max_rounds = max(len(s) for s in seg_lists)
        empty_carry = jnp.zeros((bsz, 0, d), jnp.float32)
        depth = self.pipeline_depth
        call_sz = csz * self.chunks_per_call
        first_win = max(1, min(self.first_chunk_tokens, csz))

        def prefetch(entry):
            # device->host copies start at dispatch (fetch overlaps decode
            # instead of serializing after it — same as the single-row path)
            (_, toks, _, pre_fin, wavs), _, _ = entry
            try:
                toks.copy_to_host_async()
                pre_fin.copy_to_host_async()
                wavs.copy_to_host_async()
            except Exception:
                pass
            return entry

        for r in range(max_rounds):
            rows, t_reals, active = [], [], []
            for i, segs in enumerate(seg_lists):
                if r < len(segs):
                    seg, t_real = segs[r]
                    active.append(True)
                else:
                    seg = np.zeros((1, self._seg_len_16k), np.float32)
                    t_real = self._min_chunk_16k
                    active.append(False)
                rows.append(seg[0])
                t_reals.append(t_real)
            codes, _ = self._content_fn(
                self.contentvec_params, self.content_dvae_params,
                jnp.asarray(self._pcm16(np.stack(rows))),
                jnp.asarray(t_reals, jnp.int32))
            codes = jnp.pad(codes, ((0, 0), (0, TEXT_WIDTH - codes.shape[1])))
            n_codes = [self._host_n_codes(t) for t in t_reals]
            state, tok0, lat0 = self._prefill_fn(
                self.gpt_params, conds, codes,
                jnp.asarray(n_codes, jnp.int32), self._next_rng())
            caps = [self._max_new(n) if active[i] else 1
                    for i, n in enumerate(n_codes)]
            hard_cap = max(caps)
            done = [not a for a in active]

            # round 0 emits each row's FIRST audio: use the short first
            # window (first_win tokens) like the single-row latency path;
            # later rounds are not latency-critical
            win0 = first_win if r == 0 else csz
            inflight = [prefetch((self._stream_chunk_batch_fn(
                self.gpt_params, self.hifigan_params, state, win0 - 1,
                lat0[:, None, :], win=win0), win0, 1))]
            n_total = 1
            first_call = True
            while (len(inflight) < depth and
                   n_total + sum(e[0][1].shape[1] for e in inflight)
                   < hard_cap):
                inflight.append(prefetch((self._stream_chunk_batch_fn(
                    self.gpt_params, self.hifigan_params, inflight[-1][0][0],
                    call_sz, empty_carry), csz, 0)))

            while inflight and not all(done):
                (st, toks, lats, pre_fin, wavs), win, carry_n = \
                    inflight.pop(0)
                queued = sum(e[0][1].shape[1] for e in inflight)
                if (not all(done)
                        and n_total + queued + call_sz < hard_cap):
                    tail_state = inflight[-1][0][0] if inflight else st
                    inflight.append(prefetch((self._stream_chunk_batch_fn(
                        self.gpt_params, self.hifigan_params, tail_state,
                        call_sz, empty_carry), csz, 0)))
                toks_np, wavs_np, pre_fin_np = jax.device_get(
                    (toks, wavs, pre_fin))  # one sync per call
                k = toks_np.shape[1]
                nw = wavs_np.shape[1]
                for i in range(bsz):
                    if done[i]:
                        continue
                    if first_call and bool(pre_fin_np[i, 0]):
                        # EOS at the prefill-sampled token: vocode only it
                        wav1 = self._vocode_tail_fn(self.hifigan_params, lats,
                                                    i, 0, 1, win=win)
                        emit(i, np.asarray(wav1)
                             [0, : self.gpt_cfg.code_stride_len])
                        done[i] = True
                        continue
                    eos_j, n_lat_valid, full, rem = window_accounting(
                        toks_np[i], n_total, caps[i], stop, carry_n, win)
                    for w in range(min(full, nw)):
                        emit(i, wavs_np[i, w])
                    if eos_j is not None:
                        if rem > 0:
                            wav_gen = self._vocode_tail_fn(
                                self.hifigan_params, lats, i, full * win,
                                rem, win=win)
                            emit(i, np.asarray(wav_gen)
                                 [0, : rem * self.gpt_cfg.code_stride_len])
                        done[i] = True
                first_call = False
                n_total += k

        wavs_out = [np.concatenate(o, axis=-1) if o
                    else np.zeros((0,), np.float32) for o in outs]
        elapsed = time.perf_counter() - begin
        total_audio = sum(s.shape[-1] for s in src_wavs) / self.content_sample_rate
        agg_rtf = elapsed / total_audio
        if verbose:
            lat_s = [f"{v:.3f}" if v is not None else "-" for v in latencies]
            print(f"Batch latencies (s): {lat_s}")
            print(f"Aggregate real-time factor: {agg_rtf:.3f} "
                  f"({bsz} streams)")
        return wavs_out, latencies, agg_rtf

    def warmup(self, streaming: bool = True):
        """Compile the hot path so first-chunk latency excludes compilation."""
        rng = np.random.default_rng(0)
        d = self.gpt_cfg.model_dim
        ref = (rng.standard_normal((1, self._cond_chunk)) * 0.05).astype(np.float32)
        src = (rng.standard_normal((1, self._seg_len_16k)) * 0.05).astype(np.float32)
        self._cond_latent = self.get_gpt_cond_latents(ref)
        state, tok0, lat0, n_codes, codes = self._start_segment(
            src, self._seg_len_16k)
        if streaming:
            chunks, frames, valid = self._prep_ref_chunks(ref)
            out = self._first_audio_fn(
                self.contentvec_params, self.content_dvae_params,
                self.gpt_params, self.hifigan_params, jnp.asarray(chunks),
                jnp.asarray(frames), jnp.asarray(valid),
                jnp.asarray(self._pcm16(src)),
                jnp.asarray([self._seg_len_16k], jnp.int32), self._next_rng(),
                first_win=max(1, min(self.first_chunk_tokens, STREAM_CHUNK)))
            cur1 = self._stream_chunk_fn(self.gpt_params, self.hifigan_params,
                                         state, STREAM_CHUNK - 1,
                                         lat0[:, None, :])
            cur = self._stream_chunk_fn(
                self.gpt_params, self.hifigan_params, cur1[0],
                STREAM_CHUNK * self.chunks_per_call,
                jnp.zeros((1, 0, d), jnp.float32))
            # EOS-remainder tail program: ONE compile per (W, win) geometry
            # (traced start/rem — replaces the old per-rem exact-width
            # vocoder variants: 8 compiles collapsed to 3, and no mid-stream
            # compile when live traffic hits a novel EOS offset)
            fw = max(1, min(self.first_chunk_tokens, STREAM_CHUNK))
            self._vocode_tail_fn(self.hifigan_params, out[4], 0, 0, 1, win=fw)
            self._vocode_tail_fn(self.hifigan_params, cur1[2], 0, 0, 1,
                                 win=STREAM_CHUNK)
            self._vocode_tail_fn(self.hifigan_params, cur[2], 0, 0, 1,
                                 win=STREAM_CHUNK)
            jax.block_until_ready(cur[0].cache_k)
            jax.block_until_ready(out[0])
        else:
            max_new = self._max_new(75)
            state, toks, n_gen = self._decode_all_fn(self.gpt_params, state,
                                                     max_new)
            lat = jnp.zeros((1, LATENT_BUCKET, d), jnp.float32)
            self._vocode_masked_fn(self.hifigan_params, lat, jnp.int32(60))
            gen_arr = jnp.zeros((1, LATENT_BUCKET), jnp.int32)
            self._latent_fn(self.gpt_params, codes,
                            jnp.asarray([60], jnp.int32), gen_arr,
                            jnp.asarray([60], jnp.int32),
                            self._cond_latent)
            jax.block_until_ready(n_gen)


def batch_window_vocode(hifi_params, all_lats, win: int, voc_cfg, scale: int):
    """Fold each row's completed ``win``-latent windows into the vocoder
    batch dim: (B, W, D) latents -> (B, W//win, win*scale*4) audio. Each
    window is vocoded with independent conv context, byte-identical to a
    standalone single-window call — shared by the lockstep batch driver and
    the serving tick."""
    b, w, dd = all_lats.shape
    n_windows = w // win
    wr = all_lats[:, : n_windows * win].reshape(b * n_windows, win, dd)
    x = jnp.swapaxes(wr, 1, 2)
    x = linear_interp_x4(x, scale)
    wavs = hifigan.generator_forward(hifi_params, x, voc_cfg)[:, 0]
    return wavs.reshape(b, n_windows, -1)


def window_accounting(toks, n_total: int, max_new: int, stop: int,
                      carry_n: int, win: int):
    """Shared EOS/cap scan + window arithmetic for one decode call's fetched
    tokens (reference consumer semantics, inference_utils.py:187-211) — used
    by the single-stream driver, the lockstep batch driver, and the
    continuous-batching StreamServer so their emission logic can never
    diverge.

    Returns ``(eos_j, n_lat_valid, full, rem)``: ``eos_j`` the index of the
    last valid token within ``toks`` (None = segment continues past this
    call), ``n_lat_valid`` the valid latent count incl. the ``carry_n``
    carried latents, ``full`` the number of complete ``win``-sized windows
    to emit, ``rem`` the remainder latents to vocode exact-width when the
    segment ends here.
    """
    k = len(toks)
    eos_j = None
    for j, t in enumerate(toks):
        if n_total + j + 1 > max_new:
            eos_j = j - 1
            break
        if t == stop:
            eos_j = j
            break
    if eos_j is None and n_total + k >= max_new:
        eos_j = k - 1
    n_lat_valid = carry_n + (k if eos_j is None else eos_j + 1)
    full = n_lat_valid // win
    rem = n_lat_valid - full * win
    return eos_j, n_lat_valid, full, rem


def _handle_chunk(wav_gen: np.ndarray, wav_overlap, overlap_len: int):
    """Crossfade chunk assembly (reference handle_chunks,
    inference_utils.py:5-21)."""
    wav_chunk = wav_gen[:-overlap_len]
    if wav_overlap is not None:
        if overlap_len > len(wav_chunk):
            return wav_gen[-overlap_len:], wav_gen[-overlap_len:]
        ramp = np.linspace(0.0, 1.0, overlap_len, dtype=np.float32)
        wav_chunk = wav_chunk.copy()
        wav_chunk[:overlap_len] = wav_overlap * (1.0 - ramp) + \
            wav_chunk[:overlap_len] * ramp
    return wav_chunk, wav_gen[-overlap_len:]


# ---------------------------------------------------------------------------
# Model init


def model_init(checkpoint_path: str, compute_dtype=jnp.float32,
               seed: int = 0, quantize: str | None = None,
               kv_cache_dtype: str | None = None) -> GenVCPipeline:
    """Load a GenVC bundle (torch ``.pth`` or converted ``.npz``) and build the
    inference pipeline (reference: inference/model_init.py:7-34).

    ``quantize="int8"`` quantizes the GPT decode weights to int8
    (ops.quant) — halves the per-AR-step HBM weight stream and runs the
    contractions on the MXU's 2x int8 path. Opt-in: logits move at the ~1e-2
    relative level, which can flip sampled tokens vs the bf16 path.

    ``kv_cache_dtype="fp8"`` stores the decode KV cache as float8_e4m3 —
    halves the per-step cache read, which dominates HBM traffic at serving
    batch. Opt-in for the same reason; composes with ``quantize``."""
    if checkpoint_path.endswith(".npz"):
        import json, os
        tree = checkpoint.load_pytree_npz(checkpoint_path)
        cfg_path = checkpoint_path[:-4] + ".config.json"
        with open(cfg_path) as f:
            cfg_dict = json.load(f)
        tree["config"] = cfg_dict
    else:
        tree = checkpoint.convert_bundle(checkpoint_path)
    cfg = GenVCConfig.from_dict(tree["config"] or {})
    return build_pipeline(tree, cfg, compute_dtype=compute_dtype, seed=seed,
                          quantize=quantize, kv_cache_dtype=kv_cache_dtype)


def build_pipeline(tree: dict, cfg: GenVCConfig, compute_dtype=jnp.float32,
                   seed: int = 0, quantize: str | None = None,
                   kv_cache_dtype: str | None = None) -> GenVCPipeline:
    ma = cfg.model_args
    gpt_cfg = gpt_model.GPTConfig(
        layers=ma.gpt_layers, model_dim=ma.gpt_n_model_channels,
        heads=ma.gpt_n_heads, max_text_tokens=ma.gpt_max_text_tokens,
        max_mel_tokens=ma.gpt_max_audio_tokens,
        max_prompt_tokens=ma.gpt_max_prompt_tokens,
        number_text_tokens=ma.gpt_number_text_tokens or 258,
        num_audio_tokens=ma.gpt_num_audio_tokens,
        start_text_token=ma.gpt_start_text_token or 256,
        stop_text_token=ma.gpt_stop_text_token or 257,
        start_audio_token=ma.gpt_start_audio_token,
        stop_audio_token=ma.gpt_stop_audio_token,
        code_stride_len=ma.gpt_code_stride_len,
        # Pallas fused cached attention for the AR decode loop: measured
        # faster than the XLA path at every batch size for both bf16 and f8
        # caches (B=1/8/16 step: 2.50/3.55/4.87 vs 2.70/3.95/5.14 ms bf16;
        # engages on TPU only — engine falls back to XLA elsewhere).
        # GENVC_FUSED_DECODE=0 disables it (A/B and escape hatch).
        fused_decode_attention=os.environ.get(
            "GENVC_FUSED_DECODE", "1") != "0")

    def cast(x):
        x = jnp.asarray(x)
        if x.dtype == jnp.float32 and compute_dtype != jnp.float32:
            return x.astype(compute_dtype)
        return x

    gpt_params = jax.tree.map(cast, tree["gpt"])
    # keep parity-critical leaves in f32
    for key in ("final_norm",):
        gpt_params[key] = jax.tree.map(jnp.float32, jax.tree.map(jnp.asarray, tree["gpt"][key]))
    if quantize is not None:
        if quantize != "int8":
            raise ValueError(f"unsupported quantize mode {quantize!r}; "
                             "supported: 'int8'")
        from genvc_tpu.ops import quant
        # quantize from the original f32 weights (not the bf16 casts) so the
        # int8 grid is placed on the true values; LayerNorm leaves inside
        # core stay f32 (they compute in f32 regardless, ops.nn.layer_norm)
        q_src = dict(gpt_params)
        q_src["core"] = jax.tree.map(jnp.asarray, tree["gpt"]["core"])
        for head in ("mel_head", "text_head"):
            if head in tree["gpt"]:
                q_src[head] = jax.tree.map(jnp.asarray, tree["gpt"][head])
        gpt_params = quant.quantize_gpt_params(q_src)
    mel_norms = _load_mel_norms(cfg)

    cd_cfg = dvae.DVAEConfig(
        channels=cfg.content_dvae_config.num_channels,
        num_tokens=cfg.content_dvae_config.num_tokens,
        codebook_dim=cfg.content_dvae_config.codebook_dim,
        hidden_dim=cfg.content_dvae_config.hidden_dim,
        num_resnet_blocks=cfg.content_dvae_config.num_resnet_blocks,
        kernel_size=cfg.content_dvae_config.kernel_size,
        num_layers=cfg.content_dvae_config.num_layers)
    ad_cfg = dvae.DVAEConfig(
        channels=cfg.acoustic_dvae_config.num_channels,
        num_tokens=cfg.acoustic_dvae_config.num_tokens,
        codebook_dim=cfg.acoustic_dvae_config.codebook_dim,
        hidden_dim=cfg.acoustic_dvae_config.hidden_dim,
        num_resnet_blocks=cfg.acoustic_dvae_config.num_resnet_blocks,
        kernel_size=cfg.acoustic_dvae_config.kernel_size,
        num_layers=cfg.acoustic_dvae_config.num_layers)

    return GenVCPipeline(
        config=cfg,
        gpt_cfg=gpt_cfg,
        gpt_params=gpt_params,
        hifigan_params=jax.tree.map(jnp.asarray, tree["hifigan"]),
        content_dvae_params=jax.tree.map(jnp.asarray, tree["content_dvae"]),
        content_dvae_cfg=cd_cfg,
        acoustic_dvae_params=jax.tree.map(jnp.asarray, tree.get("acoustic_dvae"))
        if tree.get("acoustic_dvae") else None,
        acoustic_dvae_cfg=ad_cfg,
        contentvec_params=jax.tree.map(jnp.asarray, tree["contentvec"]),
        mel_norms=mel_norms,
        seed=seed,
        quantize=quantize,
        kv_cache_dtype=kv_cache_dtype)


def _load_mel_norms(cfg: GenVCConfig):
    import os
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = cfg.model_args.mel_norm_file
    candidates = [path, "pre_trained/mel_stats.npy",
                  os.path.join(repo_root, "pre_trained/mel_stats.npy")]
    for cand in candidates:
        if cand and os.path.exists(str(cand)):
            if str(cand).endswith(".npy"):
                return jnp.asarray(np.load(cand))
            try:
                import torch
                return jnp.asarray(torch.load(cand, map_location="cpu",
                                              weights_only=True).numpy())
            except Exception:
                continue
    return jnp.ones((80,), jnp.float32)
