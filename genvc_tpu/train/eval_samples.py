"""Eval listening-sample generation for the GPT stage.

Reference: ``GPTTrainer.generate_eval_sample`` + ``GPT.eval_sample``
(trainers/gpt_trainer.py:146-170, layers/gpt.py:539-566): once per eval epoch
generate self-reconstruction and cross-speaker codes for sample 0, decode them
through the frozen acoustic dVAE, invert the mel with Griffin-Lim, and hand
the audio to the logger (wandb when enabled).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from genvc_tpu.decode import engine
from genvc_tpu.dsp.griffinlim import invert_mel
from genvc_tpu.models import dvae, gpt as gpt_model


def generate_eval_samples(gpt_params, gcfg: gpt_model.GPTConfig,
                          acoustic_dvae_params, acoustic_cfg: dvae.DVAEConfig,
                          feats: dict, mel_norms, rng,
                          sampler: engine.SamplerConfig | None = None,
                          tgt_idx: int | None = None):
    """Returns (self_wav, cross_wav, tgt_idx) as numpy float32 @24 kHz."""
    sampler = sampler or engine.SamplerConfig()
    cond_latents = gpt_model.get_style_emb(gpt_params, feats["cond_mels"])
    text = feats["text_inputs"][0:1]
    text_len = feats["text_lengths"][0:1].astype(jnp.int32)

    b = cond_latents.shape[0]
    if tgt_idx is None:
        tgt_idx = int(np.random.default_rng(0).integers(0, b))

    def gen(cond):
        prefix, valid = gpt_model.build_prefix_emb(gpt_params, gcfg, cond,
                                                   text, text_len)
        state = engine.init_state(gcfg, prefix.shape[1], 1, gcfg.heads,
                                  gcfg.model_dim // gcfg.heads, rng,
                                  cache_dtype=jnp.float32)
        state, tok0, _ = engine.prefill(gpt_params, gcfg, state, prefix,
                                        valid, sampler)
        state, toks, n_gen = engine.decode_all(gpt_params, gcfg, state,
                                               sampler, gcfg.max_gen_mel_tokens)
        toks = np.asarray(toks)[0, : int(n_gen[0])]
        return [int(t) for t in toks if t != gcfg.stop_audio_token]

    def vocode_codes(codes):
        if not codes:
            return np.zeros(1024, np.float32)
        mel = dvae.decode(acoustic_dvae_params,
                          jnp.asarray([codes], jnp.int32), acoustic_cfg)
        return invert_mel(np.asarray(mel)[0], np.asarray(mel_norms))

    self_codes = gen(cond_latents[0:1])
    cross_codes = gen(cond_latents[tgt_idx : tgt_idx + 1])
    return vocode_codes(self_codes), vocode_codes(cross_codes), tgt_idx
