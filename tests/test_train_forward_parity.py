"""Teacher-forced training forward: loss parity vs a torch replica of the
reference semantics.

The torch side re-implements the reference GPT.forward formatting contract
from its spec (gpt.py:375-537): dynamic-width truncation to batch max, stop
padding, start/stop insertion, attention masks with [l+1:]=0, loss targets -1
beyond l, dual CE. Matching it with our static-width masked implementation is
the strongest checkpoint-compat check available without real weights.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from genvc_tpu.models import gpt as gpt_model

from test_gpt_parity import SMALL, make_hf_gpt2, hf_to_core


def torch_reference_forward(hf, sd, cfg, text, text_lens, codes, wav_lens,
                            cond_latents):
    """Reference-semantics teacher-forced loss in torch (dynamic widths)."""
    text = torch.from_numpy(text)
    codes = torch.from_numpy(codes)
    text_lens = torch.from_numpy(text_lens)
    wav_lens = torch.from_numpy(wav_lens)
    cond = torch.from_numpy(cond_latents)

    max_text_len = int(text_lens.max())
    code_lengths = torch.ceil(wav_lens / cfg.code_stride_len).long() + 3
    max_mel_len = int(code_lengths.max())
    if max_mel_len > codes.shape[-1]:
        codes = F.pad(codes, (0, max_mel_len - codes.shape[-1]))

    text = F.pad(text[:, :max_text_len], (0, 1), value=cfg.stop_text_token)
    for b in range(text.shape[0]):
        if text_lens[b] < text.shape[-1]:
            text[b, text_lens[b]:] = cfg.stop_text_token
    codes = F.pad(codes[:, :max_mel_len], (0, 1), value=cfg.stop_audio_token)
    for b in range(codes.shape[0]):
        real = code_lengths[b] - 3
        if real < codes.shape[-1]:
            codes[b, real:] = cfg.stop_audio_token

    def io(x, start, stop_tok):
        inp = F.pad(x, (1, 0), value=start)
        tar = F.pad(x, (0, 1), value=stop_tok)
        return inp, tar

    text_in, text_tar = io(text, cfg.start_text_token, cfg.stop_text_token)
    mel_in, mel_tar = io(codes, cfg.start_audio_token, cfg.stop_audio_token)

    b = text_in.shape[0]
    att_text = torch.ones(b, text_in.shape[1], dtype=torch.bool)
    att_mel = torch.ones(b, mel_in.shape[1], dtype=torch.bool)
    for i, l in enumerate(text_lens):
        att_text[i, l + 1:] = 0
    for i, l in enumerate(code_lengths):
        att_mel[i, l + 1:] = 0
    att = torch.cat([torch.ones(b, cond.shape[1], dtype=torch.bool),
                     att_text, att_mel], dim=1)

    text_emb = (torch.from_numpy(np.asarray(sd["text_embedding.weight"]))[text_in]
                + torch.from_numpy(np.asarray(
                    sd["text_pos_embedding.emb.weight"]))[: text_in.shape[1]][None])
    mel_emb = (torch.from_numpy(np.asarray(sd["mel_embedding.weight"]))[mel_in]
               + torch.from_numpy(np.asarray(
                   sd["mel_pos_embedding.emb.weight"]))[: mel_in.shape[1]][None])
    emb = torch.cat([cond, text_emb, mel_emb], dim=1)

    with torch.no_grad():
        hf.wpe.weight.zero_()
        out = hf(inputs_embeds=emb, attention_mask=att.long()).last_hidden_state
    enc = out[:, cond.shape[1]:]
    fn_w = torch.from_numpy(np.asarray(sd["final_norm.weight"]))
    fn_b = torch.from_numpy(np.asarray(sd["final_norm.bias"]))
    enc = F.layer_norm(enc, (enc.shape[-1],), fn_w, fn_b)
    th_w = torch.from_numpy(np.asarray(sd["text_head.weight"]))
    th_b = torch.from_numpy(np.asarray(sd["text_head.bias"]))
    mh_w = torch.from_numpy(np.asarray(sd["mel_head.weight"]))
    mh_b = torch.from_numpy(np.asarray(sd["mel_head.bias"]))
    text_logits = (enc[:, : text_in.shape[1]] @ th_w.T + th_b).permute(0, 2, 1)
    mel_logits = (enc[:, -mel_in.shape[1]:] @ mh_w.T + mh_b).permute(0, 2, 1)

    for i, l in enumerate(text_lens):
        text_tar[i, l + 1:] = -1
    for i, l in enumerate(code_lengths):
        mel_tar[i, l + 1:] = -1
    loss_text = F.cross_entropy(text_logits, text_tar.long(), ignore_index=-1)
    loss_mel = F.cross_entropy(mel_logits, mel_tar.long(), ignore_index=-1)
    return float(loss_text), float(loss_mel)


def test_training_forward_loss_parity():
    cfg = SMALL
    hf = make_hf_gpt2(cfg)
    params, sd = hf_to_core(hf, cfg)
    sd = {k: np.asarray(v) for k, v in sd.items()}

    rng = np.random.default_rng(0)
    b = 3
    # our static widths are wider than the batch max (exercises the masking)
    wt_static, wm_static = 14, 22
    text = rng.integers(0, 256, (b, wt_static)).astype(np.int64)
    text_lens = np.array([10, 7, 9], np.int64)
    wav_lens = np.array([14 * 1024, 9 * 1024 - 100, 12 * 1024], np.int64)
    codes = rng.integers(0, 1024, (b, wm_static)).astype(np.int64)
    cond = (rng.standard_normal((b, 32, cfg.model_dim)) * 0.1).astype(np.float32)

    ref_lt, ref_lm = torch_reference_forward(
        hf, sd, cfg, text, text_lens, codes, wav_lens, cond)

    lt, lm, acc, _ = gpt_model.forward_train(
        params, cfg,
        jnp.asarray(text, jnp.int32), jnp.asarray(text_lens, jnp.int32),
        jnp.asarray(codes, jnp.int32), jnp.asarray(wav_lens, jnp.int32),
        cond_latents=jnp.asarray(cond))

    assert float(lt) == pytest.approx(ref_lt, rel=2e-4)
    assert float(lm) == pytest.approx(ref_lm, rel=2e-4)
