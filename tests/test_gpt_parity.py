"""GPT core / perceiver / decode-engine parity vs torch references.

The HF ``GPT2Model`` (CPU torch) is the exact backbone the reference uses
(layers/gpt.py:42-84), so matching it end-to-end with converted random weights
validates both the JAX transformer and the checkpoint conversion mapping.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from genvc_tpu import checkpoint
from genvc_tpu.models import gpt as gpt_model
from genvc_tpu.models import perceiver as perceiver_model
from genvc_tpu.decode import engine
from genvc_tpu.ops import nn

SMALL = gpt_model.GPTConfig(layers=3, model_dim=64, heads=4,
                            max_text_tokens=30, max_mel_tokens=40,
                            number_text_tokens=258, num_audio_tokens=1026)


def make_hf_gpt2(cfg):
    from transformers import GPT2Config, GPT2Model

    torch.manual_seed(0)
    hf = GPT2Model(GPT2Config(
        vocab_size=256, n_positions=512, n_ctx=512, n_embd=cfg.model_dim,
        n_layer=cfg.layers, n_head=cfg.heads, use_cache=True,
        attn_implementation="eager",
    ))
    hf.eval()
    return hf


def hf_to_core(hf, cfg):
    sd = {f"gpt.{k}": v for k, v in hf.state_dict().items()}
    # add dummy non-core keys so convert_gpt works end-to-end
    d = cfg.model_dim
    sd.update({
        "text_embedding.weight": torch.randn(cfg.number_text_tokens, d),
        "mel_embedding.weight": torch.randn(cfg.num_audio_tokens, d),
        "text_pos_embedding.emb.weight": torch.randn(cfg.text_positions, d) * 0.02,
        "mel_pos_embedding.emb.weight": torch.randn(cfg.mel_positions, d) * 0.02,
        "final_norm.weight": torch.randn(d).abs() + 0.5,
        "final_norm.bias": torch.randn(d) * 0.1,
        "text_head.weight": torch.randn(cfg.number_text_tokens, d) * 0.02,
        "text_head.bias": torch.zeros(cfg.number_text_tokens),
        "mel_head.weight": torch.randn(cfg.num_audio_tokens, d) * 0.02,
        "mel_head.bias": torch.zeros(cfg.num_audio_tokens),
    })
    # perceiver keys
    torch.manual_seed(1)
    dim_inner = 64 * 8
    ff_inner = int(d * 4 * 2 / 3)
    sd["conditioning_perceiver.latents"] = torch.randn(32, d) * 0.02
    sd["conditioning_perceiver.proj_context.weight"] = torch.randn(d, 80) * 0.05
    sd["conditioning_perceiver.proj_context.bias"] = torch.zeros(d)
    for i in range(4):
        sd[f"conditioning_perceiver.layers.{i}.0.to_q.weight"] = torch.randn(dim_inner, d) * 0.05
        sd[f"conditioning_perceiver.layers.{i}.0.to_kv.weight"] = torch.randn(dim_inner * 2, d) * 0.05
        sd[f"conditioning_perceiver.layers.{i}.0.to_out.weight"] = torch.randn(d, dim_inner) * 0.05
        sd[f"conditioning_perceiver.layers.{i}.1.0.weight"] = torch.randn(ff_inner * 2, d) * 0.05
        sd[f"conditioning_perceiver.layers.{i}.1.0.bias"] = torch.zeros(ff_inner * 2)
        sd[f"conditioning_perceiver.layers.{i}.1.2.weight"] = torch.randn(d, ff_inner) * 0.05
        sd[f"conditioning_perceiver.layers.{i}.1.2.bias"] = torch.zeros(d)
    sd["conditioning_perceiver.norm.gamma"] = torch.ones(d)
    params = checkpoint.convert_gpt({k: v for k, v in sd.items()}, cfg.layers)
    return jax.tree.map(jnp.asarray, params), sd


def test_core_matches_hf_gpt2():
    cfg = SMALL
    hf = make_hf_gpt2(cfg)
    params, _ = hf_to_core(hf, cfg)

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((2, 17, cfg.model_dim)).astype(np.float32) * 0.3
    with torch.no_grad():
        # null wpe like the reference (gpt.py:67-69)
        hf.wpe.weight.zero_()
        ref = hf(inputs_embeds=torch.from_numpy(emb)).last_hidden_state.numpy()
    got = np.asarray(gpt_model.core_forward(params["core"], jnp.asarray(emb), cfg))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_core_key_padding_matches_hf_attention_mask():
    cfg = SMALL
    hf = make_hf_gpt2(cfg)
    params, _ = hf_to_core(hf, cfg)
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((2, 12, cfg.model_dim)).astype(np.float32) * 0.3
    mask = np.ones((2, 12), dtype=bool)
    mask[0, 9:] = False
    mask[1, 5:] = False
    with torch.no_grad():
        hf.wpe.weight.zero_()
        ref = hf(inputs_embeds=torch.from_numpy(emb),
                 attention_mask=torch.from_numpy(mask.astype(np.int64))
                 ).last_hidden_state.numpy()
    got = np.asarray(gpt_model.core_forward(
        params["core"], jnp.asarray(emb), cfg, key_valid=jnp.asarray(mask)))
    # compare only valid positions (HF computes garbage at masked positions too)
    np.testing.assert_allclose(got[0, :9], ref[0, :9], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, :5], ref[1, :5], rtol=2e-4, atol=2e-4)


def torch_perceiver_forward(sd, x, d):
    """Reference perceiver math re-expressed in torch for the parity check."""
    import torch.nn.functional as F

    x = torch.from_numpy(x)
    px = x @ sd["conditioning_perceiver.proj_context.weight"].T + sd[
        "conditioning_perceiver.proj_context.bias"]
    lat = sd["conditioning_perceiver.latents"][None].expand(x.shape[0], -1, -1).clone()
    heads = 8
    for i in range(4):
        ctx = torch.cat([lat, px], dim=1)
        q = lat @ sd[f"conditioning_perceiver.layers.{i}.0.to_q.weight"].T
        kv = ctx @ sd[f"conditioning_perceiver.layers.{i}.0.to_kv.weight"].T
        k, v = kv.chunk(2, dim=-1)

        def sh(t):
            b, n, dd = t.shape
            return t.view(b, n, heads, dd // heads).transpose(1, 2)

        qh, kh, vh = sh(q), sh(k), sh(v)
        sim = qh @ kh.transpose(-1, -2) * (qh.shape[-1] ** -0.5)
        attn = sim.softmax(dim=-1)
        out = (attn @ vh).transpose(1, 2).reshape(lat.shape[0], lat.shape[1], -1)
        lat = out @ sd[f"conditioning_perceiver.layers.{i}.0.to_out.weight"].T + lat
        h = lat @ sd[f"conditioning_perceiver.layers.{i}.1.0.weight"].T + sd[
            f"conditioning_perceiver.layers.{i}.1.0.bias"]
        val, gate = h.chunk(2, dim=-1)
        h = F.gelu(gate) * val
        lat = h @ sd[f"conditioning_perceiver.layers.{i}.1.2.weight"].T + sd[
            f"conditioning_perceiver.layers.{i}.1.2.bias"] + lat
    out = F.normalize(lat, dim=-1) * (d ** 0.5) * sd["conditioning_perceiver.norm.gamma"]
    return out.numpy()


def test_perceiver_matches_torch_reference():
    cfg = SMALL
    hf = make_hf_gpt2(cfg)
    params, sd = hf_to_core(hf, cfg)
    rng = np.random.default_rng(2)
    mel_frames = rng.standard_normal((2, 23, 80)).astype(np.float32)
    with torch.no_grad():
        ref = torch_perceiver_forward(sd, mel_frames, cfg.model_dim)
    got = np.asarray(perceiver_model.forward(params["perceiver"],
                                             jnp.asarray(mel_frames)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_decode_matches_full_forward():
    """KV-cache incremental decode must equal a full-sequence forward."""
    cfg = SMALL
    hf = make_hf_gpt2(cfg)
    params, _ = hf_to_core(hf, cfg)

    rng = np.random.default_rng(3)
    b = 1
    text = jnp.asarray(rng.integers(0, 256, (b, 10)), jnp.int32)
    text_len = jnp.asarray([10], jnp.int32)
    cond = jnp.asarray(rng.standard_normal((b, 32, cfg.model_dim)) * 0.1, jnp.float32)

    prefix, valid = gpt_model.build_prefix_emb(params, cfg, cond, text, text_len)
    sampler = engine.SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                                   repetition_penalty=1.0, do_sample=False)
    state = engine.init_state(cfg, prefix.shape[1], b, cfg.heads,
                              cfg.model_dim // cfg.heads, jax.random.key(0),
                              cache_dtype=jnp.float32)
    state, tok0, lat0 = engine.prefill(params, cfg, state, prefix, valid, sampler)
    state, toks, lats, _ = engine.decode_chunk(params, cfg, state, sampler, chunk=4)
    gen = np.concatenate([np.asarray(tok0)[:, None], np.asarray(toks)], axis=1)[0]

    # full forward over [prefix | start | gen[:-1]] must predict the same tokens
    start = cfg.start_audio_token
    seq_tokens = np.concatenate([[start], gen[:-1]])
    mel_emb = params["mel_embedding"][jnp.asarray(seq_tokens)][None]
    mel_emb = mel_emb + params["mel_pos"][None, : len(seq_tokens)]
    emb = jnp.concatenate([prefix, mel_emb], axis=1)
    h = gpt_model.core_forward(params["core"], emb,
                               cfg, key_valid=jnp.concatenate(
                                   [valid, jnp.ones((1, len(seq_tokens)), bool)], axis=1))
    enc = nn.layer_norm(params["final_norm"], h[:, prefix.shape[1]:])
    logits = nn.linear(params["mel_head"], enc)
    full_argmax = np.asarray(jnp.argmax(logits, axis=-1))[0]
    np.testing.assert_array_equal(gen, full_argmax)
    # latents from decode must match final_norm of full-forward hiddens
    full_latents = np.asarray(enc)[0]
    got_lats = np.concatenate([np.asarray(lat0), np.asarray(lats)[0]], axis=0)
    np.testing.assert_allclose(got_lats, full_latents, rtol=2e-3, atol=2e-3)


def test_forward_train_formatting_and_loss():
    """Training forward runs, losses are finite, formatting rules hold."""
    cfg = SMALL
    params = gpt_model.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(4)
    b, wt, wm = 2, 12, 20
    text = jnp.asarray(rng.integers(0, 256, (b, wt)), jnp.int32)
    text_len = jnp.asarray([12, 7], jnp.int32)
    codes = jnp.asarray(rng.integers(0, 1024, (b, wm)), jnp.int32)
    wav_len = jnp.asarray([15 * 1024, 9 * 1024], jnp.int32)  # code len 15, 9
    cond_mels = jnp.asarray(rng.standard_normal((b, 80, 25)), jnp.float32)
    cond_lens = jnp.asarray([25 * 256, 20 * 256], jnp.int32)

    lt, lm, acc, logits = gpt_model.forward_train(
        params, cfg, text, text_len, codes, wav_len,
        cond_mels=cond_mels, cond_lens=cond_lens)
    assert np.isfinite(float(lt)) and np.isfinite(float(lm))
    assert 0.0 <= float(acc) <= 1.0
    assert logits.shape == (b, wm + 2, cfg.num_audio_tokens)

    latents = gpt_model.forward_train(
        params, cfg, text, text_len, codes, wav_len,
        cond_mels=cond_mels, cond_lens=cond_lens, return_latent=True,
        train=False)
    assert latents.shape == (b, wm + 2 - 5, cfg.model_dim)


def test_decode_all_matches_chunked():
    """Single-dispatch while_loop generation == chunked scan generation."""
    cfg = SMALL
    hf = make_hf_gpt2(cfg)
    params, _ = hf_to_core(hf, cfg)
    rng = np.random.default_rng(5)
    text = jnp.asarray(rng.integers(0, 256, (1, 10)), jnp.int32)
    cond = jnp.asarray(rng.standard_normal((1, 32, cfg.model_dim)) * 0.1,
                       jnp.float32)
    prefix, valid = gpt_model.build_prefix_emb(params, cfg, cond, text,
                                               jnp.asarray([10], jnp.int32))
    sampler = engine.SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                                   repetition_penalty=1.0, do_sample=False)

    def fresh_state(key):
        return engine.init_state(cfg, prefix.shape[1], 1, cfg.heads,
                                 cfg.model_dim // cfg.heads, key,
                                 cache_dtype=jnp.float32)

    st, tok0, _ = engine.prefill(params, cfg, fresh_state(jax.random.key(0)),
                                 prefix, valid, sampler)
    st_all, buf, n_gen = engine.decode_all(params, cfg, st, sampler, 12)
    all_toks = [int(t) for t in np.asarray(buf)[0, : int(n_gen[0])]]

    st2, tok0b, _ = engine.prefill(params, cfg, fresh_state(jax.random.key(0)),
                                   prefix, valid, sampler)
    chunk_toks = [int(tok0b[0])]
    while len(chunk_toks) < 12:
        st2, toks, _, _ = engine.decode_chunk(params, cfg, st2, sampler,
                                              chunk=4)
        chunk_toks += [int(t) for t in np.asarray(toks)[0]]
    assert all_toks == chunk_toks[: len(all_toks)]
