"""Full-pipeline torch-replica golden (VERDICT r4 item 5).

No real GenVC checkpoint can be fetched in this environment (egress blocked,
docs/checkpoint_fetch_attempt.md), so this is the strongest offline fidelity
proxy: reference-semantics ``synthesize_utt`` (inference_utils.py:24-89,
greedy decode) re-implemented in TORCH directly on the synthetic
reference-format bundle's state dict, compared WAVEFORM-level against
``GenVCPipeline.synthesize`` end-to-end. Every cross-module seam the
per-module parity tests can't see — cond-latent chunking, content-code ->
text-format wiring, decode loop position/stopping contract, the
teacher-forced ``return_latent`` trim, vocoder interp scale — must line up
for the final audio to match.

Torch oracle stages (reference files in parens):
  1. cond latents: torchaudio MelSpectrogram (style params) / mel_norms ->
     perceiver resampler (hifigan_trainer.py:438-455, gpt.py:351-373)
  2. content codes: HF HubertModel (fairseq-contract weights) + final_proj ->
     content-dVAE nearest-codebook indices (inference_utils.py:40-49)
  3. AR greedy decode over HF GPT2 full forwards (gpt_inference.py,
     stream_generator greedy route)
  4. teacher-forced latent pass with the -5 eval trim (gpt.py:375-537,
     :491-493)
  5. HiFi-GAN vocode of x4-linear-interpolated latents (hifigan.py generator,
     inference_utils.py:76-83)
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

pytestmark = pytest.mark.slow

D = 64  # GPT_DIM of the synthetic bundle


# ---------------------------------------------------------------------------
# torch oracle stages (consume the reference-format bundle state dict)


def _mel_oracle(wav_24k: np.ndarray, mel_norms: np.ndarray) -> np.ndarray:
    """Reference conditioning mel at the style params (n_fft 2048 / win 1024 /
    hop 256 / htk-scale / slaney-norm), log-clamped, divided by mel_norms —
    torchaudio.MelSpectrogram semantics via raw ``torch.stft`` (torchaudio is
    not in this image; torch.stft is the same C++ STFT it wraps). The mel
    filterbank matrix comes from dsp.filters (validated independently in
    tests/test_dsp.py). Returns (1, 80, T')."""
    from genvc_tpu.dsp import filters

    fbank = filters.mel_filterbank(24000, 2048, 80, 0.0, 8000.0,
                                   scale="htk", norm="slaney")  # (F, 80)
    with torch.no_grad():
        z = torch.stft(torch.from_numpy(wav_24k), n_fft=2048, hop_length=256,
                       win_length=1024, window=torch.hann_window(1024),
                       center=True, pad_mode="reflect", normalized=False,
                       onesided=True, return_complex=True)
        power = z.abs() ** 2                           # (1, F, T')
        m = torch.from_numpy(fbank.astype(np.float32)).T @ power
        m = torch.log(torch.clamp(m, min=1e-5))
        m = m / torch.from_numpy(mel_norms)[None, :, None]
    return m.numpy()


def _cond_latents_oracle(sd, ref_24k: np.ndarray, mel_norms) -> torch.Tensor:
    """6 s-chunk mean speaker latent (hifigan_trainer.py:438-455). The test
    uses a < 6 s reference, so this is one chunk -> one perceiver pass."""
    from test_gpt_parity import torch_perceiver_forward

    assert ref_24k.shape[1] <= 24000 * 6
    mel = _mel_oracle(ref_24k, mel_norms)            # (1, 80, T')
    psd = {k[len("gpt."):]: v for k, v in sd.items()
           if k.startswith("gpt.conditioning_perceiver.")}
    with torch.no_grad():
        out = torch_perceiver_forward(psd, np.swapaxes(mel, 1, 2), D)
    return torch.from_numpy(out)                     # (1, 32, D)


def _fairseq_to_hf_hubert_sd(sd, prefix="content_extractor.model."):
    """Inverse of checkpoint.hf_hubert_to_fairseq_sd: fairseq HuBERT keys ->
    transformers HubertModel keys (+ the final_proj handled by the caller)."""
    out = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, sub = parts[2], parts[3]
            if sub == "0":
                out[f"feature_extractor.conv_layers.{i}.conv.weight"] = v
            elif sub == "2":
                out[f"feature_extractor.conv_layers.{i}.layer_norm."
                    f"{parts[-1]}"] = v
        elif k.startswith("layer_norm."):
            out["feature_projection.layer_norm." + k.split(".")[-1]] = v
        elif k.startswith("post_extract_proj."):
            out["feature_projection.projection." + k.split(".")[-1]] = v
        elif k.startswith("encoder.pos_conv.0."):
            tail = k.split(".")[-1]
            if tail == "bias":
                out["encoder.pos_conv_embed.conv.bias"] = v
            elif tail == "weight_g":
                out["encoder.pos_conv_embed.conv.parametrizations."
                    "weight.original0"] = v
            elif tail == "weight_v":
                out["encoder.pos_conv_embed.conv.parametrizations."
                    "weight.original1"] = v
        elif k.startswith("encoder.layer_norm."):
            out[k] = v
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            if rest.startswith("self_attn."):
                rest = rest.replace("self_attn.", "attention.", 1)
            elif rest.startswith("self_attn_layer_norm."):
                rest = rest.replace("self_attn_layer_norm.", "layer_norm.", 1)
            rest = rest.replace("fc1", "feed_forward.intermediate_dense")
            rest = rest.replace("fc2", "feed_forward.output_dense")
            out[f"encoder.layers.{i}.{rest}"] = v
    return out


def _content_codes_oracle(sd, src_16k: np.ndarray) -> list:
    """ContentVec features (HF HubertModel on the bundle weights + final_proj)
    -> content-dVAE nearest-codebook indices (inference_utils.py:40-49)."""
    from transformers import HubertConfig, HubertModel

    hf_cfg = HubertConfig(
        hidden_size=768, num_hidden_layers=2, num_attention_heads=12,
        intermediate_size=3072, conv_bias=False, feat_extract_norm="group",
        do_stable_layer_norm=False, hidden_act="gelu", hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        activation_dropout=0.0)
    hub = HubertModel(hf_cfg).eval()
    hub_sd = _fairseq_to_hf_hubert_sd(sd)
    missing, unexpected = hub.load_state_dict(hub_sd, strict=False)
    assert not unexpected, unexpected
    # only masked_spec_embed (training-only) may be missing
    assert all("masked_spec_embed" in m for m in missing), missing
    fp_w = sd["content_extractor.model.final_proj.weight"]
    fp_b = sd["content_extractor.model.final_proj.bias"]
    with torch.no_grad():
        feats = hub(torch.from_numpy(src_16k)).last_hidden_state
        feats = feats @ fp_w.T + fp_b                # (1, T', 256)

        # content dVAE encoder (2 strided stages + 3 resblocks + 1x1) on
        # (1, 256, T'), then nearest codebook (reference dvae.py)
        def conv(p, x, stride=1, pad=0):
            return F.conv1d(x, sd[p + ".weight"], sd[p + ".bias"],
                            stride=stride, padding=pad)

        h = F.relu(conv("content_dvae.encoder.0.0", feats.permute(0, 2, 1),
                        stride=2, pad=1))
        h = F.relu(conv("content_dvae.encoder.1.0", h, stride=2, pad=1))
        for j in (2, 3, 4):
            n = f"content_dvae.encoder.{j}.net"
            y = F.relu(conv(n + ".0", h, pad=1))
            y = F.relu(conv(n + ".2", y, pad=1))
            h = conv(n + ".4", y) + h
        z = conv("content_dvae.encoder.5", h)        # (1, 24, Tc)
        flat = z.permute(0, 2, 1).reshape(-1, 24)
        embed = sd["content_dvae.codebook.embed"]    # (24, 256)
        dist = (flat.pow(2).sum(1, keepdim=True) - 2 * flat @ embed
                + embed.pow(2).sum(0, keepdim=True))
        codes = (-dist).max(1)[1]
    return [int(c) for c in codes]


def _build_torch_gpt2(sd):
    from transformers import GPT2Config, GPT2Model

    m = GPT2Model(GPT2Config(
        vocab_size=8, n_positions=1024, n_embd=D, n_layer=2, n_head=4,
        use_cache=False, attn_implementation="eager"))
    core = {k[len("gpt.gpt."):]: v for k, v in sd.items()
            if k.startswith("gpt.gpt.")}
    missing, unexpected = m.load_state_dict(core, strict=False)
    assert not unexpected, unexpected
    m.wpe.weight.data.zero_()   # reference nulls wpe (gpt.py:67-69)
    m.eval()
    return m


def _final_norm(sd, h):
    return F.layer_norm(h, (D,), sd["gpt.final_norm.weight"],
                        sd["gpt.final_norm.bias"])


def _decode_greedy_oracle(sd, gpt2, cond, codes, max_new, stop=1025,
                          start_audio=1024):
    """Reference greedy AR decode via full forwards: prefix =
    [cond | start_text + codes + stop_text emb | start_audio emb], mel
    position of the t-th AR input = t (gpt_inference.py:92-96)."""
    text_in = torch.tensor([256] + codes + [257])
    text_emb = (sd["gpt.text_embedding.weight"][text_in]
                + sd["gpt.text_pos_embedding.emb.weight"][: len(text_in)])
    mel_emb_t = sd["gpt.mel_embedding.weight"]
    mel_pos = sd["gpt.mel_pos_embedding.emb.weight"]
    start_emb = mel_emb_t[start_audio] + mel_pos[0]
    seq = torch.cat([cond, text_emb[None], start_emb[None, None]], dim=1)
    gen = []
    with torch.no_grad():
        for _ in range(max_new):
            h = gpt2(inputs_embeds=seq).last_hidden_state[:, -1]
            logits = (_final_norm(sd, h) @ sd["gpt.mel_head.weight"].T
                      + sd["gpt.mel_head.bias"])
            tok = int(logits.argmax(-1))
            gen.append(tok)
            if tok == stop:
                break
            seq = torch.cat(
                [seq, (mel_emb_t[tok] + mel_pos[len(gen)])[None, None]],
                dim=1)
    return [t for t in gen if t != stop]


def _latent_pass_oracle(sd, gpt2, cond, codes, gen, stop=1025,
                        start_audio=1024, start_text=256, stop_text=257):
    """Teacher-forced return_latent pass at reference-exact widths
    (gpt.py:375-537): mel width = code_lengths = n+3 (stop-padded), io
    formatting prepends start / appends stop, latents are final_norm of the
    mel positions with the eval trim of 5 (gpt.py:491-493) -> (1, n, D)."""
    n = len(gen)
    text_in = torch.tensor([start_text] + codes + [stop_text])
    mel_codes = torch.tensor(gen + [stop] * 3)              # width n+3
    mel_in = torch.cat([torch.tensor([start_audio]), mel_codes,
                        torch.tensor([stop])])              # width n+5
    text_emb = (sd["gpt.text_embedding.weight"][text_in]
                + sd["gpt.text_pos_embedding.emb.weight"][: len(text_in)])
    mel_emb = (sd["gpt.mel_embedding.weight"][mel_in]
               + sd["gpt.mel_pos_embedding.emb.weight"][: len(mel_in)])
    seq = torch.cat([cond, text_emb[None], mel_emb[None]], dim=1)
    with torch.no_grad():
        h = gpt2(inputs_embeds=seq).last_hidden_state
        enc = _final_norm(sd, h[:, cond.shape[1]:])
        mel_latent = enc[:, -(len(mel_in)):][:, :-5]        # (1, n, D)
    assert mel_latent.shape[1] == n
    return mel_latent


def _vocode_oracle(sd, latents):
    """x4 linear interp + HiFi-GAN generator on the bundle's weight-normed
    state dict (inference_utils.py:76-83; layers/hifigan.py generator)."""
    import torch.nn as tnn
    from torch.nn.utils import weight_norm

    rates, kernels = [8, 8, 4], [16, 16, 8]
    rk = [3, 5, 7]
    rd = [[1, 2], [2, 6], [3, 12]]
    ch0 = 32
    conv_pre = weight_norm(tnn.Conv1d(D, ch0, 7, padding=3))
    ups, resblocks = [], []
    for i, (u, k) in enumerate(zip(rates, kernels)):
        ups.append(weight_norm(tnn.ConvTranspose1d(
            ch0 // (2 ** i), ch0 // (2 ** (i + 1)), k, u,
            padding=(k - u) // 2)))
        ch = ch0 // (2 ** (i + 1))
        for kr, dil in zip(rk, rd):
            resblocks.append(tnn.ModuleList(
                [weight_norm(tnn.Conv1d(ch, ch, kr, dilation=dd,
                                        padding=(kr * dd - dd) // 2))
                 for dd in dil]))
    conv_post = weight_norm(tnn.Conv1d(ch0 // 8, 1, 7, padding=3))

    def load(mod, name):
        mod.load_state_dict({k[len(f"hifigan.{name}."):]: v
                             for k, v in sd.items()
                             if k.startswith(f"hifigan.{name}.")})

    load(conv_pre, "conv_pre")
    for i, up in enumerate(ups):
        load(up, f"ups.{i}")
    for i, rb in enumerate(resblocks):
        for j, c in enumerate(rb):
            c.load_state_dict({k[len(f"hifigan.resblocks.{i}.convs.{j}."):]: v
                               for k, v in sd.items()
                               if k.startswith(
                                   f"hifigan.resblocks.{i}.convs.{j}.")})
    load(conv_post, "conv_post")

    with torch.no_grad():
        x = latents.permute(0, 2, 1)                        # (1, D, n)
        x = F.interpolate(x, scale_factor=4, mode="linear")
        x = conv_pre(x)
        nk = len(rk)
        for i, up in enumerate(ups):
            x = F.leaky_relu(x, 0.1)
            x = up(x)
            xs = None
            for j in range(nk):
                y = x
                for conv in resblocks[i * nk + j]:
                    y = conv(F.leaky_relu(y, 0.1)) + y
                xs = y if xs is None else xs + y
            x = xs / nk
        x = F.leaky_relu(x)
        wav = torch.tanh(conv_post(x))
    return wav[0, 0].numpy()


# ---------------------------------------------------------------------------
# the golden test


def test_synthesize_matches_torch_reference_pipeline(tmp_path):
    from synthetic_bundle import write_bundle
    from genvc_tpu.decode.engine import SamplerConfig
    from genvc_tpu.inference.pipeline import model_init

    path = str(tmp_path / "tiny_genvc.pth")
    write_bundle(path)
    sd = torch.load(path, map_location="cpu", weights_only=True)["model"]

    pipe = model_init(path)
    # greedy decode (reference streaming recommendation top_k=1); the
    # generation cap bounds random-weight decode on BOTH sides identically
    pipe.sampler = SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                                 repetition_penalty=1.0, do_sample=False)
    pipe.gen_cap_tokens_per_code = 1.0
    pipe._build_jits()

    rng = np.random.default_rng(42)
    src = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)  # 1 s
    ref = (rng.standard_normal((1, 36000)) * 0.1).astype(np.float32)  # 1.5 s

    got = pipe.synthesize(src, ref)

    # ---- torch oracle, stage by stage
    mel_norms = np.asarray(pipe.mel_norms, np.float32)
    cond = _cond_latents_oracle(sd, ref, mel_norms)
    np.testing.assert_allclose(
        np.asarray(pipe.get_gpt_cond_latents(ref)), cond.numpy(),
        rtol=5e-3, atol=5e-3)

    codes = _content_codes_oracle(sd, src)
    assert len(codes) == pipe._host_n_codes(src.shape[1])

    gpt2 = _build_torch_gpt2(sd)
    max_new = pipe._max_new(len(codes))
    gen = _decode_greedy_oracle(sd, gpt2, cond, codes, max_new)
    assert gen, "oracle decoded zero tokens; pick a different seed"

    latents = _latent_pass_oracle(sd, gpt2, cond, codes, gen)
    want = _vocode_oracle(sd, latents)

    assert got.shape == want.shape, (got.shape, want.shape)
    # waveform closeness: every module seam must line up; tolerance covers
    # f32 accumulation differences across two independent implementations
    np.testing.assert_allclose(got, want, atol=2e-3)
    # and the audio is not trivially silent (a real signal comparison)
    assert float(np.abs(want).max()) > 1e-3
