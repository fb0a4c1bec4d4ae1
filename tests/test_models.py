"""dVAE / HiFi-GAN / ContentVec parity vs torch references.

Torch reference modules are built in-test with the reference's architecture
(state-dict key names included) so the checkpoint converters are exercised on
realistic key layouts.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from genvc_tpu import checkpoint
from genvc_tpu.config import VocoderConfig
from genvc_tpu.models import contentvec, dvae, hifigan


# ---------------------------------------------------------------------------
# dVAE


class TorchResBlock(tnn.Module):
    def __init__(self, chan):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Conv1d(chan, chan, 3, padding=1), tnn.ReLU(),
            tnn.Conv1d(chan, chan, 3, padding=1), tnn.ReLU(),
            tnn.Conv1d(chan, chan, 1))

    def forward(self, x):
        return self.net(x) + x


class TorchUpsampledConv(tnn.Module):
    def __init__(self, i, o, k, pad):
        super().__init__()
        self.conv = tnn.Conv1d(i, o, k, padding=pad)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


def build_torch_dvae(channels=13, hidden=32, codebook_dim=24, num_tokens=50):
    torch.manual_seed(0)
    enc_chans = [hidden, hidden * 2]
    encoder = tnn.Sequential(
        tnn.Sequential(tnn.Conv1d(channels, enc_chans[0], 3, stride=2, padding=1), tnn.ReLU()),
        tnn.Sequential(tnn.Conv1d(enc_chans[0], enc_chans[1], 3, stride=2, padding=1), tnn.ReLU()),
        TorchResBlock(enc_chans[1]), TorchResBlock(enc_chans[1]), TorchResBlock(enc_chans[1]),
        tnn.Conv1d(enc_chans[1], codebook_dim, 1))
    decoder = tnn.Sequential(
        tnn.Conv1d(codebook_dim, enc_chans[1], 1),
        TorchResBlock(enc_chans[1]), TorchResBlock(enc_chans[1]), TorchResBlock(enc_chans[1]),
        tnn.Sequential(TorchUpsampledConv(enc_chans[1], enc_chans[1], 3, 1), tnn.ReLU()),
        tnn.Sequential(TorchUpsampledConv(enc_chans[1], enc_chans[0], 3, 1), tnn.ReLU()),
        tnn.Conv1d(enc_chans[0], channels, 1))
    embed = torch.randn(codebook_dim, num_tokens)
    sd = {}
    for k, v in encoder.state_dict().items():
        sd["encoder." + k] = v
    for k, v in decoder.state_dict().items():
        sd["decoder." + k] = v
    sd["codebook.embed"] = embed
    sd["codebook.cluster_size"] = torch.zeros(num_tokens)
    sd["codebook.embed_avg"] = embed.clone()
    return encoder, decoder, embed, sd


def test_dvae_encoder_decoder_parity():
    cfgj = dvae.DVAEConfig(channels=13, num_tokens=50, codebook_dim=24,
                           hidden_dim=32, num_resnet_blocks=3, num_layers=2)
    encoder, decoder, embed, sd = build_torch_dvae()
    params = jax.tree.map(jnp.asarray, checkpoint.convert_dvae(sd))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 13, 48)).astype(np.float32)
    with torch.no_grad():
        enc_ref = encoder(torch.from_numpy(x)).numpy()
    enc_got = np.asarray(dvae.encode(params, jnp.asarray(x), cfgj))
    np.testing.assert_allclose(enc_got, enc_ref, rtol=1e-4, atol=1e-5)

    # codes
    logits = torch.from_numpy(enc_ref).permute(0, 2, 1)
    flat = logits.reshape(-1, 24)
    dist = flat.pow(2).sum(1, keepdim=True) - 2 * flat @ embed + embed.pow(2).sum(0, keepdim=True)
    codes_ref = (-dist).max(1)[1].view(2, -1).numpy()
    codes_got = np.asarray(dvae.get_codebook_indices(params, jnp.asarray(x), cfgj))
    np.testing.assert_array_equal(codes_got, codes_ref)

    # decode
    with torch.no_grad():
        emb = F.embedding(torch.from_numpy(codes_ref), embed.T).permute(0, 2, 1)
        dec_ref = decoder(emb).numpy()
    dec_got = np.asarray(dvae.decode(params, jnp.asarray(codes_ref), cfgj))
    np.testing.assert_allclose(dec_got, dec_ref, rtol=1e-4, atol=1e-5)


def test_dvae_masked_encode_matches_exact_length():
    cfgj = dvae.DVAEConfig(channels=13, num_tokens=50, codebook_dim=24,
                           hidden_dim=32, num_resnet_blocks=3, num_layers=2)
    _, _, _, sd = build_torch_dvae()
    params = jax.tree.map(jnp.asarray, checkpoint.convert_dvae(sd))
    rng = np.random.default_rng(1)
    x_full = rng.standard_normal((1, 13, 64)).astype(np.float32)
    true_len = 36
    exact = np.asarray(dvae.get_codebook_indices(
        params, jnp.asarray(x_full[:, :, :true_len]), cfgj))
    x_pad = x_full.copy()
    x_pad[:, :, true_len:] = 0.0
    padded = np.asarray(dvae.get_codebook_indices(
        params, jnp.asarray(x_pad), cfgj, valid_len=jnp.asarray([true_len])))
    n_codes = exact.shape[1]
    np.testing.assert_array_equal(padded[:, :n_codes], exact)


def test_dvae_train_step_ema():
    cfgj = dvae.DVAEConfig(channels=13, num_tokens=50, codebook_dim=24,
                           hidden_dim=32, num_resnet_blocks=3, num_layers=2)
    params = dvae.init_params(jax.random.key(0), cfgj)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 13, 32)), jnp.float32)
    recon, commit, out, new_cb, codes = dvae.forward_train(params, x, cfgj)
    assert np.isfinite(float(recon)) and np.isfinite(float(commit))
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(new_cb["cluster_size"]),
                           np.asarray(params["codebook"]["cluster_size"]))
    # gradients flow through the straight-through estimator
    def loss_fn(p):
        r, c, *_ = dvae.forward_train(p, x, cfgj)
        return r + c
    grads = jax.grad(loss_fn)(params)
    gnorm = jax.tree.reduce(lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0)
    assert gnorm > 0


# ---------------------------------------------------------------------------
# HiFi-GAN generator


def build_torch_hifigan(cfg: VocoderConfig):
    torch.manual_seed(0)
    from torch.nn.utils import weight_norm

    mods = {}
    mods["conv_pre"] = weight_norm(tnn.Conv1d(cfg.input_feat_dim,
                                              cfg.upsample_initial_channel, 7, 1, padding=3))
    ups, resblocks = [], []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernal_sizes)):
        ups.append(weight_norm(tnn.ConvTranspose1d(
            cfg.upsample_initial_channel // (2 ** i),
            cfg.upsample_initial_channel // (2 ** (i + 1)), k, u,
            padding=(k - u) // 2)))
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        for kr, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            convs = [weight_norm(tnn.Conv1d(ch, ch, kr, 1, dilation=d,
                                            padding=hifigan.get_padding(kr, d)))
                     for d in dil]
            resblocks.append(tnn.ModuleList(convs))
    ch = cfg.upsample_initial_channel // (2 ** len(cfg.upsample_rates))
    mods["conv_post"] = weight_norm(tnn.Conv1d(ch, 1, 7, 1, padding=3))

    sd = {}
    for k, v in mods["conv_pre"].state_dict().items():
        sd[f"conv_pre.{k}"] = v
    for i, up in enumerate(ups):
        for k, v in up.state_dict().items():
            sd[f"ups.{i}.{k}"] = v
    for i, rb in enumerate(resblocks):
        for j, conv in enumerate(rb):
            for k, v in conv.state_dict().items():
                sd[f"resblocks.{i}.convs.{j}.{k}"] = v
    for k, v in mods["conv_post"].state_dict().items():
        sd[f"conv_post.{k}"] = v

    def forward(x):
        x = mods["conv_pre"](x)
        nk = len(cfg.resblock_kernel_sizes)
        for i, u in enumerate(ups):
            x = F.leaky_relu(x, 0.1)
            x = u(x)
            xs = None
            for j in range(nk):
                y = x
                kr = cfg.resblock_kernel_sizes[j]
                for conv, d in zip(resblocks[i * nk + j], cfg.resblock_dilation_sizes[j]):
                    yt = F.leaky_relu(y, 0.1)
                    yt = conv(yt)
                    y = yt + y
                xs = y if xs is None else xs + y
            x = xs / nk
        x = F.leaky_relu(x)
        x = mods["conv_post"](x)
        return torch.tanh(x)

    return forward, sd


def test_hifigan_generator_parity():
    cfg = VocoderConfig(input_feat_dim=24, upsample_initial_channel=32)
    fwd, sd = build_torch_hifigan(cfg)
    params = jax.tree.map(jnp.asarray, checkpoint.convert_hifigan(sd))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 24, 12)).astype(np.float32)
    with torch.no_grad():
        ref = fwd(torch.from_numpy(x)).numpy()
    got = np.asarray(hifigan.generator_forward(params, jnp.asarray(x), cfg))
    assert got.shape == ref.shape == (2, 1, 12 * 256)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # weight-normed training parametrization gives the same forward
    params_wn = jax.tree.map(jnp.asarray, checkpoint.convert_hifigan(sd, fold=False))
    got_wn = np.asarray(hifigan.generator_forward(params_wn, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got_wn, ref, rtol=1e-4, atol=1e-5)


def test_linear_interp_x4_matches_torch():
    from genvc_tpu.ops.conv import linear_interp_x4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 10)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=4, mode="linear").numpy()
    got = np.asarray(linear_interp_x4(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# ContentVec (vs transformers HubertModel)


from genvc_tpu.checkpoint import hf_hubert_to_fairseq_sd


def test_contentvec_matches_hf_hubert():
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(0)
    hf_cfg = HubertConfig(
        hidden_size=768, num_hidden_layers=2, num_attention_heads=12,
        intermediate_size=3072, conv_bias=False, feat_extract_norm="group",
        do_stable_layer_norm=False, hidden_act="gelu",
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, activation_dropout=0.0,
    )
    hf = HubertModel(hf_cfg).eval()
    sd = hf_hubert_to_fairseq_sd(hf.state_dict())
    # add a final_proj (not present in HF HubertModel)
    torch.manual_seed(1)
    fp_w = torch.randn(256, 768) * 0.02
    fp_b = torch.zeros(256)
    sd["final_proj.weight"] = fp_w
    sd["final_proj.bias"] = fp_b
    params = jax.tree.map(jnp.asarray, checkpoint.convert_contentvec(sd, n_layers=2))

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).last_hidden_state
        ref = (ref @ fp_w.T + fp_b).numpy()
    got = np.asarray(contentvec.extract_content_features(params, jnp.asarray(wav)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_contentvec_padded_matches_exact():
    params = contentvec.init_params(jax.random.key(0), n_layers=2)
    params["layers"] = jax.tree.map(lambda x: x[:2], params["layers"])
    rng = np.random.default_rng(1)
    wav_full = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    true_len = 9600
    exact = np.asarray(contentvec.extract_content_features(
        params, jnp.asarray(wav_full[:, :true_len])))
    wav_pad = wav_full.copy()
    wav_pad[:, true_len:] = 0.0
    padded = np.asarray(contentvec.extract_content_features(
        params, jnp.asarray(wav_pad), sample_valid=jnp.asarray([true_len])))
    n = exact.shape[1]
    np.testing.assert_allclose(padded[:, :n], exact[:, :n], rtol=2e-3, atol=2e-3)
