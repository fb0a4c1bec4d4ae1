"""Build a synthetic reference-format GenVC bundle (small dims) for e2e tests.

Key names follow the reference ``HiFiGANTrainer`` state dict exactly
(gpt.* / hifigan.* / acoustic_dvae.* / content_dvae.* /
content_extractor.model.*) so the conversion path is exercised end-to-end.
"""

import numpy as np
import torch

GPT_LAYERS = 2
GPT_DIM = 64
GPT_HEADS = 4
CV_LAYERS = 2
DVAE_HIDDEN = 16


def _r(*shape, std=0.05):
    return torch.randn(*shape) * std


def gpt_sd(prefix="gpt."):
    d = GPT_DIM
    sd = {}
    for i in range(GPT_LAYERS):
        p = f"{prefix}gpt.h.{i}."
        sd[p + "ln_1.weight"] = torch.ones(d)
        sd[p + "ln_1.bias"] = torch.zeros(d)
        sd[p + "attn.c_attn.weight"] = _r(d, 3 * d)
        sd[p + "attn.c_attn.bias"] = torch.zeros(3 * d)
        sd[p + "attn.c_proj.weight"] = _r(d, d)
        sd[p + "attn.c_proj.bias"] = torch.zeros(d)
        sd[p + "ln_2.weight"] = torch.ones(d)
        sd[p + "ln_2.bias"] = torch.zeros(d)
        sd[p + "mlp.c_fc.weight"] = _r(d, 4 * d)
        sd[p + "mlp.c_fc.bias"] = torch.zeros(4 * d)
        sd[p + "mlp.c_proj.weight"] = _r(4 * d, d)
        sd[p + "mlp.c_proj.bias"] = torch.zeros(d)
    sd[prefix + "gpt.ln_f.weight"] = torch.ones(d)
    sd[prefix + "gpt.ln_f.bias"] = torch.zeros(d)
    sd[prefix + "text_embedding.weight"] = _r(258, d)
    sd[prefix + "mel_embedding.weight"] = _r(1026, d)
    sd[prefix + "text_pos_embedding.emb.weight"] = _r(404, d, std=0.02)
    sd[prefix + "mel_pos_embedding.emb.weight"] = _r(608, d, std=0.02)
    sd[prefix + "final_norm.weight"] = torch.ones(d)
    sd[prefix + "final_norm.bias"] = torch.zeros(d)
    sd[prefix + "text_head.weight"] = _r(258, d)
    sd[prefix + "text_head.bias"] = torch.zeros(258)
    sd[prefix + "mel_head.weight"] = _r(1026, d)
    sd[prefix + "mel_head.bias"] = torch.zeros(1026)
    # perceiver
    pp = prefix + "conditioning_perceiver."
    dim_inner = 64 * 8
    ff_inner = int(d * 4 * 2 / 3)
    sd[pp + "proj_context.weight"] = _r(d, 80)
    sd[pp + "proj_context.bias"] = torch.zeros(d)
    sd[pp + "latents"] = _r(32, d, std=0.02)
    for i in range(4):
        sd[pp + f"layers.{i}.0.to_q.weight"] = _r(dim_inner, d)
        sd[pp + f"layers.{i}.0.to_kv.weight"] = _r(dim_inner * 2, d)
        sd[pp + f"layers.{i}.0.to_out.weight"] = _r(d, dim_inner)
        sd[pp + f"layers.{i}.1.0.weight"] = _r(ff_inner * 2, d)
        sd[pp + f"layers.{i}.1.0.bias"] = torch.zeros(ff_inner * 2)
        sd[pp + f"layers.{i}.1.2.weight"] = _r(d, ff_inner)
        sd[pp + f"layers.{i}.1.2.bias"] = torch.zeros(d)
    sd[pp + "norm.gamma"] = torch.ones(d)
    return sd


def dvae_sd(prefix, channels, num_tokens, codebook_dim=24, hidden=DVAE_HIDDEN):
    sd = {}
    enc_chans = [hidden, hidden * 2]

    def conv(name, o, i, k):
        sd[prefix + name + ".weight"] = _r(o, i, k)
        sd[prefix + name + ".bias"] = torch.zeros(o)

    def resblock(name, c):
        conv(name + ".net.0", c, c, 3)
        conv(name + ".net.2", c, c, 3)
        conv(name + ".net.4", c, c, 1)

    conv("encoder.0.0", enc_chans[0], channels, 3)
    conv("encoder.1.0", enc_chans[1], enc_chans[0], 3)
    for j in range(3):
        resblock(f"encoder.{2 + j}", enc_chans[1])
    conv("encoder.5", codebook_dim, enc_chans[1], 1)

    conv("decoder.0", enc_chans[1], codebook_dim, 1)
    for j in range(3):
        resblock(f"decoder.{1 + j}", enc_chans[1])
    conv("decoder.4.0.conv", enc_chans[1], enc_chans[1], 3)
    conv("decoder.5.0.conv", enc_chans[0], enc_chans[1], 3)
    conv("decoder.6", channels, enc_chans[0], 1)

    embed = torch.randn(codebook_dim, num_tokens)
    sd[prefix + "codebook.embed"] = embed
    sd[prefix + "codebook.cluster_size"] = torch.zeros(num_tokens)
    sd[prefix + "codebook.embed_avg"] = embed.clone()
    return sd


def hifigan_sd(prefix="hifigan.", input_feat_dim=GPT_DIM, ch0=32):
    from torch.nn.utils import weight_norm
    import torch.nn as tnn

    sd = {}

    def add(name, mod):
        for k, v in mod.state_dict().items():
            sd[prefix + name + "." + k] = v

    torch.manual_seed(3)
    add("conv_pre", weight_norm(tnn.Conv1d(input_feat_dim, ch0, 7, padding=3)))
    rates, kernels = [8, 8, 4], [16, 16, 8]
    rk = [3, 5, 7]
    rd = [[1, 2], [2, 6], [3, 12]]
    idx = 0
    for i, (u, k) in enumerate(zip(rates, kernels)):
        add(f"ups.{i}", weight_norm(tnn.ConvTranspose1d(
            ch0 // (2 ** i), ch0 // (2 ** (i + 1)), k, u, padding=(k - u) // 2)))
        ch = ch0 // (2 ** (i + 1))
        for kr, dil in zip(rk, rd):
            for j, dd in enumerate(dil):
                add(f"resblocks.{idx}.convs.{j}", weight_norm(tnn.Conv1d(
                    ch, ch, kr, dilation=dd, padding=(kr * dd - dd) // 2)))
            idx += 1
    add("conv_post", weight_norm(tnn.Conv1d(ch0 // 8, 1, 7, padding=3)))
    return sd


def contentvec_sd(prefix="content_extractor.model.", n_layers=CV_LAYERS):
    sd = {}
    conv_specs = [(512, 1, 10)] + [(512, 512, 3)] * 4 + [(512, 512, 2)] * 2
    for i, (o, ic, k) in enumerate(conv_specs):
        sd[prefix + f"feature_extractor.conv_layers.{i}.0.weight"] = _r(o, ic, k, std=0.02)
    sd[prefix + "feature_extractor.conv_layers.0.2.weight"] = torch.ones(512)
    sd[prefix + "feature_extractor.conv_layers.0.2.bias"] = torch.zeros(512)
    sd[prefix + "layer_norm.weight"] = torch.ones(512)
    sd[prefix + "layer_norm.bias"] = torch.zeros(512)
    sd[prefix + "post_extract_proj.weight"] = _r(768, 512, std=0.02)
    sd[prefix + "post_extract_proj.bias"] = torch.zeros(768)
    # pos conv weight-normed on dim=2 (fairseq)
    v = _r(768, 48, 128, std=0.02)
    g = torch.ones(1, 1, 128)
    sd[prefix + "encoder.pos_conv.0.weight_g"] = g
    sd[prefix + "encoder.pos_conv.0.weight_v"] = v
    sd[prefix + "encoder.pos_conv.0.bias"] = torch.zeros(768)
    sd[prefix + "encoder.layer_norm.weight"] = torch.ones(768)
    sd[prefix + "encoder.layer_norm.bias"] = torch.zeros(768)
    for i in range(n_layers):
        p = prefix + f"encoder.layers.{i}."
        for name, (o, ic) in (("self_attn.q_proj", (768, 768)),
                              ("self_attn.k_proj", (768, 768)),
                              ("self_attn.v_proj", (768, 768)),
                              ("self_attn.out_proj", (768, 768)),
                              ("fc1", (3072, 768)), ("fc2", (768, 3072))):
            sd[p + name + ".weight"] = _r(o, ic, std=0.02)
            sd[p + name + ".bias"] = torch.zeros(o)
        for name in ("self_attn_layer_norm", "final_layer_norm"):
            sd[p + name + ".weight"] = torch.ones(768)
            sd[p + name + ".bias"] = torch.zeros(768)
    sd[prefix + "final_proj.weight"] = _r(256, 768, std=0.02)
    sd[prefix + "final_proj.bias"] = torch.zeros(256)
    return sd


def make_config_dict():
    return {
        "model_args": {
            "gpt_layers": GPT_LAYERS,
            "gpt_n_model_channels": GPT_DIM,
            "gpt_n_heads": GPT_HEADS,
            "gpt_max_audio_tokens": 605,
            "gpt_max_text_tokens": 402,
            "gpt_max_prompt_tokens": 70,
            "gpt_number_text_tokens": 258,
            "gpt_start_text_token": 256,
            "gpt_stop_text_token": 257,
            "gpt_num_audio_tokens": 1026,
            "gpt_start_audio_token": 1024,
            "gpt_stop_audio_token": 1025,
            "gpt_code_stride_len": 1024,
            "mel_norm_file": "pre_trained/mel_stats.npy",
        },
        "audio": {"sample_rate": 24000, "content_sample_rate": 16000,
                  "dvae_sample_rate": 24000},
        "acoustic_dvae_config": {
            "num_channels": 80, "num_tokens": 1024, "codebook_dim": 24,
            "hidden_dim": DVAE_HIDDEN, "num_resnet_blocks": 3,
            "kernel_size": 3, "num_layers": 2},
        "content_dvae_config": {
            "num_channels": 256, "num_tokens": 256, "codebook_dim": 24,
            "hidden_dim": DVAE_HIDDEN, "num_resnet_blocks": 3,
            "kernel_size": 3, "num_layers": 2},
        "vocoder_config": {"input_feat_dim": GPT_DIM,
                           "upsample_initial_channel": 32},
        "temperature": 0.85, "top_k": 15, "top_p": 0.85,
        "repetition_penalty": 2.0,
    }


def write_bundle(path: str):
    torch.manual_seed(0)
    sd = {}
    sd.update(gpt_sd())
    sd.update(dvae_sd("acoustic_dvae.", 80, 1024))
    sd.update(dvae_sd("content_dvae.", 256, 256))
    sd.update(hifigan_sd())
    sd.update(contentvec_sd())
    torch.save({"model": sd, "config": make_config_dict()}, path)
    return path


# ----------------------------------------------------------------- smoke mode
# One-command 2-step TPU smoke of every train stage: synthetic sine-wave
# dataset + synthetic frozen stage checkpoints (tiny dims), used by the train
# scripts' --smoke flag.


def make_sine_dataset(out_dir, n=8, sr=24000, dur=1.6):
    """Write n sine-plus-noise wavs and a `path|spk` metafile; returns the
    metafile path."""
    import os

    from genvc_tpu.dsp.audio_io import write_wav

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    meta = os.path.join(out_dir, "meta.txt")
    with open(meta, "w") as f:
        for i in range(n):
            t = np.arange(int(sr * dur)) / sr
            wav = (0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)
                   + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
            p = os.path.join(out_dir, f"w{i}.wav")
            write_wav(p, wav, sr)
            f.write(f"{p}|spk{i % 2}\n")
    return meta


def write_stage_ckpts(out_dir):
    """Write synthetic frozen-stage checkpoints (contentvec / both dVAEs /
    GPT) in the reference torch formats; returns their paths as a dict."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    torch.manual_seed(0)
    paths = {
        "contentvec": os.path.join(out_dir, "contentvec.pt"),
        "acoustic_dvae": os.path.join(out_dir, "acoustic_dvae.pth"),
        "content_dvae": os.path.join(out_dir, "content_dvae.pth"),
        "gpt": os.path.join(out_dir, "gpt.pth"),
    }
    torch.save({"model": contentvec_sd(prefix="", n_layers=1)},
               paths["contentvec"])
    torch.save(dvae_sd("", 80, 64), paths["acoustic_dvae"])
    torch.save(dvae_sd("", 256, 36), paths["content_dvae"])
    torch.save({"model": gpt_sd(prefix="gpt."), "config": {}}, paths["gpt"])
    return paths


def smoke_overrides(cfg, assets_dir, need_gpt_ckpt=False):
    """Shrink a stage config in place for a 2-step smoke run: tiny model
    dims matching the synthetic checkpoints, synthetic data, batch 2."""
    meta = make_sine_dataset(assets_dir)
    paths = write_stage_ckpts(assets_dir)
    cfg.train_metafile = meta
    cfg.test_metafile = meta
    cfg.batch_size = 2
    cfg.eval_batch_size = 2
    cfg.num_loader_workers = 2
    cfg.epochs = 1
    cfg.print_step = 1
    cfg.save_step = 100
    cfg.contentvec_model_path = paths["contentvec"]
    cfg.acoustic_dvae_checkpoint = paths["acoustic_dvae"]
    cfg.content_dvae_checkpoint = paths["content_dvae"]
    ma = cfg.model_args
    ma.gpt_layers, ma.gpt_n_model_channels, ma.gpt_n_heads = (
        GPT_LAYERS, GPT_DIM, GPT_HEADS)
    ma.min_text_length, ma.max_text_length = 2, 4
    ma.min_conditioning_length, ma.max_conditioning_length = 24000, 36000
    ma.mel_norm_file = None
    if need_gpt_ckpt:
        ma.gpt_checkpoint = paths["gpt"]
        ma.min_text_length = ma.max_text_length = 2
    vae_kw = dict(codebook_dim=24, hidden_dim=DVAE_HIDDEN,
                  num_resnet_blocks=3, kernel_size=3, num_layers=2)
    for k, v in dict(num_channels=80, num_tokens=64, **vae_kw).items():
        setattr(cfg.acoustic_dvae_config, k, v)
    for k, v in dict(num_channels=256, num_tokens=36, **vae_kw).items():
        setattr(cfg.content_dvae_config, k, v)
    vc = cfg.vocoder_config
    vc.input_feat_dim = GPT_DIM
    vc.upsample_initial_channel = 16
    vc.msstftd_filters = 4
    vc.mssbcqtd_filters = 4
    vc.mssbcqtd_hop_lengths = [512]
    vc.mssbcqtd_n_octavess = [5]
    vc.mssbcqtd_bins_per_octave = [12]
    return cfg


def smoke_vae_overrides(cfg, assets_dir):
    """Shrink a VAEConfig in place for a 2-step smoke run."""
    sr = cfg.audio.dvae_sample_rate
    meta = make_sine_dataset(assets_dir, sr=sr, dur=0.6 if sr == 24000 else 1.2)
    cfg.train_metafile = meta
    cfg.test_metafile = meta
    cfg.batch_size = 2
    cfg.eval_batch_size = 2
    cfg.num_loader_workers = 2
    cfg.epochs = 1
    cfg.max_wav_len = sr
    cfg.mel_norm_file = None
    if cfg.feat_type != "Mel-spectrogram":
        paths = write_stage_ckpts(assets_dir)
        cfg.contentvec_model_path = paths["contentvec"]
    cfg.num_tokens = 32
    cfg.codebook_dim = 16
    cfg.hidden_dim = 8
    cfg.num_resnet_blocks = 1
    cfg.num_layers = 2
    return cfg
