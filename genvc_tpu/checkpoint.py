"""Checkpoint conversion: torch ``.pth`` bundles → genvc_tpu pytrees.

The reference ships single-file bundles ``{'model': state_dict, 'config':
dict}`` (inference/model_init.py:11-22) whose state dict covers the composed
``HiFiGANTrainer`` container: ``gpt.*``, ``hifigan.*``, ``acoustic_dvae.*``,
``content_dvae.*``, ``content_extractor.model.*``. This module maps each
family onto the corresponding genvc_tpu param pytree. Conversion runs once on
host (numpy); torch is only imported lazily for ``torch.load``.

Convention: linear weights transpose to (in, out); conv weights keep torch
(O, I, K) layout (applied with ``dimension_numbers=('NCH','OIH','NCH')``);
HF GPT-2 ``Conv1D`` weights are already (in, out) and pass through unchanged.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _ln(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _linear_t(sd, prefix, bias=True):
    p = {"w": _np(sd[prefix + ".weight"]).T}
    if bias and prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def _linear_asis(sd, prefix, bias=True):
    p = {"w": _np(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def fold_weight_norm(sd, prefix):
    """weight = g * v / ||v||; the norm axes are inferred from g's shape
    (torch ``weight_norm(dim=d)`` keeps dim d in g — default dim=0 for most
    convs, dim=2 for fairseq's pos_conv)."""
    g = _np(sd[prefix + ".weight_g"])
    v = _np(sd[prefix + ".weight_v"])
    axes = tuple(i for i in range(v.ndim) if g.shape[i] == 1) if g.ndim == v.ndim \
        else tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _conv(sd, prefix, weight_normed=False):
    if weight_normed and prefix + ".weight_g" in sd:
        w = fold_weight_norm(sd, prefix)
    else:
        w = _np(sd[prefix + ".weight"])
    p = {"w": w}
    if prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def strip_prefix(sd: dict, prefix: str) -> dict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# GPT (layers/gpt.py naming)


def convert_gpt(sd: dict, n_layers: int) -> dict:
    """sd: state dict with keys relative to the ``gpt.`` module
    (gpt.weight names from layers/gpt.py: ``gpt.h.{i}...``, embeddings, heads,
    ``conditioning_perceiver...``)."""

    def block(i):
        p = f"gpt.h.{i}."
        return {
            "ln_1": _ln(sd, p + "ln_1"),
            "attn": {
                "c_attn": _linear_asis(sd, p + "attn.c_attn"),
                "c_proj": _linear_asis(sd, p + "attn.c_proj"),
            },
            "ln_2": _ln(sd, p + "ln_2"),
            "mlp": {
                "c_fc": _linear_asis(sd, p + "mlp.c_fc"),
                "c_proj": _linear_asis(sd, p + "mlp.c_proj"),
            },
        }

    blocks = [block(i) for i in range(n_layers)]
    stacked = {}

    def stack(path, trees):
        out = {}
        for k in trees[0]:
            vals = [t[k] for t in trees]
            if isinstance(vals[0], dict):
                out[k] = stack(path + (k,), vals)
            else:
                out[k] = np.stack(vals)
        return out

    stacked = stack((), blocks)

    params = {
        "text_embedding": _np(sd["text_embedding.weight"]),
        "mel_embedding": _np(sd["mel_embedding.weight"]),
        "text_pos": _np(sd["text_pos_embedding.emb.weight"]),
        "mel_pos": _np(sd["mel_pos_embedding.emb.weight"]),
        "core": {"blocks": stacked, "ln_f": _ln(sd, "gpt.ln_f")},
        "final_norm": _ln(sd, "final_norm"),
        "text_head": _linear_t(sd, "text_head"),
        "mel_head": _linear_t(sd, "mel_head"),
        "perceiver": convert_perceiver(strip_prefix(sd, "conditioning_perceiver.")),
    }
    return params


def convert_perceiver(sd: dict, depth: int = 4) -> dict:
    def layer(i):
        a = f"layers.{i}.0."
        f = f"layers.{i}.1."
        return {
            "to_q": _linear_t(sd, a + "to_q"),
            "to_kv": _linear_t(sd, a + "to_kv"),
            "to_out": _linear_t(sd, a + "to_out"),
            "ff_in": _linear_t(sd, f + "0"),
            "ff_out": _linear_t(sd, f + "2"),
        }

    layers = [layer(i) for i in range(depth)]

    def stack(trees):
        out = {}
        for k in trees[0]:
            vals = [t[k] for t in trees]
            out[k] = stack(vals) if isinstance(vals[0], dict) else np.stack(vals)
        return out

    return {
        "proj_context": _linear_t(sd, "proj_context"),
        "latents": _np(sd["latents"]),
        "layers": stack(layers),
        "norm": {"gamma": _np(sd["norm.gamma"])},
    }


# ---------------------------------------------------------------------------
# Discrete VAE (layers/dvae.py naming, use_transposed_convs=False topology)


def convert_dvae(sd: dict, num_layers: int = 2, num_resnet_blocks: int = 3) -> dict:
    """Encoder: [conv+act]*num_layers, ResBlock*num_resnet_blocks, conv1x1.
    Decoder: conv1x1, ResBlock*n, [UpsampledConv+act]*num_layers, conv1x1.
    torch Sequential indices follow layers/dvae.py:252-292."""

    def resblock(prefix):
        # ResBlock.net: Sequential(conv, act, conv, act, conv)
        return {
            "conv1": _conv(sd, prefix + "net.0"),
            "conv2": _conv(sd, prefix + "net.2"),
            "conv3": _conv(sd, prefix + "net.4"),
        }

    enc = {"convs": [], "resblocks": [], "out": None}
    for i in range(num_layers):
        # nn.Sequential(conv, act) at encoder index i -> keys encoder.{i}.0.*
        enc["convs"].append(_conv(sd, f"encoder.{i}.0"))
    for j in range(num_resnet_blocks):
        enc["resblocks"].append(resblock(f"encoder.{num_layers + j}."))
    enc["out"] = _conv(sd, f"encoder.{num_layers + num_resnet_blocks}")

    dec = {"inp": _conv(sd, "decoder.0"), "resblocks": [], "ups": [], "out": None}
    for j in range(num_resnet_blocks):
        dec["resblocks"].append(resblock(f"decoder.{1 + j}."))
    for i in range(num_layers):
        idx = 1 + num_resnet_blocks + i
        dec["ups"].append(_conv(sd, f"decoder.{idx}.0.conv"))
    dec["out"] = _conv(sd, f"decoder.{1 + num_resnet_blocks + num_layers}")

    return {
        "encoder": enc,
        "decoder": dec,
        "codebook": {
            "embed": _np(sd["codebook.embed"]),            # (dim, n_embed)
            "cluster_size": _np(sd["codebook.cluster_size"]),
            "embed_avg": _np(sd["codebook.embed_avg"]),
        },
    }


# ---------------------------------------------------------------------------
# HiFi-GAN generator (layers/hifigan.py naming); weight norm folded for
# inference, or kept as (g, v) for training.


def convert_hifigan(sd: dict, n_ups: int = 3, n_kernels: int = 3,
                    n_convs_per_block: int = 2, fold: bool = True) -> dict:
    def wn_conv(prefix):
        if fold:
            return {"w": fold_weight_norm(sd, prefix), "b": _np(sd[prefix + ".bias"])}
        return {"g": _np(sd[prefix + ".weight_g"]),
                "v": _np(sd[prefix + ".weight_v"]),
                "b": _np(sd[prefix + ".bias"])}

    resblocks = []
    for i in range(n_ups * n_kernels):
        convs = [wn_conv(f"resblocks.{i}.convs.{j}") for j in range(n_convs_per_block)]
        resblocks.append({"convs": convs})

    return {
        "conv_pre": wn_conv("conv_pre"),
        "ups": [wn_conv(f"ups.{i}") for i in range(n_ups)],
        "resblocks": resblocks,
        "conv_post": wn_conv("conv_post"),
    }


# ---------------------------------------------------------------------------
# ContentVec / HuBERT encoder (fairseq naming)


def convert_contentvec(sd: dict, n_layers: int = 12) -> dict:
    """fairseq HubertModel state dict (keys relative to the model root)."""
    fe = []
    for i in range(7):
        p = f"feature_extractor.conv_layers.{i}."
        layer = {"conv": {"w": _np(sd[p + "0.weight"])}}
        if p + "0.bias" in sd:
            layer["conv"]["b"] = _np(sd[p + "0.bias"])
        if p + "2.weight" in sd:  # group norm on layer 0 (default config)
            layer["norm"] = {"scale": _np(sd[p + "2.weight"]),
                             "bias": _np(sd[p + "2.bias"])}
        fe.append(layer)

    def attn(p):
        return {
            "q": _linear_t(sd, p + "q_proj"),
            "k": _linear_t(sd, p + "k_proj"),
            "v": _linear_t(sd, p + "v_proj"),
            "out": _linear_t(sd, p + "out_proj"),
        }

    layers = []
    for i in range(n_layers):
        p = f"encoder.layers.{i}."
        layers.append({
            "attn": attn(p + "self_attn."),
            "attn_ln": _ln(sd, p + "self_attn_layer_norm"),
            "fc1": _linear_t(sd, p + "fc1"),
            "fc2": _linear_t(sd, p + "fc2"),
            "final_ln": _ln(sd, p + "final_layer_norm"),
        })

    def stack(trees):
        out = {}
        for k in trees[0]:
            vals = [t[k] for t in trees]
            out[k] = stack(vals) if isinstance(vals[0], dict) else np.stack(vals)
        return out

    # pos_conv may be stored weight-normed (weight_g/weight_v) or plain
    if "encoder.pos_conv.0.weight_g" in sd:
        pos_w = fold_weight_norm(sd, "encoder.pos_conv.0")
    else:
        pos_w = _np(sd["encoder.pos_conv.0.weight"])

    params = {
        "feature_extractor": fe,
        "post_extract_proj": _linear_t(sd, "post_extract_proj"),
        "pos_conv": {"w": pos_w, "b": _np(sd["encoder.pos_conv.0.bias"])},
        "pre_ln": _ln(sd, "layer_norm"),
        "encoder_ln": _ln(sd, "encoder.layer_norm"),
        "layers": stack(layers),
        "final_proj": _linear_t(sd, "final_proj"),
    }
    return params


# ---------------------------------------------------------------------------
# Bundle loading


def load_torch_bundle(path: str):
    """Load a reference ``.pth`` bundle; returns (state_dict, config_dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and "config" in ckpt:
        return ckpt["model"], ckpt["config"]
    return ckpt, None


def convert_bundle(path: str):
    """Convert a full GenVC inference bundle into genvc_tpu pytrees.

    Returns dict with keys: gpt, hifigan, acoustic_dvae, content_dvae,
    contentvec (missing families are skipped), plus the config dict.
    """
    sd, cfg_dict = load_torch_bundle(path)
    out = {"config": cfg_dict}
    gpt_sd = strip_prefix(sd, "gpt.")
    if gpt_sd:
        n_layers = max(int(k.split(".")[2]) for k in gpt_sd if k.startswith("gpt.h.")) + 1
        out["gpt"] = convert_gpt(gpt_sd, n_layers)
    hg_sd = strip_prefix(sd, "hifigan.")
    if hg_sd:
        out["hifigan"] = convert_hifigan(hg_sd)
    for name, key in (("acoustic_dvae", "acoustic_dvae."), ("content_dvae", "content_dvae.")):
        d_sd = strip_prefix(sd, key)
        if d_sd:
            out[name] = convert_dvae(d_sd)
    cv_sd = strip_prefix(sd, "content_extractor.model.")
    if cv_sd:
        n_cv = max(int(k.split(".")[2]) for k in cv_sd
                   if k.startswith("encoder.layers.")) + 1
        out["contentvec"] = convert_contentvec(cv_sd, n_layers=n_cv)
    return out


def save_pytree_npz(path: str, tree: dict) -> None:
    """Flatten a pytree of numpy arrays into an .npz with '/'-joined keys."""
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + (str(k),), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(prefix + (str(i) + "#",), v)
        else:
            flat["/".join(prefix)] = np.asarray(node)

    rec((), tree)
    np.savez(path, **flat)


def load_pytree_npz(path: str) -> dict:
    data = np.load(path)
    tree: dict = {}
    for key, value in data.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def fix2(node):
        if isinstance(node, dict):
            if node and all(k.endswith("#") for k in node):
                return [fix2(node[f"{i}#"]) for i in range(len(node))]
            return {k: fix2(v) for k, v in node.items()}
        return node

    return fix2(tree)


def hf_hubert_to_fairseq_sd(hf_sd: dict) -> dict:
    """Map a transformers ``HubertModel`` state dict onto fairseq HuBERT key
    names so :func:`convert_contentvec` can consume it (used for the
    mHuBERT-147 'W2V2_BERT' extractor variant; the reference loads mHuBERT
    via HF — layers/content_processor.py:36-52)."""
    sd = {}
    for k, v in hf_sd.items():
        if k.startswith("feature_extractor.conv_layers."):
            i = k.split(".")[2]
            if ".conv.weight" in k:
                sd[f"feature_extractor.conv_layers.{i}.0.weight"] = v
            elif ".layer_norm." in k:
                sd[f"feature_extractor.conv_layers.{i}.2.{k.split('.')[-1]}"] = v
        elif k.startswith("feature_projection.layer_norm."):
            sd["layer_norm." + k.split(".")[-1]] = v
        elif k.startswith("feature_projection.projection."):
            sd["post_extract_proj." + k.split(".")[-1]] = v
        elif k.startswith("encoder.pos_conv_embed.conv."):
            tail = k.split("encoder.pos_conv_embed.conv.")[1]
            if tail == "bias":
                sd["encoder.pos_conv.0.bias"] = v
            elif tail in ("weight_g", "parametrizations.weight.original0"):
                sd["encoder.pos_conv.0.weight_g"] = v
            elif tail in ("weight_v", "parametrizations.weight.original1"):
                sd["encoder.pos_conv.0.weight_v"] = v
        elif k.startswith("encoder.layer_norm."):
            sd["encoder.layer_norm." + k.split(".")[-1]] = v
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            if rest.startswith(("attention.", "layer_norm.")):
                rest = (rest.replace("attention.", "self_attn.")
                        .replace("layer_norm.", "self_attn_layer_norm."))
            rest = rest.replace("feed_forward.intermediate_dense", "fc1")
            rest = rest.replace("feed_forward.output_dense", "fc2")
            sd[f"encoder.layers.{i}.{rest}"] = v
    return sd
