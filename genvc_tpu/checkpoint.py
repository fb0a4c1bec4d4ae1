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


# ---------------------------------------------------------------------------
# Export: genvc_tpu pytrees → reference ``.pth`` bundles (inverse of
# convert_bundle). A model trained on this framework exports to the exact
# state-dict naming the reference's HiFiGANTrainer composition loads
# (inference/model_init.py:11-22, trainers/*.py key-remap loaders), so TPU
# checkpoints deploy anywhere the reference runs.


def _unfold_weight_norm(w: np.ndarray, dim: int = 0):
    """Reparametrize a folded weight back to torch ``weight_norm``'s (g, v):
    v = w and g = ||w|| over every axis except ``dim`` — folding (g, v)
    reproduces w exactly."""
    w = np.asarray(w, np.float32)
    axes = tuple(i for i in range(w.ndim) if i != dim)
    g = np.sqrt(np.sum(w * w, axis=axes, keepdims=True))
    return g, w


def _put_linear_t(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["w"], np.float32).T
    if "b" in p:
        sd[prefix + ".bias"] = np.asarray(p["b"], np.float32)


def _put_linear_asis(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["w"], np.float32)
    if "b" in p:
        sd[prefix + ".bias"] = np.asarray(p["b"], np.float32)


def _put_ln(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["scale"], np.float32)
    sd[prefix + ".bias"] = np.asarray(p["bias"], np.float32)


def _put_conv(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["w"], np.float32)
    if "b" in p:
        sd[prefix + ".bias"] = np.asarray(p["b"], np.float32)


def _put_wn_conv(sd, prefix, p, dim: int = 0):
    """Emit torch ``weight_norm`` (weight_g, weight_v) keys from either a
    training-form {g, v} leaf or a folded inference-form {w} leaf."""
    if "g" in p:
        g, v = np.asarray(p["g"], np.float32), np.asarray(p["v"], np.float32)
    else:
        g, v = _unfold_weight_norm(p["w"], dim=dim)
    sd[prefix + ".weight_g"] = g
    sd[prefix + ".weight_v"] = v
    if "b" in p:
        sd[prefix + ".bias"] = np.asarray(p["b"], np.float32)


def _unstack(node):
    """Inverse of the converters' ``stack``: a pytree of (L, ...) leaves →
    list of L pytrees."""
    leaves = []

    def first_leaf(n):
        if isinstance(n, dict):
            return first_leaf(next(iter(n.values())))
        return n

    n_layers = np.asarray(first_leaf(node)).shape[0]

    def take(n, i):
        if isinstance(n, dict):
            return {k: take(v, i) for k, v in n.items()}
        return np.asarray(n)[i]

    return [take(node, i) for i in range(n_layers)]


def export_perceiver(params: dict) -> dict:
    sd: dict = {}
    _put_linear_t(sd, "proj_context", params["proj_context"])
    sd["latents"] = np.asarray(params["latents"], np.float32)
    sd["norm.gamma"] = np.asarray(params["norm"]["gamma"], np.float32)
    for i, layer in enumerate(_unstack(params["layers"])):
        a, f = f"layers.{i}.0.", f"layers.{i}.1."
        _put_linear_t(sd, a + "to_q", layer["to_q"])
        _put_linear_t(sd, a + "to_kv", layer["to_kv"])
        _put_linear_t(sd, a + "to_out", layer["to_out"])
        _put_linear_t(sd, f + "0", layer["ff_in"])
        _put_linear_t(sd, f + "2", layer["ff_out"])
    return sd


def export_gpt(params: dict) -> dict:
    """Inverse of :func:`convert_gpt` — keys relative to the bundle's
    ``gpt.`` module (layers/gpt.py naming; no wte/wpe: the reference deletes
    both from its GPT2Model, gpt.py:68-71)."""
    sd: dict = {}
    sd["text_embedding.weight"] = np.asarray(params["text_embedding"], np.float32)
    sd["mel_embedding.weight"] = np.asarray(params["mel_embedding"], np.float32)
    sd["text_pos_embedding.emb.weight"] = np.asarray(params["text_pos"], np.float32)
    sd["mel_pos_embedding.emb.weight"] = np.asarray(params["mel_pos"], np.float32)
    for i, blk in enumerate(_unstack(params["core"]["blocks"])):
        p = f"gpt.h.{i}."
        _put_ln(sd, p + "ln_1", blk["ln_1"])
        _put_linear_asis(sd, p + "attn.c_attn", blk["attn"]["c_attn"])
        _put_linear_asis(sd, p + "attn.c_proj", blk["attn"]["c_proj"])
        _put_ln(sd, p + "ln_2", blk["ln_2"])
        _put_linear_asis(sd, p + "mlp.c_fc", blk["mlp"]["c_fc"])
        _put_linear_asis(sd, p + "mlp.c_proj", blk["mlp"]["c_proj"])
    _put_ln(sd, "gpt.ln_f", params["core"]["ln_f"])
    _put_ln(sd, "final_norm", params["final_norm"])
    _put_linear_t(sd, "text_head", params["text_head"])
    _put_linear_t(sd, "mel_head", params["mel_head"])
    for k, v in export_perceiver(params["perceiver"]).items():
        sd["conditioning_perceiver." + k] = v
    return sd


def export_dvae(params: dict) -> dict:
    sd: dict = {}
    enc, dec = params["encoder"], params["decoder"]
    num_layers = len(enc["convs"])
    num_resnet_blocks = len(enc["resblocks"])

    def put_resblock(prefix, rb):
        _put_conv(sd, prefix + "net.0", rb["conv1"])
        _put_conv(sd, prefix + "net.2", rb["conv2"])
        _put_conv(sd, prefix + "net.4", rb["conv3"])

    for i, c in enumerate(enc["convs"]):
        _put_conv(sd, f"encoder.{i}.0", c)
    for j, rb in enumerate(enc["resblocks"]):
        put_resblock(f"encoder.{num_layers + j}.", rb)
    _put_conv(sd, f"encoder.{num_layers + num_resnet_blocks}", enc["out"])

    _put_conv(sd, "decoder.0", dec["inp"])
    for j, rb in enumerate(dec["resblocks"]):
        put_resblock(f"decoder.{1 + j}.", rb)
    for i, c in enumerate(dec["ups"]):
        _put_conv(sd, f"decoder.{1 + num_resnet_blocks + i}.0.conv", c)
    _put_conv(sd, f"decoder.{1 + num_resnet_blocks + num_layers}", dec["out"])

    cb = params["codebook"]
    sd["codebook.embed"] = np.asarray(cb["embed"], np.float32)
    sd["codebook.cluster_size"] = np.asarray(cb["cluster_size"], np.float32)
    sd["codebook.embed_avg"] = np.asarray(cb["embed_avg"], np.float32)
    return sd


def export_hifigan(params: dict) -> dict:
    """Accepts the training form ({g, v, b} leaves) or the folded inference
    form ({w, b}); emits torch weight_norm keys either way."""
    sd: dict = {}
    _put_wn_conv(sd, "conv_pre", params["conv_pre"])
    for i, u in enumerate(params["ups"]):
        _put_wn_conv(sd, f"ups.{i}", u)
    for i, rb in enumerate(params["resblocks"]):
        for j, c in enumerate(rb["convs"]):
            _put_wn_conv(sd, f"resblocks.{i}.convs.{j}", c)
    _put_wn_conv(sd, "conv_post", params["conv_post"])
    return sd


def export_contentvec(params: dict) -> dict:
    sd: dict = {}
    for i, layer in enumerate(params["feature_extractor"]):
        p = f"feature_extractor.conv_layers.{i}."
        _put_conv(sd, p + "0", layer["conv"])
        if "norm" in layer:
            sd[p + "2.weight"] = np.asarray(layer["norm"]["scale"], np.float32)
            sd[p + "2.bias"] = np.asarray(layer["norm"]["bias"], np.float32)
    _put_linear_t(sd, "post_extract_proj", params["post_extract_proj"])
    # fairseq pos_conv is weight_norm(dim=2)
    g, v = _unfold_weight_norm(params["pos_conv"]["w"], dim=2)
    sd["encoder.pos_conv.0.weight_g"] = g
    sd["encoder.pos_conv.0.weight_v"] = v
    sd["encoder.pos_conv.0.bias"] = np.asarray(params["pos_conv"]["b"],
                                               np.float32)
    _put_ln(sd, "layer_norm", params["pre_ln"])
    _put_ln(sd, "encoder.layer_norm", params["encoder_ln"])
    for i, layer in enumerate(_unstack(params["layers"])):
        p = f"encoder.layers.{i}."
        _put_linear_t(sd, p + "self_attn.q_proj", layer["attn"]["q"])
        _put_linear_t(sd, p + "self_attn.k_proj", layer["attn"]["k"])
        _put_linear_t(sd, p + "self_attn.v_proj", layer["attn"]["v"])
        _put_linear_t(sd, p + "self_attn.out_proj", layer["attn"]["out"])
        _put_ln(sd, p + "self_attn_layer_norm", layer["attn_ln"])
        _put_linear_t(sd, p + "fc1", layer["fc1"])
        _put_linear_t(sd, p + "fc2", layer["fc2"])
        _put_ln(sd, p + "final_layer_norm", layer["final_ln"])
    _put_linear_t(sd, "final_proj", params["final_proj"])
    return sd


def export_bundle(tree: dict, path: str) -> None:
    """Inverse of :func:`convert_bundle`: write a reference-format ``.pth``
    bundle ``{'model': state_dict, 'config': dict}`` from genvc_tpu pytrees.
    Families present in ``tree`` (gpt / hifigan / acoustic_dvae /
    content_dvae / contentvec) are emitted under the reference's composed
    prefixes; the config dict is embedded verbatim.

    The same format doubles as the reference's *stage* checkpoints: its
    trainers strip the family prefix from a ``{'model': ...}`` bundle
    (gpt_trainer.py:124-140, hifigan_trainer.py:169-185, VAE_trainer.py:
    65-79), so e.g. an export with only ``gpt`` present loads as the frozen
    GPT checkpoint of the reference's vocoder stage."""
    import torch

    sd: dict = {}
    if tree.get("gpt") is not None:
        for k, v in export_gpt(tree["gpt"]).items():
            sd["gpt." + k] = v
    if tree.get("hifigan") is not None:
        for k, v in export_hifigan(tree["hifigan"]).items():
            sd["hifigan." + k] = v
    for name in ("acoustic_dvae", "content_dvae"):
        if tree.get(name) is not None:
            for k, v in export_dvae(tree[name]).items():
                sd[f"{name}." + k] = v
    if tree.get("contentvec") is not None:
        for k, v in export_contentvec(tree["contentvec"]).items():
            sd["content_extractor.model." + k] = v
    model = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save({"model": model, "config": tree.get("config")}, path)


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
