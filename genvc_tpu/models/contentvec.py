"""ContentVec / HuBERT-base phonetic feature extractor in JAX.

Behavioral contract (reference: layers/content_processor.py:7-34 — fairseq
``HubertModel.extract_features(source, padding_mask, output_layer=12)`` +
``final_proj``): 16 kHz waveform → 50 Hz, 256-d content features.

Architecture (fairseq HuBERT base, the class the public contentVec.pt
checkpoint loads into):

* conv feature extractor: 7 layers, channels 512, (kernel, stride) =
  (10,5),(3,2)×4,(2,2)×2, bias-free, GELU; per-channel GroupNorm(512, 512)
  after layer 0 only ("group_norm" mode).
* pre-transformer LayerNorm(512) → post_extract_proj 512→768.
* positional conv: Conv1d(768, 768, k=128, groups=16, pad=64), weight-normed
  on dim=2, SamePad trims 1, GELU; added residually; then LayerNorm
  (post-norm configuration, layer_norm_first=False).
* 12 post-LN transformer layers (12 heads, FFN 3072, exact GELU);
  ``output_layer=12`` runs all 12.
* final_proj: 768 → 256.

Padding-mask contract (fairseq ``forward_padding_mask``): a sample is
"padding" iff it equals 0.0; a frame is padding iff all samples mapped to it
are padding. Padded frames are zeroed before the positional conv and masked
as attention keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.ops import nn
from genvc_tpu.ops.conv import conv1d

CONV_LAYERS = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2
EMBED_DIM = 768
N_HEADS = 12
FINAL_DIM = 256


def frame_count(n_samples: int) -> int:
    t = n_samples
    for _, k, s in CONV_LAYERS:
        t = (t - k) // s + 1
    return t


def _group_norm_per_channel(p, x, valid_len=None, eps=1e-5):
    """GroupNorm(num_groups=C, C): normalize each channel over time.
    x: (B, C, T). ``valid_len`` restricts the statistics to the true length —
    the stats are global over time, so static zero-padding would otherwise
    change every frame's normalization vs the reference's exact-length run."""
    if valid_len is None:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    else:
        t = x.shape[-1]
        m = (jnp.arange(t)[None, None, :] < valid_len[:, None, None]).astype(x.dtype)
        cnt = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
        mean = jnp.sum(x * m, axis=-1, keepdims=True) / cnt
        var = jnp.sum(jnp.square(x - mean) * m, axis=-1, keepdims=True) / cnt
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * p["scale"][None, :, None] + p["bias"][None, :, None]


def feature_extractor(params, wav: jnp.ndarray,
                      sample_valid: jnp.ndarray | None = None,
                      compute_dtype=jnp.float32) -> jnp.ndarray:
    """(B, T) 16 kHz waveform -> (B, T', 512) conv features @ 50 Hz.

    With ``sample_valid`` (true lengths of statically padded rows), valid
    lengths are threaded through the stride chain and features beyond them are
    zeroed after each layer, so valid positions match an exact-length run
    (bias-free convs of zeros are zero; GroupNorm stats are masked).

    ``compute_dtype=jnp.bfloat16`` runs the conv stack in bf16 (weights cast
    by conv1d to the input dtype; f32 MXU accumulation) — opt-in for the
    training-target path, see extract_content_features."""
    x = wav[:, None, :].astype(compute_dtype)
    valid = sample_valid
    for i, (layer, (_, k, s)) in enumerate(zip(params["feature_extractor"],
                                               CONV_LAYERS)):
        x = conv1d(layer["conv"], x, stride=s)
        if valid is not None:
            valid = jnp.maximum((valid - k) // s + 1, 0)
        if "norm" in layer:
            x = _group_norm_per_channel(layer["norm"], x, valid)
        x = nn.gelu_exact(x)
        if valid is not None:
            t = x.shape[-1]
            x = x * (jnp.arange(t)[None, None, :] < valid[:, None, None])
    return jnp.swapaxes(x, 1, 2)


def _self_attn(p, x, key_valid):
    q = nn.linear(p["q"], x)
    k = nn.linear(p["k"], x)
    v = nn.linear(p["v"], x)
    qh = nn.split_heads(q, N_HEADS)
    kh = nn.split_heads(k, N_HEADS)
    vh = nn.split_heads(v, N_HEADS)
    bias = None if key_valid is None else nn.key_padding_bias(key_valid)
    out = nn.merge_heads(nn.attention(qh, kh, vh, bias=bias))
    return nn.linear(p["out"], out)


def _encoder_layer(p, x, key_valid):
    # post-LN ordering (fairseq layer_norm_first=False)
    x = x + _self_attn(p["attn"], x, key_valid)
    x = nn.layer_norm(p["attn_ln"], x)
    h = nn.gelu_exact(nn.linear(p["fc1"], x))
    x = x + nn.linear(p["fc2"], h)
    return nn.layer_norm(p["final_ln"], x)


def extract_content_features(params, wav: jnp.ndarray,
                             sample_valid: jnp.ndarray | None = None,
                             compute_dtype=None) -> jnp.ndarray:
    """(B, T) @16 kHz -> (B, T', 256) content features.

    ``sample_valid``: optional (B,) true sample counts for statically padded
    input — combined with the zero-sample rule to build the frame padding mask
    exactly as the reference does on exact-length input.

    ``compute_dtype=jnp.bfloat16``: opt-in bf16 compute for the whole
    extractor (output upcast to f32). The default stays f32 — the reference
    trains in f32 and these features become VQ training targets, where a
    rounding can flip a code index. Measured on real sample audio, reduced
    precision flipped 0/150 codes and the feature movement is ~1e-2 relative;
    the training stage exposes this as an explicit speed knob
    (content_dtype), never silently.
    """
    if compute_dtype is None:
        compute_dtype = jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(compute_dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    feats = feature_extractor(params, wav, sample_valid,
                              compute_dtype=compute_dtype)  # (B, T', 512)
    b, t_frames, _ = feats.shape

    # fairseq forward_padding_mask: trim extra samples, frame is pad iff all
    # its samples are pad (== 0.0 in the reference call, content_processor.py:24)
    samples_per_frame = wav.shape[-1] // t_frames
    trimmed = wav[:, : t_frames * samples_per_frame].reshape(b, t_frames, -1)
    frame_pad = jnp.all(trimmed == 0.0, axis=-1)
    if sample_valid is not None:
        # frames that would not exist in an exact-length run are padding:
        # thread the true length through the conv stride chain
        valid = sample_valid
        for _, k, s in CONV_LAYERS:
            valid = jnp.maximum((valid - k) // s + 1, 0)
        frame_idx = jnp.arange(t_frames)[None, :]
        frame_pad = frame_pad | (frame_idx >= valid[:, None])
    frame_valid = ~frame_pad

    feats = nn.layer_norm(params["pre_ln"], feats)
    x = nn.linear(params["post_extract_proj"], feats)

    # zero padded frames, positional conv (groups=16, SamePad trims 1), residual
    x = x * frame_valid[..., None]
    xc = conv1d(params["pos_conv"], jnp.swapaxes(x, 1, 2), padding=64, groups=16)
    xc = xc[..., :-1]  # SamePad for even kernel
    xc = nn.gelu_exact(jnp.swapaxes(xc, 1, 2))
    x = x + xc
    x = nn.layer_norm(params["encoder_ln"], x)

    def body(carry, lp):
        return _encoder_layer(lp, carry, frame_valid), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return nn.linear(params["final_proj"], x).astype(jnp.float32)


def init_params(key, n_layers: int = 12):
    """Random init with the right shapes (for tests / from-scratch use)."""
    ks = iter(jax.random.split(key, 128))
    fe = []
    in_c = 1
    for i, (c, k, s) in enumerate(CONV_LAYERS):
        layer = {"conv": {"w": jax.random.normal(next(ks), (c, in_c, k)) * 0.05}}
        if i == 0:
            layer["norm"] = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
        fe.append(layer)
        in_c = c

    def lin(i, o):
        return nn.init_linear(next(ks), i, o)

    layers = []
    for _ in range(n_layers):
        layers.append({
            "attn": {"q": lin(EMBED_DIM, EMBED_DIM), "k": lin(EMBED_DIM, EMBED_DIM),
                     "v": lin(EMBED_DIM, EMBED_DIM), "out": lin(EMBED_DIM, EMBED_DIM)},
            "attn_ln": nn.init_layer_norm(EMBED_DIM),
            "fc1": lin(EMBED_DIM, 3072),
            "fc2": lin(3072, EMBED_DIM),
            "final_ln": nn.init_layer_norm(EMBED_DIM),
        })

    def stack(trees):
        out = {}
        for k in trees[0]:
            vals = [t[k] for t in trees]
            out[k] = stack(vals) if isinstance(vals[0], dict) else jnp.stack(vals)
        return out

    return {
        "feature_extractor": fe,
        "post_extract_proj": lin(512, EMBED_DIM),
        "pos_conv": {"w": jax.random.normal(next(ks), (EMBED_DIM, EMBED_DIM // 16, 128)) * 0.01,
                     "b": jnp.zeros((EMBED_DIM,))},
        "pre_ln": nn.init_layer_norm(512),
        "encoder_ln": nn.init_layer_norm(EMBED_DIM),
        "layers": stack(layers),
        "final_proj": lin(EMBED_DIM, FINAL_DIM),
    }


def extract_conv_features(params, wav: jnp.ndarray) -> jnp.ndarray:
    """mHuBERT-style conv-extractor-only features: (B, T) -> (B, T', 512).

    Equivalent of the reference ``MultiLingualContentExtractor``
    (layers/content_processor.py:36-52), which taps HF mHuBERT-147's
    ``feature_extractor`` (the 7-layer conv stack) without the transformer.
    Selectable via ``feat_type='W2V2_BERT'`` in the VAE stage.
    """
    return feature_extractor(params, wav)
