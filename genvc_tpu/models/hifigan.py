"""HiFi-GAN vocoder generator + the four discriminator families.

Generator contract (reference: layers/hifigan.py:160-234 with the shipped
``BaseVocoderConfig``): conv_pre(1024→256, k7) → 3 × [leaky(0.1) →
ConvTranspose1d(upsample 8,8,4; k 16,16,8; pad (k-u)//2) → mean of 3
ResBlock2(k ∈ {3,5,7}, dilations [1,2],[2,6],[3,12])] → leaky(default 0.01)
→ conv_post(→1, k7) → tanh; every conv weight-normed.

Inference uses folded weight-norm weights ('w'); training keeps the (g, v)
parametrization so gradients match torch ``weight_norm`` (dim=0 norm).

Discriminators (training only): MSD (3 scales, avg-pool 4/2 between,
hifigan.py:281-314), MPD (periods 2,3,5,7,11, reflect pad to period multiple,
:316-426), MS-STFT (complex STFT scales 1024/2048/512, :429-619), MS-SB-CQT
(octave-banked CQT, :623-808 — see genvc_tpu/dsp/cqt.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.config import VocoderConfig
from genvc_tpu.ops.conv import (conv1d, conv2d, conv_transpose1d, init_conv1d,
                                leaky_relu, to_weight_norm)

LRELU_SLOPE = 0.1


def get_padding(kernel_size, dilation=1):
    return int((kernel_size * dilation - dilation) / 2)


# ---------------------------------------------------------------------------
# Generator


def init_generator(key, cfg: VocoderConfig, weight_normed: bool = False):
    ks = iter(jax.random.split(key, 128))
    ch0 = cfg.upsample_initial_channel

    def conv(out_c, in_c, k, std=0.01):
        return init_conv1d(next(ks), out_c, in_c, k, std=std)

    params = {"conv_pre": conv(ch0, cfg.input_feat_dim, 7)}
    ups = []
    resblocks = []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernal_sizes)):
        in_c = ch0 // (2 ** i)
        out_c = ch0 // (2 ** (i + 1))
        # ConvTranspose1d weight layout (I, O, K)
        w = jax.random.normal(next(ks), (in_c, out_c, k), jnp.float32) * 0.01
        ups.append({"w": w, "b": jnp.zeros((out_c,), jnp.float32)})
        for kr, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            convs = [conv(out_c, out_c, kr) for _ in dil]
            resblocks.append({"convs": convs, "kernel": kr, "dilation": list(dil)})
    params["ups"] = ups
    params["resblocks"] = [{"convs": rb["convs"]} for rb in resblocks]
    params["conv_post"] = conv(1, ch0 // (2 ** len(cfg.upsample_rates)), 7)
    if weight_normed:
        params = generator_to_weight_norm(params)
    return params


def generator_to_weight_norm(params):
    return {
        "conv_pre": to_weight_norm(params["conv_pre"]),
        "ups": [to_weight_norm(p) for p in params["ups"]],
        "resblocks": [{"convs": [to_weight_norm(c) for c in rb["convs"]]}
                      for rb in params["resblocks"]],
        "conv_post": to_weight_norm(params["conv_post"]),
    }


def _resblock2(p, x, kernel: int, dilations: Sequence[int], valid_len=None):
    for conv, d in zip(p["convs"], dilations):
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = _mask_t(xt, valid_len)
        xt = conv1d(conv, xt, padding=get_padding(kernel, d), dilation=d)
        x = xt + x
    return x


def _resblock1(p, x, kernel: int, dilations: Sequence[int], valid_len=None):
    n = len(dilations)
    for i in range(n):
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = _mask_t(xt, valid_len)
        xt = conv1d(p["convs1"][i], xt, padding=get_padding(kernel, dilations[i]),
                    dilation=dilations[i])
        xt = leaky_relu(xt, LRELU_SLOPE)
        xt = _mask_t(xt, valid_len)
        xt = conv1d(p["convs2"][i], xt, padding=get_padding(kernel, 1))
        x = xt + x
    return x


def _mask_t(x, valid_len):
    if valid_len is None:
        return x
    t = x.shape[-1]
    return x * (jnp.arange(t)[None, None, :] < valid_len)


def generator_forward(params, x: jnp.ndarray, cfg: VocoderConfig,
                      valid_len=None) -> jnp.ndarray:
    """(B, input_feat_dim, T) -> (B, 1, T*256) waveform in [-1, 1].

    ``valid_len`` (scalar, in input frames): when the input is zero-padded to a
    static width, activations beyond the scaled valid length are re-zeroed
    after every conv so valid output samples exactly match an exact-length run
    (each torch conv zero-pads at the true boundary; masking reproduces that).
    """
    x = _mask_t(x, valid_len)
    x = conv1d(params["conv_pre"], x, padding=3)
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernal_sizes)):
        x = leaky_relu(x, LRELU_SLOPE)
        x = _mask_t(x, valid_len)
        x = conv_transpose1d(params["ups"][i], x, stride=u, padding=(k - u) // 2)
        if valid_len is not None:
            valid_len = valid_len * u
            x = _mask_t(x, valid_len)
        xs = None
        for j in range(n_kernels):
            rb = params["resblocks"][i * n_kernels + j]
            kr = cfg.resblock_kernel_sizes[j]
            dil = cfg.resblock_dilation_sizes[j]
            if cfg.resblock_type == "1":
                y = _resblock1(rb, x, kr, dil, valid_len)
            else:
                y = _resblock2(rb, x, kr, dil, valid_len)
            xs = y if xs is None else xs + y
        x = xs / n_kernels
    x = leaky_relu(x, 0.01)  # torch F.leaky_relu default slope (hifigan.py:230)
    x = _mask_t(x, valid_len)
    x = conv1d(params["conv_post"], x, padding=3)
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Discriminators (training). Each returns (logits_list, fmap_list) per input.
#
# Norm parametrization mirrors the reference (layers/hifigan.py:248-252,
# 286-288, 321): every MSD/MPD conv is torch ``weight_norm`` (g, v) except the
# first MSD scale, whose convs are all ``spectral_norm``
# (``DiscriminatorS(use_spectral_norm=True)``); MPD honors
# ``mpd_use_spectral_norm``. These discriminators train from scratch, so the
# reparametrized gradient geometry is load-bearing for the GAN recipe.


def _l2n(x, eps=1e-12):
    return x / jnp.maximum(jnp.sqrt(jnp.sum(x * x)), eps)


def to_spectral_norm(p, key):
    """Split a folded conv weight into torch ``spectral_norm`` params:
    trainable ``w_orig`` plus persistent power-iteration buffers ``u``
    (dim-0 size) and ``pv`` (flattened remaining dims), init'd like torch
    (normalized gaussians)."""
    w = p["w"]
    ku, kv = jax.random.split(key)
    out = {
        "w_orig": w,
        "u": _l2n(jax.random.normal(ku, (w.shape[0],), jnp.float32)),
        "pv": _l2n(jax.random.normal(
            kv, (int(np.prod(w.shape[1:])),), jnp.float32)),
    }
    if "b" in p:
        out["b"] = p["b"]
    return out


def sn_apply(p, update=False):
    """Resolve a conv param dict to effective-weight form.

    For a spectral-normed dict ({"w_orig","u","pv"[,"b"]}): when ``update``,
    run ONE power-iteration step (torch train-mode forward semantics —
    v = normalize(Wᵀu), u = normalize(Wv), each call); then
    sigma = u·(W·v) with u, v as constants, W_eff = w_orig / sigma (gradient
    flows through w_orig only, matching torch's clone()d buffers). When not
    updating (eval), sigma uses the stored vectors. For weight-norm / plain
    dicts this is a no-op (ops/conv handles (g, v) inline).

    Returns (effective_conv_dict, params_with_new_buffers)."""
    if "w_orig" not in p:
        return p, p
    w = p["w_orig"]
    m = w.reshape(w.shape[0], -1)
    u, v = p["u"], p["pv"]
    if update:
        v = _l2n(m.T @ u)
        u = _l2n(m @ v)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (m @ v)
    eff = {"w": w / sigma}
    if "b" in p:
        eff["b"] = p["b"]
    new_p = dict(p)
    new_p["u"], new_p["pv"] = u, v
    return eff, new_p


def merge_sn_buffers(dst, src):
    """Return ``dst`` with every spectral-norm (u, pv) buffer replaced by the
    corresponding buffer in ``src`` (same tree structure). Used after an
    optimizer update to carry forward the power-iteration state computed in
    the loss forward — buffers are NOT optimizer-updated (their grads are
    zero, but AdamW weight decay would otherwise corrupt them). ``src`` may
    cover a subtree of ``dst`` (e.g. a family subset was run this step);
    missing branches keep their existing buffers."""
    if isinstance(dst, dict):
        if "w_orig" in dst:
            out = dict(dst)
            out["u"], out["pv"] = src["u"], src["pv"]
            return out
        return {k: merge_sn_buffers(dst[k], src[k]) if k in src else dst[k]
                for k in dst}
    if isinstance(dst, (list, tuple)):
        return type(dst)(merge_sn_buffers(a, b) for a, b in zip(dst, src))
    return dst


def init_discriminator_s(key, use_spectral_norm=False):
    ks = iter(jax.random.split(key, 32))
    specs = [  # (out, in, k, stride, groups, pad)
        (128, 1, 15, 1, 1, 7),
        (128, 128, 41, 2, 4, 20),
        (256, 128, 41, 2, 16, 20),
        (512, 256, 41, 4, 16, 20),
        (1024, 512, 41, 4, 16, 20),
        (1024, 1024, 41, 1, 16, 20),
        (1024, 1024, 5, 1, 1, 2),
    ]
    convs = [init_conv1d(next(ks), o, i, k, groups=g)
             for (o, i, k, s, g, p) in specs]
    post = init_conv1d(next(ks), 1, 1024, 3)
    if use_spectral_norm:
        convs = [to_spectral_norm(c, next(ks)) for c in convs]
        post = to_spectral_norm(post, next(ks))
    else:
        convs = [to_weight_norm(c) for c in convs]
        post = to_weight_norm(post)
    return {"convs": convs, "conv_post": post}


_DS_SPECS = [(1, 1, 7), (2, 4, 20), (2, 16, 20), (4, 16, 20), (4, 16, 20),
             (1, 16, 20), (1, 1, 2)]


def discriminator_s_forward(p, x, sn_update=False):
    fmap = []
    new_convs = []
    for conv, (s, g, pad) in zip(p["convs"], _DS_SPECS):
        eff, nc = sn_apply(conv, sn_update)
        new_convs.append(nc)
        x = conv1d(eff, x, stride=s, padding=pad, groups=g)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    eff, npost = sn_apply(p["conv_post"], sn_update)
    x = conv1d(eff, x, padding=1)
    fmap.append(x)
    return (x.reshape(x.shape[0], -1), fmap,
            {"convs": new_convs, "conv_post": npost})


def avg_pool1d(x, kernel=4, stride=2, padding=2):
    """torch AvgPool1d(4, 2, padding=2) semantics (count includes zero pads)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    y = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, (1, 1, kernel), (1, 1, stride), "VALID")
    return y / kernel


def init_msd(key):
    # first scale spectral-normed like the reference
    # (MultiScaleDiscriminator, hifigan.py:286-288)
    k1, k2, k3 = jax.random.split(key, 3)
    return {"discs": [init_discriminator_s(k1, use_spectral_norm=True),
                      init_discriminator_s(k2), init_discriminator_s(k3)]}


def msd_forward(p, y, y_hat, compute_dtype=None, sn_update=False):
    """``compute_dtype`` (e.g. bf16) runs the conv stacks at that dtype —
    discriminators are training-only with no inference parity surface, and
    the reference's own CUDA training runs TF32 convs; losses still
    accumulate in f32 (train/losses.py casts).

    ``sn_update=True`` (training forwards) advances the spectral-norm power
    iteration once per sub-forward — sequentially over (y, y_hat) like torch's
    per-forward buffer updates — and returns a fifth element: the params tree
    with new (u, pv) buffers (feed to ``merge_sn_buffers`` after the
    optimizer step)."""
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
        y_hat = y_hat.astype(compute_dtype)
    logits_r, logits_g, fmap_r, fmap_g = [], [], [], []
    new_discs = []
    for i, d in enumerate(p["discs"]):
        if i != 0:
            y = avg_pool1d(y)
            y_hat = avg_pool1d(y_hat)
        lr, fr, d1 = discriminator_s_forward(d, y, sn_update)
        lg, fg, d2 = discriminator_s_forward(d1, y_hat, sn_update)
        new_discs.append(d2)
        logits_r.append(lr); fmap_r.append(fr)
        logits_g.append(lg); fmap_g.append(fg)
    if sn_update:
        return logits_r, logits_g, fmap_r, fmap_g, {"discs": new_discs}
    return logits_r, logits_g, fmap_r, fmap_g


def init_discriminator_p(key, d_mult=1, use_spectral_norm=False):
    ks = iter(jax.random.split(key, 16))
    chans = [(int(32 * d_mult), 1), (int(128 * d_mult), int(32 * d_mult)),
             (int(512 * d_mult), int(128 * d_mult)),
             (int(1024 * d_mult), int(512 * d_mult)),
             (int(1024 * d_mult), int(1024 * d_mult))]

    def c2(o, i, kh, kw=1):
        k = next(ks)
        fan = i * kh * kw
        lim = 1.0 / np.sqrt(fan)
        kw_, kb_ = jax.random.split(k)
        return {"w": jax.random.uniform(kw_, (o, i, kh, kw), jnp.float32, -lim, lim),
                "b": jax.random.uniform(kb_, (o,), jnp.float32, -lim, lim)}

    convs = [c2(o, i, 5) for (o, i) in chans]
    post = c2(1, int(1024 * d_mult), 3)
    # norm_f = weight_norm unless mpd_use_spectral_norm (hifigan.py:321)
    if use_spectral_norm:
        convs = [to_spectral_norm(c, next(ks)) for c in convs]
        post = to_spectral_norm(post, next(ks))
    else:
        convs = [to_weight_norm(c) for c in convs]
        post = to_weight_norm(post)
    return {"convs": convs, "conv_post": post}


def discriminator_p_forward(p, x, period: int, sn_update=False):
    b, c, t = x.shape
    if t % period != 0:
        n_pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    x = x.reshape(b, c, t // period, period)
    fmap = []
    new_convs = []
    for i, conv in enumerate(p["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        pad = (2, 0)
        eff, nc = sn_apply(conv, sn_update)
        new_convs.append(nc)
        x = conv2d(eff, x, stride=stride, padding=pad)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    eff, npost = sn_apply(p["conv_post"], sn_update)
    x = conv2d(eff, x, padding=(1, 0))
    fmap.append(x)
    return (x.reshape(x.shape[0], -1), fmap,
            {"convs": new_convs, "conv_post": npost})


def init_mpd(key, periods=(2, 3, 5, 7, 11), d_mult=1, use_spectral_norm=False):
    keys = jax.random.split(key, len(periods))
    return {"discs": [init_discriminator_p(k, d_mult, use_spectral_norm)
                      for k in keys]}


MPD_PERIODS = (2, 3, 5, 7, 11)


def mpd_forward(p, y, y_hat, periods=MPD_PERIODS, compute_dtype=None,
                sn_update=False):
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
        y_hat = y_hat.astype(compute_dtype)
    logits_r, logits_g, fmap_r, fmap_g = [], [], [], []
    new_discs = []
    for d, period in zip(p["discs"], periods):
        lr, fr, d1 = discriminator_p_forward(d, y, period, sn_update)
        lg, fg, d2 = discriminator_p_forward(d1, y_hat, period, sn_update)
        new_discs.append(d2)
        logits_r.append(lr); fmap_r.append(fr)
        logits_g.append(lg); fmap_g.append(fg)
    if sn_update:
        return logits_r, logits_g, fmap_r, fmap_g, {"discs": new_discs}
    return logits_r, logits_g, fmap_r, fmap_g


# ---------------------------------------------------------------------------
# MS-STFT discriminator (reference: layers/hifigan.py:429-619)


def get_2d_padding(kernel_size, dilation=(1, 1)):
    return (((kernel_size[0] - 1) * dilation[0]) // 2,
            ((kernel_size[1] - 1) * dilation[1]) // 2)


def init_conv2d(key, out_c, in_c, kh, kw, weight_normed=False):
    kw_, kb_ = jax.random.split(key)
    fan = in_c * kh * kw
    lim = 1.0 / np.sqrt(fan)
    p = {"w": jax.random.uniform(kw_, (out_c, in_c, kh, kw), jnp.float32,
                                 -lim, lim),
         "b": jax.random.uniform(kb_, (out_c,), jnp.float32, -lim, lim)}
    if weight_normed:
        from genvc_tpu.ops.conv import to_weight_norm
        p = to_weight_norm(p)
    return p


def init_discriminator_stft(key, filters: int, n_fft: int, hop: int,
                            win: int, dilations=(1, 2, 4), max_filters=1024,
                            filters_scale=1, kernel=(3, 9), weight_normed=True):
    ks = iter(jax.random.split(key, 16))
    convs = [init_conv2d(next(ks), filters, 2, *kernel)]
    in_chs = min(filters_scale * filters, max_filters)
    for i, d in enumerate(dilations):
        out_chs = min((filters_scale ** (i + 1)) * filters, max_filters)
        convs.append(init_conv2d(next(ks), out_chs, in_chs, *kernel,
                                 weight_normed=weight_normed))
        in_chs = out_chs
    out_chs = min((filters_scale ** (len(dilations) + 1)) * filters, max_filters)
    convs.append(init_conv2d(next(ks), out_chs, in_chs, kernel[0], kernel[0],
                             weight_normed=weight_normed))
    return {
        "convs": convs,
        "conv_post": init_conv2d(next(ks), 1, out_chs, kernel[0], kernel[0],
                                 weight_normed=weight_normed),
    }


def discriminator_stft_forward(p, x, static, compute_dtype=None):
    """x: (B, 1, T). Normalized complex STFT -> 2-channel image -> conv stack.
    The STFT front-end stays f32 (shared parity-exact DSP); ``compute_dtype``
    applies to the conv stack, which dominates the cost."""
    from genvc_tpu.dsp import mel as mel_mod

    n_fft, hop, win = static["n_fft"], static["hop"], static["win"]
    kernel = static["kernel"]
    dilations = static["dilations"]
    re, im = mel_mod.stft_complex(x[:, 0, :], n_fft, hop, win)
    z = jnp.stack([re, im], axis=1)           # (B, 2, F, T)
    z = jnp.swapaxes(z, 2, 3)                 # (B, 2, T, F)
    if compute_dtype is not None:
        z = z.astype(compute_dtype)
    fmap = []
    pads = [get_2d_padding(kernel)]
    strides = [(1, 1)]
    dils = [(1, 1)]
    for d in dilations:
        pads.append(get_2d_padding(kernel, (d, 1)))
        strides.append((1, 2))
        dils.append((d, 1))
    pads.append(get_2d_padding((kernel[0], kernel[0])))
    strides.append((1, 1))
    dils.append((1, 1))
    for conv, pad, st, dl in zip(p["convs"], pads, strides, dils):
        z = conv2d(conv, z, stride=st, padding=pad, dilation=dl)
        z = leaky_relu(z, 0.2)                # LeakyReLU(0.2) (hifigan.py:464)
        fmap.append(z)
    z = conv2d(p["conv_post"], z,
               padding=get_2d_padding((kernel[0], kernel[0])))
    return z.reshape(z.shape[0], -1), fmap


MSSTFTD_SPECS = tuple(
    {"n_fft": n, "hop": h, "win": w, "dilations": (1, 2, 4), "kernel": (3, 9)}
    for n, h, w in zip((1024, 2048, 512), (256, 512, 256), (1024, 2048, 512)))


def init_msstftd(key, filters=32, specs=None):
    """``specs`` overrides the reference resolutions (MSSTFTD_SPECS) — used
    by structural dryruns to shrink the compile (e.g. one tiny FFT)."""
    specs = MSSTFTD_SPECS if specs is None else specs
    keys = jax.random.split(key, len(specs))
    # init derives the conv stack from the SAME spec fields the forward
    # sizes its pad/stride/dilation lists from — a spec overriding dilations
    # or kernel gets a matching parameter stack, not a silently truncated zip
    return {"discs": [init_discriminator_stft(
                          k, filters, s["n_fft"], s["hop"], s["win"],
                          dilations=s.get("dilations", (1, 2, 4)),
                          kernel=s.get("kernel", (3, 9)))
                      for k, s in zip(keys, specs)]}


def msstftd_forward(p, y, y_hat, compute_dtype=None, specs=None):
    specs = MSSTFTD_SPECS if specs is None else specs
    logits_r, logits_g, fmap_r, fmap_g = [], [], [], []
    for d, spec in zip(p["discs"], specs):
        lr, fr = discriminator_stft_forward(d, y, spec, compute_dtype)
        lg, fg = discriminator_stft_forward(d, y_hat, spec, compute_dtype)
        logits_r.append(lr); fmap_r.append(fr)
        logits_g.append(lg); fmap_g.append(fg)
    return logits_r, logits_g, fmap_r, fmap_g


# ---------------------------------------------------------------------------
# MS-SB-CQT discriminator (reference: layers/hifigan.py:623-808)


def init_discriminator_cqt(key, filters, max_filters, filters_scale,
                           dilations, in_channels, out_channels, sample_rate,
                           hop_length, n_octaves, bins_per_octave):
    ks = iter(jax.random.split(key, 32))
    kernel = (3, 9)
    conv_pres = [init_conv2d(next(ks), in_channels * 2, in_channels * 2,
                             *kernel) for _ in range(n_octaves)]
    convs = [init_conv2d(next(ks), filters, in_channels * 2, *kernel)]
    in_chs = min(filters_scale * filters, max_filters)
    for i, d in enumerate(dilations):
        out_chs = min((filters_scale ** (i + 1)) * filters, max_filters)
        convs.append(init_conv2d(next(ks), out_chs, in_chs, *kernel,
                                 weight_normed=True))
        in_chs = out_chs
    out_chs = min((filters_scale ** (len(dilations) + 1)) * filters,
                  max_filters)
    convs.append(init_conv2d(next(ks), out_chs, in_chs, kernel[0], kernel[0],
                             weight_normed=True))
    params = {
        "conv_pres": conv_pres,
        "convs": convs,
        "conv_post": init_conv2d(next(ks), out_channels, out_chs, kernel[0],
                                 kernel[0], weight_normed=True),
    }
    static = {"sample_rate": sample_rate, "hop": hop_length,
              "n_octaves": n_octaves, "bins": bins_per_octave,
              "dilations": tuple(dilations), "kernel": kernel}
    return params, static


def _cqt_conv_pres(pres_params, z, n_oct, bins, kernel):
    """Apply the per-octave NormConv2d pre-convs (reference hifigan.py:738-748)
    as a single im2col + einsum. z: (B, 2, T, n_oct*bins) -> same shape."""
    b, c, t, _ = z.shape
    kh, kw = kernel
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    zb = z.reshape(b, c, t, n_oct, bins).transpose(0, 3, 1, 2, 4)
    zb = jnp.pad(zb, ((0, 0), (0, 0), (0, 0), (ph, ph), (pw, pw)))
    t_idx = np.arange(t)[:, None] + np.arange(kh)[None, :]        # (T, kh)
    w_idx = np.arange(bins)[:, None] + np.arange(kw)[None, :]     # (bins, kw)
    patches = zb[:, :, :, t_idx, :]            # (B, O, C, T, kh, bins+2pw)
    patches = patches[..., w_idx]              # (B, O, C, T, kh, bins, kw)
    patches = patches.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
        b, n_oct, t, bins, c * kh * kw)
    # weights: list of {w: (out=2, in=2, kh, kw), b: (2,)} per octave
    w = jnp.stack([pp["w"] for pp in pres_params])                # (O, 2, 2, kh, kw)
    w = w.reshape(n_oct, 2, -1).astype(z.dtype)                   # (O, out, C*kh*kw)
    bias = jnp.stack([pp["b"] for pp in pres_params]).astype(z.dtype)  # (O, 2)
    # accumulate in f32 even under bf16 discriminators (consistent with the
    # XLA convs in the rest of the stack); inputs staying bf16 keeps the MXU
    # speed win
    out = jnp.einsum("botwk,oek->beotw", patches, w,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32).astype(z.dtype)
    out = out + bias.T[None, :, :, None, None]   # (B, 2, O, T, bins)
    return out.transpose(0, 1, 3, 2, 4).reshape(b, 2, t, n_oct * bins)


def discriminator_cqt_forward(p, x, static, compute_dtype=None):
    from genvc_tpu.dsp import cqt as cqt_mod
    from genvc_tpu.dsp.resample import resample as jresample

    sr = static["sample_rate"]
    bins = static["bins"]
    n_oct = static["n_octaves"]
    kernel = static["kernel"]
    dilations = static["dilations"]

    xs = jresample(x[:, 0, :], sr, sr * 2)    # reference resamples ×2 first
    z = cqt_mod.cqt2010(xs, sr * 2, static["hop"], n_oct, bins)
    # (B, n_oct*bins, T, 2) -> amplitude/phase channel split like reference
    z = jnp.concatenate([z[..., 0][:, None], z[..., 1][:, None]], axis=1)
    # (B, 2, n_bins, T) -> (B, 2, T, n_bins)
    z = jnp.swapaxes(z, 2, 3)
    if compute_dtype is not None:   # CQT front-end stays f32 (shared DSP)
        z = z.astype(compute_dtype)
    # per-octave pre-convs as ONE im2col+matmul over all bands: 9 separate
    # width-24 conv2ds compile pathologically on the TPU backend (~7 min for
    # the forward alone); the batched matmul is equivalent and MXU-friendly
    z = _cqt_conv_pres(p["conv_pres"], z, n_oct, bins, kernel)
    fmap = []
    pads = [get_2d_padding(kernel)]
    strides = [(1, 1)]
    dils = [(1, 1)]
    for d in dilations:
        pads.append(get_2d_padding(kernel, (d, 1)))
        strides.append((1, 2))
        dils.append((d, 1))
    pads.append(get_2d_padding((kernel[0], kernel[0])))
    strides.append((1, 1))
    dils.append((1, 1))
    for conv, pad, st, dl in zip(p["convs"], pads, strides, dils):
        z = conv2d(conv, z, stride=st, padding=pad, dilation=dl)
        z = leaky_relu(z, LRELU_SLOPE)
        fmap.append(z)
    z = conv2d(p["conv_post"], z,
               padding=get_2d_padding((kernel[0], kernel[0])))
    return z.reshape(z.shape[0], -1), fmap


def init_mssbcqtd(key, cfg: VocoderConfig):
    keys = jax.random.split(key, len(cfg.mssbcqtd_hop_lengths))
    discs, statics = [], []
    for k, hop, n_oct, bins in zip(keys, cfg.mssbcqtd_hop_lengths,
                                   cfg.mssbcqtd_n_octavess,
                                   cfg.mssbcqtd_bins_per_octave):
        p, s = init_discriminator_cqt(
            k, cfg.mssbcqtd_filters, cfg.mssbcqtd_max_filters,
            cfg.mssbcqtd_filters_scale, cfg.mssbcqtd_dilations,
            cfg.mssbcqtd_in_channels, cfg.mssbcqtd_out_channels,
            cfg.sample_rate, hop, n_oct, bins)
        discs.append(p)
        statics.append(s)
    return {"discs": discs}, statics


def mssbcqtd_forward(p, statics, y, y_hat, compute_dtype=None):
    logits_r, logits_g, fmap_r, fmap_g = [], [], [], []
    for d, s in zip(p["discs"], statics):
        lr, fr = discriminator_cqt_forward(d, y, s, compute_dtype)
        lg, fg = discriminator_cqt_forward(d, y_hat, s, compute_dtype)
        logits_r.append(lr); fmap_r.append(fr)
        logits_g.append(lg); fmap_g.append(fg)
    return logits_r, logits_g, fmap_r, fmap_g
