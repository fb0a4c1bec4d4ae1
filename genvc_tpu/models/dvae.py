"""Discrete VAE tokenizer (mel → audio codes, ContentVec features → text codes).

Behavioral contract (reference: layers/dvae.py with the shipped config
``use_transposed_convs=False, num_layers=2, hidden_dim=512,
num_resnet_blocks=3, kernel_size=3, codebook_dim=512``):

encoder  conv(C→512,k3,s2,p1)+relu → conv(512→1024,k3,s2,p1)+relu →
         3×ResBlock(1024) → conv(1024→512,k1)            [4× downsample]
decoder  conv(512→1024,k1) → 3×ResBlock(1024) →
         2×[nearest×2 + conv(k3,p1) + relu] → conv(→C,k1)
VQ       EMA codebook (decay .99, eps 1e-5), straight-through, commitment MSE;
         cluster statistics all-reduced across data shards (dvae.py:108-110 →
         here ``jax.lax.psum`` when an axis name is given).

TPU design: explicit codebook state pytree (embed / cluster_size / embed_avg)
threaded through the jitted train step; ``encode``/``get_codebook_indices``
are pure functions; optional valid-length masking reproduces exact-length
reference numerics under static padded widths (inference path).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.ops.conv import conv1d, nearest_upsample1d, init_conv1d

_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class DVAEConfig:
    channels: int = 80
    num_tokens: int = 1024
    codebook_dim: int = 512
    hidden_dim: int = 512
    num_resnet_blocks: int = 3
    kernel_size: int = 3
    num_layers: int = 2
    decay: float = 0.99
    eps: float = 1e-5

    @property
    def compression(self) -> int:
        return 2 ** self.num_layers


def init_params(key, cfg: DVAEConfig):
    ks = iter(jax.random.split(key, 64))
    h = cfg.hidden_dim
    enc_chans = [h * 2 ** i for i in range(cfg.num_layers)]
    inner = enc_chans[-1]

    def resblock(c):
        return {
            "conv1": init_conv1d(next(ks), c, c, 3),
            "conv2": init_conv1d(next(ks), c, c, 3),
            "conv3": init_conv1d(next(ks), c, c, 1),
        }

    chans = [cfg.channels] + enc_chans
    enc = {
        "convs": [init_conv1d(next(ks), chans[i + 1], chans[i], cfg.kernel_size)
                  for i in range(cfg.num_layers)],
        "resblocks": [resblock(inner) for _ in range(cfg.num_resnet_blocks)],
        "out": init_conv1d(next(ks), cfg.codebook_dim, inner, 1),
    }
    dec_chans = list(reversed(enc_chans))  # e.g. [1024, 512]
    dec_io = [(([inner] + dec_chans)[i], ([inner] + dec_chans)[i + 1])
              for i in range(cfg.num_layers)]
    dec = {
        "inp": init_conv1d(next(ks), inner, cfg.codebook_dim, 1),
        "resblocks": [resblock(inner) for _ in range(cfg.num_resnet_blocks)],
        "ups": [init_conv1d(next(ks), o, i, cfg.kernel_size) for i, o in dec_io],
        "out": init_conv1d(next(ks), cfg.channels, dec_chans[-1], 1),
    }
    embed = jax.random.normal(next(ks), (cfg.codebook_dim, cfg.num_tokens),
                              jnp.float32)
    return {
        "encoder": enc,
        "decoder": dec,
        "codebook": {
            "embed": embed,
            "cluster_size": jnp.zeros((cfg.num_tokens,), jnp.float32),
            "embed_avg": embed.copy(),
        },
    }


def _resblock(p, x, pad):
    y = conv1d(p["conv1"], x, padding=pad)
    y = jax.nn.relu(y)
    y = conv1d(p["conv2"], y, padding=pad)
    y = jax.nn.relu(y)
    y = conv1d(p["conv3"], y)
    return y + x


def _mask_t(x, valid_len):
    if valid_len is None:
        return x
    t = x.shape[-1]
    m = jnp.arange(t)[None, None, :] < valid_len[:, None, None]
    return x * m


def encode(params, x: jnp.ndarray, cfg: DVAEConfig,
           valid_len: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, C, T) features -> (B, D, T/4) pre-quantization logits.

    ``valid_len`` (B,) masks padding so outputs at valid positions equal an
    exact-length run (each conv sees zeros beyond the true length, which is
    exactly what zero-padding 'SAME' conv produces at a true boundary).
    """
    pad = (cfg.kernel_size - 1) // 2
    for conv in params["encoder"]["convs"]:
        x = _mask_t(x, valid_len)
        x = conv1d(conv, x, stride=2, padding=pad)
        x = jax.nn.relu(x)
        if valid_len is not None:
            valid_len = (valid_len - 1) // 2 + 1
    for rb in params["encoder"]["resblocks"]:
        x = _mask_t(x, valid_len)
        x = _resblock(rb, x, 1)
    x = _mask_t(x, valid_len)
    return conv1d(params["encoder"]["out"], x)


def nearest_codes(codebook, z: jnp.ndarray) -> jnp.ndarray:
    """z: (B, T, D) -> (B, T) int32 nearest-codebook indices
    (reference Quantize distance + first-max tie-break, dvae.py:87-92)."""
    embed = codebook["embed"].astype(jnp.float32)  # (D, N)
    zf = z.astype(jnp.float32)
    dist = (jnp.sum(zf * zf, axis=-1, keepdims=True)
            - 2.0 * jnp.einsum("btd,dn->btn", zf, embed, precision=_PREC)
            + jnp.sum(embed * embed, axis=0)[None, None, :])
    return jnp.argmax(-dist, axis=-1).astype(jnp.int32)


def get_codebook_indices(params, x: jnp.ndarray, cfg: DVAEConfig,
                         valid_len: jnp.ndarray | None = None) -> jnp.ndarray:
    """Frozen tokenize API (reference dvae.py:324-331): features -> codes."""
    z = encode(params, x, cfg, valid_len)
    return nearest_codes(params["codebook"], jnp.swapaxes(z, 1, 2))


def embed_codes(codebook, codes: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, T, D)."""
    return jnp.swapaxes(codebook["embed"], 0, 1)[codes]


def decode(params, codes: jnp.ndarray, cfg: DVAEConfig) -> jnp.ndarray:
    """codes (B, T) -> (B, C, 4T) reconstruction (reference dvae.py:333-352)."""
    x = jnp.swapaxes(embed_codes(params["codebook"], codes), 1, 2)
    return _decoder_forward(params, x, cfg)


def _decoder_forward(params, x, cfg: DVAEConfig):
    pad = (cfg.kernel_size - 1) // 2
    x = conv1d(params["decoder"]["inp"], x)
    for rb in params["decoder"]["resblocks"]:
        x = _resblock(rb, x, 1)
    for up in params["decoder"]["ups"]:
        x = nearest_upsample1d(x, 2)
        x = conv1d(up, x, padding=pad)
        x = jax.nn.relu(x)
    return conv1d(params["decoder"]["out"], x)


def forward_train(params, x: jnp.ndarray, cfg: DVAEConfig,
                  axis_name: str | None = None):
    """Training forward (reference dvae.py:363-381 in train mode).

    Returns (recon_loss, commitment_loss, recon, new_codebook, codes).
    The EMA codebook update is returned as new state (functional) with the
    cluster statistics ``psum``-reduced over ``axis_name`` when given —
    the TPU equivalent of the reference's ``distributed.all_reduce``.
    """
    z = encode(params, x, cfg)  # (B, D, T/4)
    z_btd = jnp.swapaxes(z, 1, 2)
    codes = nearest_codes(params["codebook"], z_btd)
    cb = params["codebook"]
    quant = embed_codes(cb, codes)

    # EMA statistics
    n_embed = cb["embed"].shape[1]
    flat = z_btd.reshape(-1, z_btd.shape[-1]).astype(jnp.float32)
    onehot = jax.nn.one_hot(codes.reshape(-1), n_embed, dtype=jnp.float32)
    onehot_sum = jnp.sum(onehot, axis=0)
    embed_sum = jnp.einsum("nd,nk->dk", flat, onehot, precision=_PREC)
    if axis_name is not None:
        onehot_sum = jax.lax.psum(onehot_sum, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)
    decay = cfg.decay
    cluster_size = cb["cluster_size"] * decay + onehot_sum * (1 - decay)
    embed_avg = cb["embed_avg"] * decay + embed_sum * (1 - decay)
    n = jnp.sum(cluster_size)
    cluster = (cluster_size + cfg.eps) / (n + n_embed * cfg.eps) * n
    new_embed = embed_avg / cluster[None, :]
    new_codebook = {"embed": new_embed, "cluster_size": cluster_size,
                    "embed_avg": embed_avg}

    commitment = jnp.mean(jnp.square(jax.lax.stop_gradient(quant) - z_btd))
    # straight-through
    quant_st = z_btd + jax.lax.stop_gradient(quant - z_btd)
    recon = _decoder_forward(params, jnp.swapaxes(quant_st, 1, 2), cfg)
    recon_loss = jnp.mean(jnp.square(x - recon))
    return recon_loss, commitment, recon, new_codebook, codes
