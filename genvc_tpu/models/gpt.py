"""GPT-2 decoder backbone for content-tokens → audio-codes generation.

Architecture contract (reference: layers/gpt.py): an HF-`GPT2Model`-equivalent
block stack (pre-LN, gelu_new MLP, learned *per-modality* positional
embeddings, global wpe nulled — gpt.py:67-69), text/mel token embeddings and
heads, a shared ``final_norm``, and a Perceiver speaker conditioner. Default
GenVC dims: 30 layers, 1024 channels, 4 heads (train_genVC.py:53),
text vocab 258 (256 + start/stop), audio vocab 1026 (1024 + start/stop).

This implementation is a pure-functional pytree design with the layer stack
stored stacked (leading layer axis) and iterated with ``lax.scan`` — compile
time stays flat in depth and the stacked weights shard naturally under pjit.
Everything is static-shape: the token formatting rules of the reference
(gpt.py:404-474, the +3 code-length margin, stop-token padding, per-row length
masks) are reproduced with width-static tensors + length masks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.models import perceiver
from genvc_tpu.ops import nn


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    layers: int = 30
    model_dim: int = 1024
    heads: int = 4
    max_text_tokens: int = 402   # content positions before +2 (gpt.py:133)
    max_mel_tokens: int = 605    # audio positions before +2+1 (gpt.py:132)
    max_prompt_tokens: int = 70
    number_text_tokens: int = 258
    num_audio_tokens: int = 1026
    start_text_token: int = 256
    stop_text_token: int = 257
    start_audio_token: int = 1024
    stop_audio_token: int = 1025
    code_stride_len: int = 1024
    perceiver_cond_length_compression: int = 256
    label_smoothing: float = 0.0
    # decode-time switch (not an architecture field): route the cached
    # single-token attention through the Pallas fused kernel
    # (ops.decode_attention) — reads fp8/bf16 cache blocks without the
    # materialized upcast XLA emits. TPU backend only; engine falls back to
    # the XLA path elsewhere. Static so jit programs specialize correctly.
    fused_decode_attention: bool = False

    @property
    def max_gen_mel_tokens(self) -> int:
        return self.max_mel_tokens - 1 - 2  # gpt.py:131

    @property
    def mel_positions(self) -> int:
        return self.max_mel_tokens + 2 + 1  # gpt.py:132 (max_conditioning_inputs=1)

    @property
    def text_positions(self) -> int:
        return self.max_text_tokens + 2  # gpt.py:133

    @property
    def n_cond_latents(self) -> int:
        return perceiver.N_LATENTS


# ---------------------------------------------------------------------------
# Core transformer


def init_core(key, cfg: GPTConfig):
    d = cfg.model_dim

    def block(k):
        ks = jax.random.split(k, 4)
        return {
            "ln_1": nn.init_layer_norm(d),
            "attn": {
                "c_attn": nn.init_linear(ks[0], d, 3 * d, std=0.02),
                "c_proj": nn.init_linear(ks[1], d, d, std=0.02 / np.sqrt(2 * cfg.layers)),
            },
            "ln_2": nn.init_layer_norm(d),
            "mlp": {
                "c_fc": nn.init_linear(ks[2], d, 4 * d, std=0.02),
                "c_proj": nn.init_linear(ks[3], 4 * d, d, std=0.02 / np.sqrt(2 * cfg.layers)),
            },
        }

    keys = jax.random.split(key, cfg.layers)
    blocks = [block(k) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {"blocks": stacked, "ln_f": nn.init_layer_norm(d)}


def _block_forward(bp, h, bias, heads):
    x = nn.layer_norm(bp["ln_1"], h)
    qkv = nn.linear(bp["attn"]["c_attn"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = nn.split_heads(q, heads)
    k = nn.split_heads(k, heads)
    v = nn.split_heads(v, heads)
    a = nn.merge_heads(nn.attention(q, k, v, bias=bias))
    h = h + nn.linear(bp["attn"]["c_proj"], a)
    x = nn.layer_norm(bp["ln_2"], h)
    x = nn.linear(bp["mlp"]["c_fc"], x)
    x = nn.gelu_new(x)
    h = h + nn.linear(bp["mlp"]["c_proj"], x)
    return h


USE_FLASH_ATTENTION = "auto"  # "auto" = pallas kernel on TPU, jax path elsewhere


def _flash_enabled(attn_impl: str | None = None) -> bool:
    impl = USE_FLASH_ATTENTION if attn_impl in (None, "auto") else attn_impl
    if impl == "auto":
        return jax.default_backend() == "tpu"
    if impl in ("flash", "xla"):
        return impl == "flash"
    return bool(impl)


def core_forward(core, h: jnp.ndarray, cfg: GPTConfig,
                 key_valid: jnp.ndarray | None = None,
                 remat: bool | str = True, attn_impl: str | None = None
                 ) -> jnp.ndarray:
    """Full-sequence causal forward. h: (B, T, D); key_valid: (B, T) bool.

    ``remat=True`` checkpoints each block: backward recomputes activations
    layer by layer, trading FLOPs for HBM (free on forward-only paths since
    XLA drops the unused recompute). ``remat="dots"`` checkpoints with the
    ``dots_with_no_batch_dims_saveable`` policy: every MXU matmul output in
    the block (qkv, attn proj, both MLP linears) is SAVED and only the cheap
    elementwise/attention glue is recomputed — near-no-remat step time at a
    fraction of the activation memory (the policy stores ~9 D-widths per
    token vs ~18 for full no-remat, and drops the O(T^2) attention probs).

    ``attn_impl``: "flash" (Pallas kernel), "xla" (dense-bias path), or
    None/"auto" (the USE_FLASH_ATTENTION global: kernel on TPU). Measured on
    v5e: the kernel wins standalone at every T, but inside the remat+scan
    *training* step the dense path is ~7% faster end-to-end (the custom call
    constrains layout/fusion), so the GPT training stage passes "xla".
    """
    t = h.shape[1]
    if _flash_enabled(attn_impl):
        from genvc_tpu.ops.flash_attention import flash_attention

        kv = key_valid if key_valid is not None else jnp.ones(
            (h.shape[0], t), bool)

        def attend(q, k, v):
            return flash_attention(q, k, v, kv)

        block = lambda c, bp: _block_forward_attend(bp, c, attend, cfg.heads)
    else:
        bias = nn.causal_bias(t, jnp.float32)
        if key_valid is not None:
            bias = bias + nn.key_padding_bias(key_valid)
        block = lambda c, bp: _block_forward(bp, c, bias, cfg.heads)

    if remat == "dots":
        block = jax.checkpoint(
            block,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    elif remat:
        block = jax.checkpoint(block)

    def body(carry, bp):
        return block(carry, bp), None

    h, _ = jax.lax.scan(body, h, core["blocks"])
    return nn.layer_norm(core["ln_f"], h)


def _block_forward_attend(bp, h, attend, heads):
    x = nn.layer_norm(bp["ln_1"], h)
    qkv = nn.linear(bp["attn"]["c_attn"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    a = nn.merge_heads(attend(nn.split_heads(q, heads),
                              nn.split_heads(k, heads),
                              nn.split_heads(v, heads)))
    h = h + nn.linear(bp["attn"]["c_proj"], a)
    x = nn.layer_norm(bp["ln_2"], h)
    x = nn.linear(bp["mlp"]["c_fc"], x)
    x = nn.gelu_new(x)
    h = h + nn.linear(bp["mlp"]["c_proj"], x)
    return h


# ---------------------------------------------------------------------------
# Full model


def init_params(key, cfg: GPTConfig):
    keys = jax.random.split(key, 8)
    d = cfg.model_dim
    return {
        "text_embedding": nn.init_embedding(keys[0], cfg.number_text_tokens, d),
        "mel_embedding": nn.init_embedding(keys[1], cfg.num_audio_tokens, d),
        "text_pos": nn.init_embedding(keys[2], cfg.text_positions, d),
        "mel_pos": nn.init_embedding(keys[3], cfg.mel_positions, d),
        "core": init_core(keys[4], cfg),
        "final_norm": nn.init_layer_norm(d),
        "text_head": nn.init_linear(keys[5], d, cfg.number_text_tokens),
        "mel_head": nn.init_linear(keys[6], d, cfg.num_audio_tokens),
        "perceiver": perceiver.init_params(keys[7], dim=d),
    }


def get_style_emb(params, cond_mels: jnp.ndarray,
                  frame_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, 80, T) conditioning mel -> (B, 32, D) speaker latents
    (reference: gpt.py:351-373 + perceiver forward)."""
    return perceiver.forward(params["perceiver"], jnp.swapaxes(cond_mels, 1, 2),
                             frame_valid=frame_valid)


def _format_io(tokens, lengths, width, start_token, stop_token):
    """Reproduce set_*_padding + set_inputs_and_targets (gpt.py:232-260):
    positions >= length become stop_token; append stop column; prepend start.

    tokens: (B, W) int32; returns inputs (B, W+2), targets (B, W+2).
    """
    b, w = tokens.shape
    assert w == width
    pos = jnp.arange(w)[None, :]
    toks = jnp.where(pos < lengths[:, None], tokens, stop_token)
    inp = jnp.concatenate(
        [jnp.full((b, 1), start_token, toks.dtype), toks,
         jnp.full((b, 1), stop_token, toks.dtype)], axis=1)
    # targets shifted by one: tar[i] = inp[i+1], width w+2 like the reference's
    # pad-then-shift construction (stop appended twice at the end)
    tar = jnp.concatenate(
        [toks, jnp.full((b, 2), stop_token, toks.dtype)], axis=1)
    return inp, tar


def forward_train(
    params,
    cfg: GPTConfig,
    text_inputs: jnp.ndarray,    # (B, Wt) content codes, zero-padded
    text_lengths: jnp.ndarray,   # (B,)
    audio_codes: jnp.ndarray,    # (B, Wm) audio codes, zero-padded
    wav_lengths: jnp.ndarray,    # (B,) in samples
    cond_mels: jnp.ndarray | None = None,   # (B, 80, Tc)
    cond_lens: jnp.ndarray | None = None,   # (B,) in samples
    cond_latents: jnp.ndarray | None = None,  # (B, 32, D) precomputed
    return_latent: bool = False,
    fix_condition_embeddings: bool = False,
    train: bool = True,
    remat: bool = True,
    attn_impl: str | None = None,
):
    """Teacher-forced forward (reference: gpt.py:375-537).

    With ``return_latent=True`` returns the per-audio-position latents with the
    reference's trailing trim applied (-5 eval / -1 train, gpt.py:491-493):
    shape (B, Wm + 2 - trim, D). Otherwise returns
    (loss_text, loss_mel, top10_accuracy, mel_logits).
    """
    b, wt = text_inputs.shape
    wm = audio_codes.shape[1]

    code_lengths = jnp.ceil(wav_lengths / cfg.code_stride_len).astype(jnp.int32) + 3
    # reference pads audio_codes up to max(code_lengths); static width Wm must
    # already cover it (collate guarantees Wm >= ceil(wav/stride)+3).
    text_inp, text_tar = _format_io(text_inputs, text_lengths, wt,
                                    cfg.start_text_token, cfg.stop_text_token)
    mel_inp, mel_tar = _format_io(audio_codes, code_lengths - 3, wm,
                                  cfg.start_audio_token, cfg.stop_audio_token)

    text_emb = params["text_embedding"][text_inp] + params["text_pos"][None, : wt + 2]
    mel_emb = params["mel_embedding"][mel_inp] + params["mel_pos"][None, : wm + 2]

    if cond_latents is None:
        frame_valid = None
        if cond_lens is not None:
            n_frames = cond_mels.shape[-1]
            fl = cond_lens // cfg.perceiver_cond_length_compression
            frame_valid = jnp.arange(n_frames)[None, :] < fl[:, None]
        cond_latents = get_style_emb(params, cond_mels, frame_valid)
        if fix_condition_embeddings:
            cond_latents = jax.lax.stop_gradient(cond_latents)

    n_cond = cond_latents.shape[1]
    emb = jnp.concatenate([cond_latents.astype(text_emb.dtype), text_emb, mel_emb], axis=1)

    if return_latent:
        # The reference passes attn_mask=None here, but its tensor widths are
        # exact (batch-max / generation length). Under our static bucketed
        # widths we mask only the columns that would not exist in the
        # reference's tensors: text cols > l+1, mel cols > code_len+1.
        # When the static width equals the reference width this mask is
        # all-ones, i.e. numerics are identical.
        tpos = jnp.arange(wt + 2)[None, :]
        mpos = jnp.arange(wm + 2)[None, :]
        key_valid = jnp.concatenate(
            [jnp.ones((b, n_cond), bool),
             tpos <= text_lengths[:, None] + 1,
             mpos <= code_lengths[:, None] + 1], axis=1)
    else:
        # attn_mask_text[l+1:]=0, attn_mask_mel[l+1:]=0 (gpt.py:470-474)
        tpos = jnp.arange(wt + 2)[None, :]
        mpos = jnp.arange(wm + 2)[None, :]
        text_valid = tpos <= text_lengths[:, None]
        mel_valid = mpos <= code_lengths[:, None]
        key_valid = jnp.concatenate(
            [jnp.ones((b, n_cond), bool), text_valid, mel_valid], axis=1)

    h = core_forward(params["core"], emb, cfg, key_valid=key_valid,
                     remat=remat, attn_impl=attn_impl)
    enc = nn.layer_norm(params["final_norm"], h[:, n_cond:])

    if return_latent:
        sub = 1 if train else 5  # gpt.py:491-493
        mel_latent = enc[:, -(wm + 2):]
        return mel_latent[:, :-sub]

    text_logits = nn.linear(params["text_head"], enc[:, : wt + 2])
    mel_logits = nn.linear(params["mel_head"], enc[:, -(wm + 2):])

    # loss masks: targets at positions > length are ignored (gpt.py:514-518)
    tpos = jnp.arange(wt + 2)[None, :]
    mpos = jnp.arange(wm + 2)[None, :]
    text_keep = tpos <= text_lengths[:, None]
    mel_keep = mpos <= code_lengths[:, None]

    loss_text = _masked_ce(text_logits, text_tar, text_keep, cfg.label_smoothing)
    loss_mel = _masked_ce(mel_logits, mel_tar, mel_keep, cfg.label_smoothing)
    top10 = _topk_accuracy(mel_logits, mel_tar, mel_keep, k=10)
    return loss_text, loss_mel, top10, mel_logits


def _masked_ce(logits, targets, keep, label_smoothing=0.0):
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    n_class = logits.shape[-1]
    tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = jnp.mean(logp, axis=-1)
        nll = -(1.0 - label_smoothing) * tgt_logp - label_smoothing * smooth
    else:
        nll = -tgt_logp
    keep = keep.astype(jnp.float32)
    return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def _topk_accuracy(logits, targets, keep, k=10):
    """Micro top-k accuracy over kept targets (torchmetrics semantics,
    gpt.py:166-172)."""
    tgt_logit = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    rank = jnp.sum((logits > tgt_logit[..., None]).astype(jnp.int32), axis=-1)
    hit = (rank < k).astype(jnp.float32)
    keep = keep.astype(jnp.float32)
    return jnp.sum(hit * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def build_prefix_emb(params, cfg: GPTConfig, cond_latents: jnp.ndarray,
                     text_tokens: jnp.ndarray, text_length: jnp.ndarray):
    """Inference prefix (reference compute_embeddings, gpt.py:572-592):
    [cond(32) | start_text + text + stop_text] with static text width.

    text_tokens: (B, Wt) zero-padded; text_length: (B,). Returns
    (prefix_emb (B, 32+Wt+2, D), prefix_valid (B, 32+Wt+2) bool). Positions
    beyond the per-row stop token are masked invalid so padded rows reproduce
    the exact-length reference numerics.
    """
    b, wt = text_tokens.shape
    pos = jnp.arange(wt)[None, :]
    toks = jnp.where(pos < text_length[:, None], text_tokens, cfg.stop_text_token)
    inp = jnp.concatenate(
        [jnp.full((b, 1), cfg.start_text_token, toks.dtype), toks,
         jnp.full((b, 1), cfg.stop_text_token, toks.dtype)], axis=1)
    # per-row positional indices: padded rows still use contiguous positions for
    # the real tokens; the final stop token of a row of length L sits at column
    # L+1 but the reference places it at position L+1 as well only when W==L.
    # For W>L the real stop is the one at column L+1 (value stop) — columns
    # beyond L+1 are masked out, so we can use column-index positions directly.
    emb = params["text_embedding"][inp] + params["text_pos"][None, : wt + 2]
    prefix = jnp.concatenate([cond_latents.astype(emb.dtype), emb], axis=1)
    n_cond = cond_latents.shape[1]
    col = jnp.arange(wt + 2)[None, :]
    text_valid = col <= (text_length[:, None] + 1)
    valid = jnp.concatenate([jnp.ones((b, n_cond), bool), text_valid], axis=1)
    return prefix, valid
