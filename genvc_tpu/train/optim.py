"""Optimizers + schedules matching the reference training recipes.

* AdamW with weight-decay-only-on-weights grouping (reference:
  trainers/gpt_trainer.py:389-451 — biases, norm params, and embeddings are
  excluded; note the reference's rule treats perceiver latents and RMSNorm
  gamma as 'weights' because they are raw ``nn.Parameter``s, reproduced here).
* MultiStepLR (milestones × gamma) and ExponentialLR schedules.
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax


_NO_DECAY_TOP = {"text_embedding", "mel_embedding", "text_pos", "mel_pos"}
_LN_KEYS = {"scale", "bias"}


def weight_decay_mask(params) -> dict:
    """True = apply weight decay. Torch rule: decay everything except biases,
    LayerNorm scale/bias, and embedding tables."""

    def rec(tree, path):
        if isinstance(tree, dict):
            return {k: rec(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            out = [rec(v, path + (str(i),)) for i, v in enumerate(tree)]
            return type(tree)(out) if isinstance(tree, tuple) else out
        key = path[-1] if path else ""
        if key in ("b", "bias"):
            return False
        if key == "scale":  # LayerNorm scale (always paired with 'bias')
            return False
        if any(p in _NO_DECAY_TOP for p in path):
            return False
        return True

    return rec(params, ())


def multistep_schedule(base_lr: float, milestones_steps: Sequence[int],
                       gamma: float):
    """MultiStepLR: lr * gamma^(number of passed milestones)."""
    boundaries = {int(m): gamma for m in milestones_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def exponential_epoch_schedule(base_lr: float, gamma: float,
                               steps_per_epoch: int):
    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * gamma ** epoch
    return sched


def adamw_grouped(lr_schedule, betas=(0.9, 0.96), eps=1e-8,
                  weight_decay=1e-6, max_grad_norm: float | None = 1.0,
                  params=None):
    tx = []
    if max_grad_norm is not None and max_grad_norm > 0:
        tx.append(optax.clip_by_global_norm(max_grad_norm))
    mask = weight_decay_mask(params) if params is not None else None
    tx.append(optax.adamw(lr_schedule, b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=weight_decay, mask=mask))
    return optax.chain(*tx)


def adam_simple(lr: float, betas=(0.9, 0.997)):
    return optax.adam(lr, b1=betas[0], b2=betas[1])


def vocoder_adamw(lr_schedule, betas=(0.8, 0.99)):
    """The vocoder-stage optimizer for BOTH the discriminator and generator:
    the reference builds ``AdamW(params, lr, betas)`` with no weight_decay or
    eps argument (trainers/hifigan_trainer.py:559-569), so torch defaults
    apply — decoupled weight decay 0.01 on every parameter, eps 1e-8."""
    return optax.adamw(lr_schedule, b1=betas[0], b2=betas[1], eps=1e-8,
                       weight_decay=0.01)
