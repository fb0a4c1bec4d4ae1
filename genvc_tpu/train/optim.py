"""Optimizers + schedules matching the reference training recipes.

* AdamW with weight-decay-only-on-weights grouping (reference:
  trainers/gpt_trainer.py:389-451 — biases, norm params, and embeddings are
  excluded; note the reference's rule treats perceiver latents and RMSNorm
  gamma as 'weights' because they are raw ``nn.Parameter``s, reproduced here).
* MultiStepLR (milestones × gamma) and ExponentialLR schedules.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
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


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def adamw_clip_fused(lr_schedule, betas=(0.9, 0.96), eps=1e-8,
                     weight_decay=1e-6, max_grad_norm: float | None = 1.0,
                     params=None):
    """Numerically equivalent to :func:`adamw_grouped` (the
    ``optax.chain(clip_by_global_norm, adamw)`` recipe) in ONE tree
    traversal: the clip scale folds into the Adam moment update instead of
    materializing a scaled-gradient tree between two chained transforms.
    The optimizer update is pure HBM-bandwidth work (read g/mu/nu/p, write
    p/mu/nu ≈ 10.5 GB at the 30L flagship), so the chained version's extra
    clipped-grad write+read (~3 GB) is measurable step time
    (VERDICT r4 item 6). Equivalence is asserted in
    tests/test_train.py::test_adamw_clip_fused_matches_chain.

    The state is (count, mu, nu) — flatter than optax's nested chain state;
    use one or the other consistently within a training run (checkpointed
    opt_states are not interchangeable between the two)."""
    mask_tree = weight_decay_mask(params) if params is not None else None
    b1, b2 = betas
    clip = max_grad_norm is not None and max_grad_norm > 0

    def init(params):
        return FusedAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamw_clip_fused needs params (weight decay)")
        if clip:
            g_norm = optax.global_norm(grads)
            trigger = g_norm < max_grad_norm
        count_inc = optax.safe_int32_increment(state.count)
        lr = lr_schedule(state.count)  # optax scale_by_schedule: pre-increment
        cf = count_inc.astype(jnp.float32)
        bc1 = 1.0 - b1 ** cf
        bc2 = 1.0 - b2 ** cf

        def leaf(g, m, v, p, decay):
            if clip:
                # exactly optax.clip_by_global_norm's clip_fn, fused in
                g = jax.lax.select(trigger, g,
                                   (g / g_norm.astype(g.dtype)) * max_grad_norm)
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * (g * g)
            u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            if decay:
                u = u + weight_decay * p
            return -lr * u, m2, v2

        flat_g, treedef = jax.tree.flatten(grads)
        flat_m = jax.tree.leaves(state.mu)
        flat_v = jax.tree.leaves(state.nu)
        flat_p = jax.tree.leaves(params)
        flat_mask = (jax.tree.leaves(mask_tree) if mask_tree is not None
                     else [True] * len(flat_g))
        out = [leaf(g, m, v, p, d) for g, m, v, p, d in
               zip(flat_g, flat_m, flat_v, flat_p, flat_mask)]
        updates = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return updates, FusedAdamWState(count=count_inc, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def adam_simple(lr: float, betas=(0.9, 0.997)):
    return optax.adam(lr, b1=betas[0], b2=betas[1])


def vocoder_adamw(lr_schedule, betas=(0.8, 0.99)):
    """The vocoder-stage optimizer for BOTH the discriminator and generator:
    the reference builds ``AdamW(params, lr, betas)`` with no weight_decay or
    eps argument (trainers/hifigan_trainer.py:559-569), so torch defaults
    apply — decoupled weight decay 0.01 on every parameter, eps 1e-8."""
    return optax.adamw(lr_schedule, b1=betas[0], b2=betas[1], eps=1e-8,
                       weight_decay=0.01)
