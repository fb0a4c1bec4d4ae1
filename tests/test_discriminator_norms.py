"""MSD/MPD norm-parametrization parity vs torch.

The reference wraps every MSD/MPD conv in torch ``weight_norm`` and the first
MSD scale entirely in ``spectral_norm`` (layers/hifigan.py:286-288, 321,
248-252). These discriminators train from scratch, so gradient parity through
the reparametrization (and the spectral power-iteration buffer updates) is
the correctness surface — checked here against inline torch replicas built
with ``torch.nn.utils.weight_norm`` / ``spectral_norm``.

Also pins the per-stage optimizer recipes numerically against torch
(vocoder AdamW: wd=0.01 torch default, hifigan_trainer.py:559-569).
"""

import numpy as np
import pytest
import torch
from torch import nn
from torch.nn.utils import spectral_norm, weight_norm

import jax
import jax.numpy as jnp

from genvc_tpu.models import hifigan
from genvc_tpu.train import optim


def _t2j(t):
    # jnp.array (copy) — NOT asarray: CPU jax zero-copies numpy views, and
    # torch's spectral-norm hook updates the u/v buffers IN PLACE on forward,
    # which would silently mutate the captured jax params
    return jnp.array(t.detach().numpy())


class TorchDiscS(nn.Module):
    """Reference DiscriminatorS (layers/hifigan.py:248-279)."""

    def __init__(self, use_spectral_norm=False):
        super().__init__()
        norm_f = weight_norm if use_spectral_norm is False else spectral_norm
        self.convs = nn.ModuleList([
            norm_f(nn.Conv1d(1, 128, 15, 1, padding=7)),
            norm_f(nn.Conv1d(128, 128, 41, 2, groups=4, padding=20)),
            norm_f(nn.Conv1d(128, 256, 41, 2, groups=16, padding=20)),
            norm_f(nn.Conv1d(256, 512, 41, 4, groups=16, padding=20)),
            norm_f(nn.Conv1d(512, 1024, 41, 4, groups=16, padding=20)),
            norm_f(nn.Conv1d(1024, 1024, 41, 1, groups=16, padding=20)),
            norm_f(nn.Conv1d(1024, 1024, 5, 1, padding=2)),
        ])
        self.conv_post = norm_f(nn.Conv1d(1024, 1, 3, 1, padding=1))

    def forward(self, x):
        fmap = []
        for l in self.convs:
            x = torch.nn.functional.leaky_relu(l(x), 0.1)
            fmap.append(x)
        x = self.conv_post(x)
        fmap.append(x)
        return torch.flatten(x, 1, -1), fmap


class TorchDiscP(nn.Module):
    """Reference DiscriminatorP (layers/hifigan.py:316-395), d_mult=1."""

    def __init__(self, period, use_spectral_norm=False):
        super().__init__()
        self.period = period
        norm_f = weight_norm if use_spectral_norm is False else spectral_norm
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
        self.convs = nn.ModuleList([
            norm_f(nn.Conv2d(i, o, (5, 1), (3, 1), padding=(2, 0)))
            for (i, o) in chans])
        self.conv_post = norm_f(nn.Conv2d(1024, 1, (3, 1), 1, padding=(1, 0)))

    def forward(self, x):
        fmap = []
        b, c, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = torch.nn.functional.pad(x, (0, n_pad), "reflect")
            t = t + n_pad
        x = x.view(b, c, t // self.period, self.period)
        for l in self.convs:
            x = torch.nn.functional.leaky_relu(l(x), 0.1)
            fmap.append(x)
        x = self.conv_post(x)
        fmap.append(x)
        return torch.flatten(x, 1, -1), fmap


def _torch_conv_to_jax(mod):
    """Map one torch weight_norm/spectral_norm conv module to the repo's
    param-dict form."""
    sd = {k: v.detach() for k, v in mod.state_dict().items()}
    if "weight_orig" in sd:  # spectral_norm
        return {"w_orig": _t2j(sd["weight_orig"]),
                "u": _t2j(sd["weight_u"]),
                "pv": _t2j(sd["weight_v"]),
                "b": _t2j(sd["bias"])}
    return {"g": _t2j(sd["weight_g"]), "v": _t2j(sd["weight_v"]),
            "b": _t2j(sd["bias"])}


def _loss_terms(logits, fmap):
    """Shared scalar loss exercising both heads: LSGAN-ish on logits plus a
    feature-map term so every layer's activation carries gradient."""
    ltot = ((logits - 1.0) ** 2).mean()
    for f in fmap:
        ltot = ltot + abs(f).mean()
    return ltot


def _grad_cmp(tg, jg, name, rtol=3e-4, atol=3e-6):
    tg = tg.detach().numpy()
    jg = np.asarray(jg)
    np.testing.assert_allclose(jg, tg, rtol=rtol, atol=atol, err_msg=name)


@pytest.mark.parametrize("use_sn", [True, False])
def test_discriminator_s_grad_parity(use_sn):
    torch.manual_seed(3)
    tm = TorchDiscS(use_spectral_norm=use_sn)
    tm.train()
    jp = {"convs": [_torch_conv_to_jax(c) for c in tm.convs],
          "conv_post": _torch_conv_to_jax(tm.conv_post)}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 256)).astype(np.float32) * 0.3

    # torch: train-mode forward (spectral norm power-iterates once per call)
    xt = torch.tensor(x, requires_grad=False)
    logits_t, fmap_t = tm(xt)
    loss_t = _loss_terms(logits_t, fmap_t)
    loss_t.backward()

    def loss_j(p):
        logits, fmap, new_p = hifigan.discriminator_s_forward(
            p, jnp.asarray(x), sn_update=True)
        return _loss_terms(logits, fmap), new_p

    (loss_j_val, new_p), grads = jax.value_and_grad(loss_j, has_aux=True)(jp)
    assert float(loss_j_val) == pytest.approx(float(loss_t), rel=1e-5)

    for i, c in enumerate(tm.convs):
        if use_sn:
            _grad_cmp(c.weight_orig.grad, grads["convs"][i]["w_orig"],
                      f"conv{i}.w_orig")
            # power-iteration buffers advanced identically
            np.testing.assert_allclose(
                np.asarray(new_p["convs"][i]["u"]),
                c.weight_u.detach().numpy(), rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(
                np.asarray(new_p["convs"][i]["pv"]),
                c.weight_v.detach().numpy(), rtol=1e-5, atol=1e-7)
        else:
            _grad_cmp(c.weight_g.grad, grads["convs"][i]["g"], f"conv{i}.g")
            _grad_cmp(c.weight_v.grad, grads["convs"][i]["v"], f"conv{i}.v")
        _grad_cmp(c.bias.grad, grads["convs"][i]["b"], f"conv{i}.b")
    if use_sn:
        _grad_cmp(tm.conv_post.weight_orig.grad,
                  grads["conv_post"]["w_orig"], "post.w_orig")
    else:
        _grad_cmp(tm.conv_post.weight_g.grad, grads["conv_post"]["g"],
                  "post.g")
        _grad_cmp(tm.conv_post.weight_v.grad, grads["conv_post"]["v"],
                  "post.v")


@pytest.mark.parametrize("use_sn", [False, True])
def test_discriminator_p_grad_parity(use_sn):
    torch.manual_seed(5)
    period = 3
    tm = TorchDiscP(period, use_spectral_norm=use_sn)
    tm.train()
    jp = {"convs": [_torch_conv_to_jax(c) for c in tm.convs],
          "conv_post": _torch_conv_to_jax(tm.conv_post)}

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 1, 91)).astype(np.float32) * 0.3

    logits_t, fmap_t = tm(torch.tensor(x))
    loss_t = _loss_terms(logits_t, fmap_t)
    loss_t.backward()

    def loss_j(p):
        logits, fmap, new_p = hifigan.discriminator_p_forward(
            p, jnp.asarray(x), period, sn_update=True)
        return _loss_terms(logits, fmap), new_p

    (loss_j_val, new_p), grads = jax.value_and_grad(loss_j, has_aux=True)(jp)
    assert float(loss_j_val) == pytest.approx(float(loss_t), rel=1e-5)

    for i, c in enumerate(tm.convs):
        if use_sn:
            _grad_cmp(c.weight_orig.grad, grads["convs"][i]["w_orig"],
                      f"conv{i}.w_orig")
            np.testing.assert_allclose(
                np.asarray(new_p["convs"][i]["u"]),
                c.weight_u.detach().numpy(), rtol=1e-5, atol=1e-7)
        else:
            _grad_cmp(c.weight_g.grad, grads["convs"][i]["g"], f"conv{i}.g")
            _grad_cmp(c.weight_v.grad, grads["convs"][i]["v"], f"conv{i}.v")
        _grad_cmp(c.bias.grad, grads["convs"][i]["b"], f"conv{i}.b")


def test_msd_init_parametrization():
    """Scale 0 spectral-normed, scales 1-2 weight-normed, like the reference
    MultiScaleDiscriminator (hifigan.py:286-288)."""
    msd = hifigan.init_msd(jax.random.key(0))
    for conv in msd["discs"][0]["convs"] + [msd["discs"][0]["conv_post"]]:
        assert set(conv) == {"w_orig", "u", "pv", "b"}
        # buffers init'd normalized like torch
        assert float(jnp.linalg.norm(conv["u"])) == pytest.approx(1.0, rel=1e-5)
    for d in msd["discs"][1:]:
        for conv in d["convs"] + [d["conv_post"]]:
            assert set(conv) == {"g", "v", "b"}


def test_mpd_spectral_flag_honored():
    """mpd_use_spectral_norm now changes the parametrization (round-2 weak
    finding: flag was accepted and ignored)."""
    wn = hifigan.init_mpd(jax.random.key(0), periods=(2, 3))
    assert set(wn["discs"][0]["convs"][0]) == {"g", "v", "b"}
    sn = hifigan.init_mpd(jax.random.key(0), periods=(2, 3),
                          use_spectral_norm=True)
    assert set(sn["discs"][0]["convs"][0]) == {"w_orig", "u", "pv", "b"}
    y = jnp.zeros((1, 1, 64))
    out = hifigan.mpd_forward(sn, y, y, periods=(2, 3))
    assert len(out[0]) == 2


def test_merge_sn_buffers_only_touches_buffers():
    msd = hifigan.init_msd(jax.random.key(0))
    bumped = jax.tree.map(lambda a: a + 1.0, msd)
    merged = hifigan.merge_sn_buffers(msd, bumped)
    c0 = merged["discs"][0]["convs"][0]
    np.testing.assert_allclose(np.asarray(c0["u"]),
                               np.asarray(msd["discs"][0]["convs"][0]["u"]) + 1)
    np.testing.assert_allclose(np.asarray(c0["w_orig"]),
                               np.asarray(msd["discs"][0]["convs"][0]["w_orig"]))
    c1 = merged["discs"][1]["convs"][0]
    np.testing.assert_allclose(np.asarray(c1["g"]),
                               np.asarray(msd["discs"][1]["convs"][0]["g"]))


# ---------------------------------------------------------------------------
# Optimizer recipe pinning (VERDICT r2 item 2)


def _run_optax(tx, w0, grads_seq):
    p = {"w": jnp.asarray(w0)}
    st = tx.init(p)
    for g in grads_seq:
        up, st = tx.update({"w": jnp.asarray(g)}, st, p)
        import optax
        p = optax.apply_updates(p, up)
    return np.asarray(p["w"])


def _run_torch(opt_ctor, w0, grads_seq):
    p = torch.nn.Parameter(torch.tensor(w0))
    opt = opt_ctor([p])
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    return p.detach().numpy()


def test_vocoder_adamw_matches_torch_default_wd():
    """AdamW(params, lr, betas) in the reference leaves torch's default
    weight_decay=0.01 in force; our vocoder optimizer must match it."""
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(4)]
    got = _run_optax(optim.vocoder_adamw(2e-4, betas=(0.8, 0.99)), w0, grads)
    want = _run_torch(
        lambda ps: torch.optim.AdamW(ps, lr=2e-4, betas=(0.8, 0.99)),
        w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
    # and it must NOT match wd=0 (the round-2 bug)
    wrong = _run_torch(
        lambda ps: torch.optim.AdamW(ps, lr=2e-4, betas=(0.8, 0.99),
                                     weight_decay=0.0), w0, grads)
    assert np.abs(got - wrong).max() > 1e-7


def test_gpt_adamw_recipe_matches_torch():
    """GPT stage: AdamW lr=1e-4 betas=(0.9,0.96) eps=1e-8 wd=1e-6 with
    grad-clip 1.0 (train_genVC.py:53-55, gpt_trainer.py:389-451)."""
    rng = np.random.default_rng(1)
    w0 = rng.standard_normal((5,)).astype(np.float32)
    grads = [(rng.standard_normal((5,)) * 3).astype(np.float32)
             for _ in range(3)]
    tx = optim.adamw_grouped(1e-4, betas=(0.9, 0.96), eps=1e-8,
                             weight_decay=1e-6, max_grad_norm=1.0)
    got = _run_optax(tx, w0, grads)

    p = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.AdamW([p], lr=1e-4, betas=(0.9, 0.96), eps=1e-8,
                            weight_decay=1e-6)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([p], 1.0)
        opt.step()
    np.testing.assert_allclose(got, p.detach().numpy(), rtol=1e-6, atol=1e-8)


def test_vae_adam_recipe_matches_torch():
    """dVAE stage: Adam betas=(0.5, 0.9) lr=1e-4, grad clip 0.5
    (train_audio_dvae.py:15-26, VAE_trainer.py:98-116)."""
    from genvc_tpu.config import VAEConfig
    from genvc_tpu.train import vae_stage

    cfg = VAEConfig(lr=1e-4, opt_betas=[0.5, 0.9], grad_clip_norm=0.5)
    rng = np.random.default_rng(2)
    w0 = rng.standard_normal((6,)).astype(np.float32)
    grads = [(rng.standard_normal((6,)) * 4).astype(np.float32)
             for _ in range(3)]
    got = _run_optax(vae_stage.make_optimizer(cfg), w0, grads)

    p = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([p], lr=1e-4, betas=(0.5, 0.9))
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([p], 0.5)
        opt.step()
    np.testing.assert_allclose(got, p.detach().numpy(), rtol=1e-6, atol=1e-8)
