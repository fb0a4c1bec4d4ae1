"""Checkpoint/config round-trip tests."""

import numpy as np

from genvc_tpu import checkpoint
from genvc_tpu.config import GenVCConfig


def test_npz_pytree_roundtrip(tmp_path):
    tree = {
        "a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
              "b": np.zeros(3, np.float32)},
        "list": [{"x": np.ones(2, np.float32)}, {"x": np.zeros(2, np.float32)}],
        "scalararr": np.float32(2.5) * np.ones((1,), np.float32),
    }
    path = str(tmp_path / "t.npz")
    checkpoint.save_pytree_npz(path, tree)
    back = checkpoint.load_pytree_npz(path)
    assert isinstance(back["list"], list) and len(back["list"]) == 2
    np.testing.assert_array_equal(back["a"]["w"], tree["a"]["w"])
    np.testing.assert_array_equal(back["list"][1]["x"], tree["list"][1]["x"])


def test_config_roundtrip_ignores_unknown_keys():
    cfg = GenVCConfig()
    d = cfg.to_dict()
    d["model_args"]["gpt_layers"] = 12
    d["model_args"]["some_future_coqui_field"] = {"x": 1}  # must be ignored
    d["unknown_top_level"] = 42
    cfg2 = GenVCConfig.from_dict(d)
    assert cfg2.model_args.gpt_layers == 12
    assert cfg2.audio.sample_rate == 24000
    # nested dataclasses rebuilt, not raw dicts
    assert cfg2.acoustic_dvae_config.audio.dvae_sample_rate == 24000


def test_weight_norm_fold_dims():
    import torch
    from torch.nn.utils import weight_norm

    conv = weight_norm(torch.nn.Conv1d(4, 8, 3))
    sd = {f"c.{k}": v for k, v in conv.state_dict().items()}
    w = checkpoint.fold_weight_norm(sd, "c")
    ref = conv.weight.detach().numpy()
    np.testing.assert_allclose(w, ref, rtol=1e-6)

    # fairseq pos_conv style: weight_norm(dim=2)
    conv2 = weight_norm(torch.nn.Conv1d(6, 6, 5, groups=2), dim=2)
    sd2 = {f"p.{k}": v for k, v in conv2.state_dict().items()}
    w2 = checkpoint.fold_weight_norm(sd2, "p")
    np.testing.assert_allclose(w2, conv2.weight.detach().numpy(), rtol=1e-6)
