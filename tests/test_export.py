"""Checkpoint export (genvc_tpu pytree → reference-format .pth): round-trip
parity. export_bundle is the inverse of convert_bundle, so a reference bundle
converted → exported → re-converted must reproduce the identical pytree (the
one reparametrization — weight-norm (g, v) refactored from folded weights —
is exact up to float rounding). This is the deploy-anywhere contract: a model
trained on this framework loads in the reference's model_init
(/root/reference/inference/model_init.py:11-22).
"""

import numpy as np
import pytest

from genvc_tpu import checkpoint


@pytest.fixture(scope="module")
def bundles(tmp_path_factory):
    from synthetic_bundle import write_bundle

    d = tmp_path_factory.mktemp("export")
    p1 = str(d / "ref.pth")
    p2 = str(d / "exported.pth")
    write_bundle(p1)
    t1 = checkpoint.convert_bundle(p1)
    checkpoint.export_bundle(t1, p2)
    t2 = checkpoint.convert_bundle(p2)
    return p1, p2, t1, t2


def _assert_trees_close(a, b, path=""):
    assert type(a) is type(b), f"{path}: {type(a)} vs {type(b)}"
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: keys {set(a)} vs {set(b)}"
        for k in a:
            _assert_trees_close(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), f"{path}: len {len(a)} vs {len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_trees_close(x, y, f"{path}[{i}]")
    elif a is None:
        assert b is None, path
    elif isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=path)
    else:
        assert a == b, path


def test_roundtrip_pytree_identical(bundles):
    _, _, t1, t2 = bundles
    assert set(t1) == set(t2)
    for fam in ("gpt", "hifigan", "acoustic_dvae", "content_dvae",
                "contentvec"):
        assert fam in t1, f"synthetic bundle missing {fam}"
        _assert_trees_close(t1[fam], t2[fam], fam)


def test_roundtrip_config_embedded(bundles):
    _, _, t1, t2 = bundles
    assert t2["config"] == t1["config"]


def test_exported_state_dict_names_match_reference(bundles):
    """Every key of the original reference-format bundle appears in the
    export (strict name compatibility — the reference loads with
    strict=False, but the export should not silently drop weights)."""
    p1, p2, _, _ = bundles
    sd1, _ = checkpoint.load_torch_bundle(p1)
    sd2, _ = checkpoint.load_torch_bundle(p2)
    missing = set(sd1) - set(sd2)
    assert not missing, sorted(missing)[:10]
    for k in sd1:
        assert tuple(sd1[k].shape) == tuple(sd2[k].shape), k


def test_exported_bundle_loads_in_pipeline(bundles):
    """model_init on the exported bundle produces the same prefill logits as
    on the original (weight-norm refactor exactness, end-to-end)."""
    import jax
    import jax.numpy as jnp
    from genvc_tpu.decode import engine
    from genvc_tpu.inference.pipeline import model_init
    from genvc_tpu.models import gpt as gpt_model

    p1, p2, _, _ = bundles
    rng = np.random.default_rng(21)
    codes = jnp.asarray(rng.integers(0, 256, (1, 80)), jnp.int32)
    cond = jnp.asarray(rng.standard_normal((1, 32, 64)) * 0.05, jnp.float32)

    def prefill_logits(path):
        pipe = model_init(path)
        gcfg = pipe.gpt_cfg
        prefix, valid = gpt_model.build_prefix_emb(
            pipe.gpt_params, gcfg, cond, codes, jnp.asarray([13]))
        state = engine.init_state(gcfg, pipe._prefix_width, 1, gcfg.heads,
                                  gcfg.model_dim // gcfg.heads,
                                  jax.random.key(0))
        _, _, logits = engine.prefill_logits(pipe.gpt_params, gcfg, state,
                                             prefix, valid)
        return np.asarray(logits, np.float32)

    np.testing.assert_allclose(prefill_logits(p2), prefill_logits(p1),
                               rtol=1e-5, atol=1e-5)
