"""Multi-chip sharding tests on the 8-device CPU-emulated mesh
(SURVEY.md §4d — the reference has no multi-node tests; this substitutes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from genvc_tpu.models import dvae, gpt as gpt_model
from genvc_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return mesh_lib.make_mesh(n_data=4, n_model=2)


def test_tp_forward_matches_single_device(mesh8):
    """Megatron-sharded GPT forward must equal the replicated forward."""
    cfg = gpt_model.GPTConfig(layers=2, model_dim=256, heads=4)
    params = gpt_model.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((4, 12, 256)) * 0.3, jnp.float32)

    ref = np.asarray(gpt_model.core_forward(params["core"], emb, cfg))

    specs = mesh_lib.gpt_param_specs(params)
    sharded = mesh_lib.shard_tree(params, specs, mesh8)
    emb_sharded = jax.device_put(emb, NamedSharding(mesh8, P("data")))
    out = jax.jit(lambda p, e: gpt_model.core_forward(p["core"], e, cfg))(
        sharded, emb_sharded)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_vq_ema_psum_matches_global_batch(mesh8):
    """shard_map'd VQ-EMA update with psum == single-device update on the
    concatenated batch (reference all_reduce semantics, dvae.py:108-110)."""
    from jax.experimental.shard_map import shard_map

    cfg = dvae.DVAEConfig(channels=8, num_tokens=16, codebook_dim=8,
                          hidden_dim=4, num_resnet_blocks=1, num_layers=2)
    params = dvae.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 8, 16)), jnp.float32)

    # global (single-device) update
    _, _, _, cb_ref, _ = dvae.forward_train(params, x, cfg)

    data_mesh = mesh_lib.make_mesh(n_data=8, n_model=1)

    def local_update(p, xb):
        _, _, _, cb, _ = dvae.forward_train(p, xb, cfg, axis_name="data")
        return cb

    fn = shard_map(local_update, mesh=data_mesh,
                   in_specs=(P(), P("data")), out_specs=P())
    cb_sharded = fn(params, x)
    np.testing.assert_allclose(np.asarray(cb_sharded["cluster_size"]),
                               np.asarray(cb_ref["cluster_size"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cb_sharded["embed"]),
                               np.asarray(cb_ref["embed"]),
                               rtol=1e-4, atol=1e-5)


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_stream_server(mesh8, tmp_path):
    """StreamServer with the slot pool sharded over the mesh's data axis
    (scale-out serving: slots/chips rows per chip) must produce the same
    greedy audio as the single-device server."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synthetic_bundle import write_bundle
    from genvc_tpu.decode.engine import SamplerConfig
    from genvc_tpu.inference.pipeline import model_init
    from genvc_tpu.serving.server import StreamServer

    path = str(tmp_path / "tiny_genvc.pth")
    write_bundle(path)
    pipe = model_init(path)
    pipe.sampler = SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                                 repetition_penalty=1.0, do_sample=False)
    pipe.gen_cap_tokens_per_code = 1.0
    pipe.first_chunk_tokens = 8
    pipe._build_jits()

    rng = np.random.default_rng(41)
    srcs = [(rng.standard_normal((1, n)) * 0.1).astype(np.float32)
            for n in (16000, 12000)]
    refs = [(rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
            for _ in range(2)]

    plain = StreamServer(pipe, slots=4)
    sids = [plain.submit(s, r) for s, r in zip(srcs, refs)]
    plain.drain()
    want = [plain.result(sid)[0] for sid in sids]

    sharded = StreamServer(pipe, slots=4, mesh=mesh8)
    sids = [sharded.submit(s, r) for s, r in zip(srcs, refs)]
    sharded.drain()
    for sid, w in zip(sids, want):
        got, _ = sharded.result(sid)
        assert got.shape == w.shape
        np.testing.assert_allclose(got, w, atol=2e-4)

    # slots must divide over the axis
    with pytest.raises(ValueError, match="divide"):
        StreamServer(pipe, slots=3, mesh=mesh8)
