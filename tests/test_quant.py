"""int8 decode-weight quantization (ops.quant): numerics + pipeline e2e.

The quantized path is opt-in serving acceleration (no reference analogue —
the reference decodes in full torch precision); these tests pin (a) the
W8A8 numeric contract (sub-2% relative error per contraction), (b) that
quantized param trees flow through the unchanged engine/scan code, and
(c) that a quantized pipeline stays close to the full-precision one at the
logit level and produces sane audio end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_linear_q8_accuracy():
    from genvc_tpu.ops import nn, quant

    k1, k2 = jax.random.split(jax.random.key(0))
    p = nn.init_linear(k1, 256, 512)
    x = jax.random.normal(k2, (4, 256), jnp.float32)
    y_f = nn.linear(p, x)
    y_q = quant.linear_q8(quant.quantize_linear(p), x)
    rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
    assert rel < 0.02, rel
    # nn.linear dispatches on the quantized leaf itself
    y_d = nn.linear(quant.quantize_linear(p), x)
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_d))


def test_linear_q8_int8_range_and_dtype():
    from genvc_tpu.ops import quant

    k = jax.random.key(1)
    p = {"w": jax.random.normal(k, (64, 32)) * 3.0}
    q = quant.quantize_linear(p)
    assert q["w_q"].dtype == jnp.int8
    assert int(jnp.max(jnp.abs(q["w_q"]))) == 127  # absmax hits the grid edge
    # bf16 activations round-trip through the int8 path in bf16
    x = jax.random.normal(k, (2, 64), jnp.bfloat16)
    y = quant.linear_q8(q, x)
    assert y.dtype == jnp.bfloat16


def test_quantize_stacked_blocks_scan():
    """Scan-stacked (L, in, out) leaves quantize to (L, in, out) int8 +
    (L, out) scales, and lax.scan slices them together."""
    from genvc_tpu.ops import quant

    k1, k2 = jax.random.split(jax.random.key(2))
    w = jax.random.normal(k1, (3, 128, 64))
    x = jax.random.normal(k2, (4, 128))
    q = quant.quantize_linear({"w": w})
    assert q["w_q"].shape == (3, 128, 64) and q["scale"].shape == (3, 64)

    def body(c, bp):
        return c, quant.linear_q8(bp, x)

    _, ys = jax.lax.scan(body, None, q)
    yf = jnp.einsum("bi,lio->lbo", x, w)
    rel = float(jnp.linalg.norm(ys - yf) / jnp.linalg.norm(yf))
    assert rel < 0.02, rel


def test_quantize_gpt_params_structure():
    from genvc_tpu.models import gpt as gpt_model
    from genvc_tpu.ops import quant

    cfg = gpt_model.GPTConfig(layers=2, model_dim=64, heads=2)
    params = gpt_model.init_params(jax.random.key(3), cfg)
    q = quant.quantize_gpt_params(params)
    blk = q["core"]["blocks"]
    for name, lin in (("attn", "c_attn"), ("attn", "c_proj"),
                      ("mlp", "c_fc"), ("mlp", "c_proj")):
        leaf = blk[name][lin]
        assert leaf["w_q"].dtype == jnp.int8 and "scale" in leaf
        assert leaf["w_q"].shape[0] == 2  # layer-stacked
    assert q["mel_head"]["w_q"].dtype == jnp.int8
    # non-linear leaves untouched
    np.testing.assert_array_equal(np.asarray(q["mel_embedding"]),
                                  np.asarray(params["mel_embedding"]))
    assert "scale" in q["core"]["blocks"]["ln_1"]  # layernorm left alone


@pytest.fixture(scope="module")
def pipes(tmp_path_factory):
    from synthetic_bundle import write_bundle
    from genvc_tpu.inference.pipeline import model_init

    path = str(tmp_path_factory.mktemp("bundle") / "tiny_genvc.pth")
    write_bundle(path)
    return model_init(path), model_init(path, quantize="int8")


def test_quantized_pipeline_logit_parity(pipes):
    """Prefill logits of the quantized pipeline track full precision."""
    from genvc_tpu.decode import engine
    from genvc_tpu.models import gpt as gpt_model

    pipe_f, pipe_q = pipes
    rng = np.random.default_rng(10)
    codes = jnp.asarray(rng.integers(0, 256, (1, 80)), jnp.int32)
    cond = jnp.asarray(rng.standard_normal((1, 32, 64)) * 0.05, jnp.float32)

    def prefill_logits(pipe):
        gcfg = pipe.gpt_cfg
        prefix, valid = gpt_model.build_prefix_emb(
            pipe.gpt_params, gcfg, cond, codes, jnp.asarray([13]))
        state = engine.init_state(gcfg, pipe._prefix_width, 1, gcfg.heads,
                                  gcfg.model_dim // gcfg.heads,
                                  jax.random.key(0))
        _, _, logits = engine.prefill_logits(pipe.gpt_params, gcfg, state,
                                             prefix, valid)
        return np.asarray(logits, np.float32)

    lf = prefill_logits(pipe_f)
    lq = prefill_logits(pipe_q)
    rel = np.linalg.norm(lq - lf) / np.linalg.norm(lf)
    assert rel < 0.05, rel


def test_quantized_pipeline_e2e(pipes):
    _, pipe_q = pipes
    assert pipe_q.quantize == "int8"
    rng = np.random.default_rng(11)
    src = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    wav = pipe_q.synthesize(src, ref)
    assert wav.ndim == 1 and wav.shape[0] > 0
    assert np.all(np.isfinite(wav)) and np.all(np.abs(wav) <= 1.0)
    wav_s, latency, rtf = pipe_q.synthesize_streaming(src, ref, verbose=False)
    assert wav_s.shape[0] > 0 and latency > 0 and rtf > 0
    assert np.all(np.isfinite(wav_s))
