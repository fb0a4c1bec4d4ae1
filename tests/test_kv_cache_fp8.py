"""fp8 (e4m3) KV-cache storage: numerics + pipeline e2e.

Opt-in serving acceleration (no reference analogue): every decode step reads
the ENTIRE static KV cache, and at serving batch that read dominates even the
weight stream — fp8 storage halves it. Values are upcast to the compute dtype
inside attention, so only cache residency changes. These tests pin (a) that a
decode step reading an fp8 cache tracks the full-precision step at the
logit/latent level, and (b) that the option flows end-to-end through the
pipeline (prefill pad, chunked decode, streaming drivers).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genvc_tpu.decode import engine
from genvc_tpu.models import gpt as gpt_model

from test_gpt_parity import SMALL, hf_to_core, make_hf_gpt2


def test_fp8_cache_decode_step_tracks_f32():
    """One decode step after an identical prefill: logits/latents from an
    fp8-stored cache stay within quantization tolerance of the f32 cache."""
    cfg = SMALL
    hf = make_hf_gpt2(cfg)
    params, _ = hf_to_core(hf, cfg)
    rng = np.random.default_rng(5)
    text = jnp.asarray(rng.integers(0, 256, (1, 10)), jnp.int32)
    cond = jnp.asarray(rng.standard_normal((1, 32, cfg.model_dim)) * 0.1,
                       jnp.float32)
    prefix, valid = gpt_model.build_prefix_emb(
        params, cfg, cond, text, jnp.asarray([10], jnp.int32))
    sampler = engine.SamplerConfig(do_sample=False, repetition_penalty=1.0,
                                   top_k=0, top_p=1.0, temperature=1.0)

    outs = {}
    for name, cache_dtype in (("f32", jnp.float32),
                              ("fp8", jnp.float8_e4m3fn)):
        state = engine.init_state(cfg, prefix.shape[1], 1, cfg.heads,
                                  cfg.model_dim // cfg.heads,
                                  jax.random.key(0), cache_dtype=cache_dtype)
        state, tok0, lat0 = engine.prefill(params, cfg, state, prefix, valid,
                                           sampler)
        state, toks, lats, _ = engine.decode_chunk(params, cfg, state,
                                                   sampler, chunk=4)
        outs[name] = (np.asarray(tok0), np.asarray(lats, np.float32))

    # prefill never touches the cache -> first token identical
    np.testing.assert_array_equal(outs["f32"][0], outs["fp8"][0])
    lf, l8 = outs["f32"][1], outs["fp8"][1]
    rel = np.linalg.norm(l8 - lf) / np.linalg.norm(lf)
    assert rel < 0.05, rel


@pytest.fixture(scope="module")
def pipe8(tmp_path_factory):
    import sys
    sys.path.insert(0, "tests")
    from synthetic_bundle import write_bundle
    from genvc_tpu.inference.pipeline import model_init

    path = str(tmp_path_factory.mktemp("fp8") / "tiny.pth")
    write_bundle(path)
    return model_init(path, kv_cache_dtype="fp8")


def test_fp8_pipeline_e2e(pipe8):
    assert pipe8._cache_dtype == jnp.float8_e4m3fn
    rng = np.random.default_rng(12)
    src = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    wav = pipe8.synthesize(src, ref)
    assert wav.ndim == 1 and wav.shape[0] > 0
    assert np.all(np.isfinite(wav)) and np.all(np.abs(wav) <= 1.0)
    wav_s, latency, rtf = pipe8.synthesize_streaming(src, ref, verbose=False)
    assert wav_s.shape[0] > 0 and latency > 0 and rtf > 0
    assert np.all(np.isfinite(wav_s))


def test_fp8_rejects_unknown_mode(tmp_path_factory):
    import sys
    sys.path.insert(0, "tests")
    from synthetic_bundle import write_bundle
    from genvc_tpu.inference.pipeline import model_init

    path = str(tmp_path_factory.mktemp("fp8bad") / "tiny.pth")
    write_bundle(path)
    with pytest.raises(ValueError, match="kv_cache_dtype"):
        model_init(path, kv_cache_dtype="int4")
