"""End-to-end inference smoke tests on a synthetic reference-format bundle."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    from synthetic_bundle import write_bundle
    from genvc_tpu.inference.pipeline import model_init

    path = str(tmp_path_factory.mktemp("bundle") / "tiny_genvc.pth")
    write_bundle(path)
    return model_init(path)


def test_cond_latents_shape(pipe):
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal((1, 24000 * 2)) * 0.1).astype(np.float32)
    lat = pipe.get_gpt_cond_latents(ref)
    assert lat.shape == (1, 32, 64)
    assert np.all(np.isfinite(np.asarray(lat)))


def test_content_codes(pipe):
    rng = np.random.default_rng(1)
    seg = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    codes, n = pipe.extract_content_codes(seg)
    assert codes.shape == (1, 80)
    # 1 s @ 16 kHz -> 49 frames -> ceil(ceil(49/2)/2) = 13 codes
    assert n == 13
    assert np.all(np.asarray(codes)[0, :n] < 256)


def test_nonstreaming_synthesis(pipe):
    rng = np.random.default_rng(2)
    src = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    wav = pipe.synthesize(src, ref)
    assert wav.ndim == 1
    assert wav.shape[0] % 1024 == 0
    assert wav.shape[0] > 0
    assert np.all(np.abs(wav) <= 1.0)


def test_streaming_synthesis(pipe):
    rng = np.random.default_rng(3)
    src = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    wav, latency, rtf = pipe.synthesize_streaming(src, ref, verbose=False)
    assert wav.ndim == 1 and wav.shape[0] > 0
    assert latency is not None and latency > 0
    assert rtf > 0


def test_streaming_vs_nonstreaming_code_consistency(pipe):
    """Greedy decode must give identical codes through both drivers."""
    import dataclasses
    from genvc_tpu.decode.engine import SamplerConfig

    old = pipe.sampler
    pipe.sampler = SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                                 repetition_penalty=1.0, do_sample=False)
    pipe._build_jits()
    try:
        rng = np.random.default_rng(4)
        src = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)
        ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
        pipe._cond_latent = pipe.get_gpt_cond_latents(ref)
        codes, n = pipe.extract_content_codes(src)
        toks1, _ = pipe.generate_segment_codes(codes, n)
        toks2, _ = pipe.generate_segment_codes(codes, n)
        assert toks1 == toks2
        # fused streaming chunks must produce the same greedy tokens
        state, tok0, lat0, n_dev, _ = pipe._start_segment(
            np.pad(src, ((0, 0), (0, pipe._seg_len_16k - src.shape[-1]))),
            src.shape[-1])
        stream_toks = [int(tok0[0])]
        cur = pipe._stream_chunk_fn(pipe.gpt_params, pipe.hifigan_params,
                                    state, 7, lat0[:, None, :])
        stream_toks += [int(t) for t in np.asarray(cur[1])[0]]
        while len(stream_toks) < len(toks1):
            cur = pipe._stream_chunk_fn(pipe.gpt_params, pipe.hifigan_params,
                                        cur[0], 8,
                                        jnp.zeros((1, 0, 64), jnp.float32))
            stream_toks += [int(t) for t in np.asarray(cur[1])[0]]
        assert stream_toks[: len(toks1)] == toks1
    finally:
        pipe.sampler = old
        pipe._build_jits()


def test_cond_latent_batch_matches_loop(pipe):
    rng = np.random.default_rng(7)
    # 2.5 chunks of reference audio (last one partial)
    ref = (rng.standard_normal((1, int(24000 * 14.5))) * 0.1).astype(np.float32)
    batch = np.asarray(pipe.get_gpt_cond_latents(ref))
    loop = np.asarray(pipe._get_gpt_cond_latents_loop(ref))
    np.testing.assert_allclose(batch, loop, rtol=2e-4, atol=2e-4)


def test_cond_latent_multi_matches_per_ref(pipe):
    """One-dispatch multi-reference conditioning must equal the per-reference
    path row for row (different lengths -> different valid-chunk masks)."""
    rng = np.random.default_rng(8)
    refs = [(rng.standard_normal((1, int(24000 * s))) * 0.1).astype(np.float32)
            for s in (4.0, 9.5, 1.0)]
    multi = np.asarray(pipe.get_gpt_cond_latents_batch(refs))
    for i, r in enumerate(refs):
        single = np.asarray(pipe.get_gpt_cond_latents(r))[0]
        np.testing.assert_allclose(multi[i], single, rtol=2e-4, atol=2e-4)


def test_latent_pass_bucketed_matches_exact_width(pipe):
    """Teacher-forced latent re-forward: bucketed static width must equal the
    reference's exact width (n+3) at the first n positions."""
    from genvc_tpu.models import gpt as gpt_model
    rng = np.random.default_rng(9)
    n = 21
    gen = rng.integers(0, 1024, n)
    codes, n_codes = pipe.extract_content_codes(
        (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32))
    cond = pipe.get_gpt_cond_latents(
        (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32))

    def run(wm):
        arr = np.zeros((1, wm), np.int32)
        arr[0, :n] = gen
        lat = pipe._latent_fn(pipe.gpt_params, codes,
                              jnp.asarray([n_codes], jnp.int32),
                              jnp.asarray(arr), jnp.asarray([n], jnp.int32),
                              cond)
        return np.asarray(lat)[0, :n]

    exact = run(n + 3)        # reference width: max(code_lengths) = n+3
    bucketed = run(64)
    np.testing.assert_allclose(bucketed, exact, rtol=2e-4, atol=2e-4)


def test_streaming_multi_segment(pipe):
    """Source longer than 6 s crosses the segment boundary (exercises the
    non-first-segment prefill path and segment-carry crossfade)."""
    rng = np.random.default_rng(11)
    src = (rng.standard_normal((1, int(16000 * 7.5))) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    old_cap = pipe.gen_cap_tokens_per_code
    pipe.gen_cap_tokens_per_code = 1.0  # keep tiny-model runtime bounded
    try:
        wav, lat, rtf = pipe.synthesize_streaming(src, ref, verbose=False)
        wav2 = pipe.synthesize(src, ref)
    finally:
        pipe.gen_cap_tokens_per_code = old_cap
    assert wav.shape[0] > 16000  # several chunks of audio emitted
    assert np.all(np.abs(wav) <= 1.0)
    assert wav2.shape[0] % 1024 == 0 and wav2.shape[0] > 0


def test_stream_multiwindow_call_matches_single(pipe):
    """chunks_per_call=2 must emit byte-identical windows to single-chunk
    calls (greedy decoding)."""
    from genvc_tpu.decode.engine import SamplerConfig

    old = pipe.sampler
    pipe.sampler = SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                                 repetition_penalty=1.0, do_sample=False)
    pipe._build_jits()
    try:
        rng = np.random.default_rng(12)
        seg = (rng.standard_normal((1, pipe._seg_len_16k)) * 0.1).astype(np.float32)
        ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
        pipe._cond_latent = pipe.get_gpt_cond_latents(ref)
        state, tok0, lat0, _, _ = pipe._start_segment(seg, pipe._seg_len_16k)
        c1 = pipe._stream_chunk_fn(pipe.gpt_params, pipe.hifigan_params,
                                   state, 7, lat0[:, None, :])
        # single-chunk continuation
        s_a = pipe._stream_chunk_fn(pipe.gpt_params, pipe.hifigan_params,
                                    c1[0], 8, jnp.zeros((1, 0, 64), jnp.float32))
        s_b = pipe._stream_chunk_fn(pipe.gpt_params, pipe.hifigan_params,
                                    s_a[0], 8, jnp.zeros((1, 0, 64), jnp.float32))
        # double-chunk continuation from the same state
        d = pipe._stream_chunk_fn(pipe.gpt_params, pipe.hifigan_params,
                                  c1[0], 16, jnp.zeros((1, 0, 64), jnp.float32))
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(s_a[1])[0], np.asarray(s_b[1])[0]]),
            np.asarray(d[1])[0])
        np.testing.assert_allclose(np.asarray(s_a[4])[0], np.asarray(d[4])[0],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_b[4])[0], np.asarray(d[4])[1],
                                   atol=1e-5)
    finally:
        pipe.sampler = old
        pipe._build_jits()


def test_first_window_seam_parity(pipe):
    """The 4-token first window (latency path, VERDICT r2 item 3) must be
    byte-identical to a standalone vocode of the first 4 latents, the decoded
    tokens must not change vs the 8-cadence, and the full streaming output
    must equal a simple serial [4, 8, 8, ...]-window vocode + crossfade
    composition."""
    from genvc_tpu.decode.engine import SamplerConfig
    from genvc_tpu.inference.pipeline import _handle_chunk, CROSSFADE

    old = pipe.sampler
    pipe.sampler = SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                                 repetition_penalty=1.0, do_sample=False)
    pipe._build_jits()
    old_cap = pipe.gen_cap_tokens_per_code
    pipe.gen_cap_tokens_per_code = 1.0
    try:
        rng = np.random.default_rng(23)
        src = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
        ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
        pipe._cond_latent = pipe.get_gpt_cond_latents(ref)

        # reference tokens through the plain 8-cadence
        codes, n = pipe.extract_content_codes(src)
        toks_ref, _ = pipe.generate_segment_codes(codes, n)

        # serial manual drive of the 4-then-8 cadence
        seg = np.pad(src, ((0, 0), (0, pipe._seg_len_16k - src.shape[-1])))
        state, tok0, lat0, _, _ = pipe._start_segment(seg, src.shape[-1])
        c1 = pipe._stream_chunk_fn(pipe.gpt_params, pipe.hifigan_params,
                                   state, 3, lat0[:, None, :], win=4)
        toks = [int(tok0[0])] + [int(t) for t in np.asarray(c1[1])[0]]
        # fused 4-window == standalone vocode of the same 4 latents
        solo = pipe._vocode_fn(pipe.hifigan_params, c1[2][:, :4], 4)
        np.testing.assert_allclose(np.asarray(c1[4])[0],
                                   np.asarray(solo)[0], atol=1e-5)
        all_lats = [np.asarray(c1[2])[0]]
        cur = c1
        max_new = pipe._max_new(n)
        stop = pipe.gpt_cfg.stop_audio_token
        while len(toks) < max_new and stop not in toks:
            cur = pipe._stream_chunk_fn(
                pipe.gpt_params, pipe.hifigan_params, cur[0], 8,
                jnp.zeros((1, 0, pipe.gpt_cfg.model_dim), jnp.float32))
            toks += [int(t) for t in np.asarray(cur[1])[0]]
            all_lats.append(np.asarray(cur[2])[0])
        # decoded tokens are cadence-independent
        n_cmp = min(len(toks), len(toks_ref))
        assert toks[:n_cmp] == toks_ref[:n_cmp]

        # manual composition: windows [0:4), then 8s, EOS-trimmed remainder
        # (the driver vocodes latents up to AND INCLUDING the stop token's,
        # capped at max_new total)
        lats = np.concatenate(all_lats, axis=0)
        if stop in toks:
            n_valid = min(toks.index(stop) + 1, max_new)
        else:
            n_valid = max_new
        n_valid = max(n_valid, 1)
        bounds = [0, 4]
        while bounds[-1] < n_valid:
            bounds.append(min(bounds[-1] + 8, n_valid))
        overlap, parts = None, []
        for a, b in zip(bounds, bounds[1:]):
            if b - a == 4 and a == 0:
                w = np.asarray(c1[4])[0]
            else:
                w = np.asarray(pipe._vocode_fn(
                    pipe.hifigan_params,
                    jnp.asarray(lats[None, a:b]), b - a))[0]
            chunk, overlap = _handle_chunk(w, overlap, CROSSFADE)
            parts.append(chunk)
        manual = np.concatenate(parts, axis=-1)

        got, _, _ = pipe.synthesize_streaming(src, ref, verbose=False)
        assert got.shape == manual.shape
        np.testing.assert_allclose(got, manual, atol=2e-4)
    finally:
        pipe.sampler = old
        pipe.gen_cap_tokens_per_code = old_cap
        pipe._build_jits()


def test_synthesize_streaming_batch_matches_single(pipe):
    """Batched streaming must emit the same audio as B=1 streaming at greedy
    decoding (per-row EOS + crossfade parity; VERDICT r1 item 6)."""
    from genvc_tpu.decode.engine import SamplerConfig

    old = pipe.sampler
    pipe.sampler = SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                                 repetition_penalty=1.0, do_sample=False)
    pipe._build_jits()
    old_cap = pipe.gen_cap_tokens_per_code
    pipe.gen_cap_tokens_per_code = 1.0
    try:
        rng = np.random.default_rng(17)
        # row 1 spans two 6 s segments while row 0 has one: exercises the
        # multi-segment lockstep rounds with a masked inactive row (same
        # static shapes as the single-segment case -> no extra compiles)
        srcs = [(rng.standard_normal((1, 16000)) * 0.1).astype(np.float32),
                (rng.standard_normal((1, 112000)) * 0.1).astype(np.float32)]
        refs = [(rng.standard_normal((1, 24000)) * 0.1).astype(np.float32),
                (rng.standard_normal((1, 30000)) * 0.1).astype(np.float32)]
        outs, lats, agg_rtf = pipe.synthesize_streaming_batch(
            srcs, refs, verbose=False)
        assert len(outs) == 2 and agg_rtf > 0
        assert all(l is not None and l > 0 for l in lats)
        for s, r, got in zip(srcs, refs, outs):
            want, _, _ = pipe.synthesize_streaming(s, r, verbose=False)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=2e-4)
    finally:
        pipe.sampler = old
        pipe.gen_cap_tokens_per_code = old_cap
        pipe._build_jits()


def test_synthesize_batch(pipe):
    """Batched serving API: greedy batched decode must match per-utterance
    non-streaming synthesis."""
    from genvc_tpu.decode.engine import SamplerConfig

    old = pipe.sampler
    pipe.sampler = SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                                 repetition_penalty=1.0, do_sample=False)
    pipe._build_jits()
    old_cap = pipe.gen_cap_tokens_per_code
    pipe.gen_cap_tokens_per_code = 1.0
    try:
        rng = np.random.default_rng(13)
        srcs = [(rng.standard_normal((1, 16000)) * 0.1).astype(np.float32),
                (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)]
        refs = [(rng.standard_normal((1, 24000)) * 0.1).astype(np.float32),
                (rng.standard_normal((1, 30000)) * 0.1).astype(np.float32)]
        outs = pipe.synthesize_batch(srcs, refs)
        assert len(outs) == 2
        singles = [pipe.synthesize(s, r) for s, r in zip(srcs, refs)]
        for got, want in zip(outs, singles):
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=2e-4)
    finally:
        pipe.sampler = old
        pipe.gen_cap_tokens_per_code = old_cap
        pipe._build_jits()


def test_right_sized_cache_parity(pipe):
    """Serving-sized KV cache (gen cap set before first trace) must shrink
    the static cache length and produce the same greedy streaming audio as
    the architectural-size cache (engine.cache_size gen_tokens override;
    pipeline._cache_gen_tokens)."""
    from genvc_tpu.decode import engine
    from genvc_tpu.decode.engine import SamplerConfig

    old_sampler = pipe.sampler
    old_cap = pipe.gen_cap_tokens_per_code
    old_traced = pipe._cache_gen_traced
    pipe.sampler = SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                                 repetition_penalty=1.0, do_sample=False)
    pipe.gen_cap_tokens_per_code = 1.0
    rng = np.random.default_rng(17)
    src = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    try:
        # architectural-size cache (force the full geometry)
        pipe._cache_gen_traced = None
        pipe._build_jits()
        wav_full, _, _ = pipe.synthesize_streaming(src, ref, verbose=False)

        # right-sized cache: re-trace with the memo unset so the cap sizes it
        pipe._cache_gen_traced = "unset"
        pipe._build_jits()
        wav_small, _, _ = pipe.synthesize_streaming(src, ref, verbose=False)

        traced = pipe._cache_gen_traced
        assert isinstance(traced, int)
        t_small = engine.cache_size(pipe.gpt_cfg, pipe._prefix_width, traced)
        t_full = engine.cache_size(pipe.gpt_cfg, pipe._prefix_width)
        assert t_small < t_full, (t_small, t_full)
        assert wav_small.shape == wav_full.shape
        np.testing.assert_allclose(wav_small, wav_full, atol=2e-4)

        # raising the cap past the compiled capacity must fail loudly, not
        # silently clamp cache writes
        pipe.gen_cap_tokens_per_code = None
        with pytest.raises(ValueError, match="KV-cache"):
            pipe._max_new(pipe._host_n_codes(pipe._seg_len_16k))
    finally:
        pipe.sampler = old_sampler
        pipe.gen_cap_tokens_per_code = old_cap
        pipe._cache_gen_traced = old_traced
        pipe._build_jits()


def test_loose_cap_does_not_trip_capacity_guard(pipe):
    """A generation cap ABOVE the architectural max must size the cache at
    the architectural max and never trip the capacity guard (the guard is
    derived from the actual compiled cache length, not cap-minus-slack)."""
    old_cap = pipe.gen_cap_tokens_per_code
    old_traced = pipe._cache_gen_traced
    try:
        pipe.gen_cap_tokens_per_code = 50.0  # not restrictive
        pipe._cache_gen_traced = "unset"
        traced = pipe._cache_gen_tokens()
        assert traced == pipe.gpt_cfg.max_gen_mel_tokens
        # architectural-max generation fits the compiled capacity
        n_full = pipe._host_n_codes(pipe._seg_len_16k)
        assert pipe._max_new(n_full) == traced
    finally:
        pipe.gen_cap_tokens_per_code = old_cap
        pipe._cache_gen_traced = old_traced


def test_window_accounting_edges():
    """Pure-host unit tests of the shared EOS/cap window arithmetic (single
    driver, batch driver, and StreamServer all consume this)."""
    from genvc_tpu.inference.pipeline import window_accounting

    stop = 1025
    toks = [5, 9, 12, stop, 7, 7, 7, 7]
    # EOS mid-call: valid tokens 0..3 (incl. stop), carry 1 -> 5 latents
    eos_j, n_valid, full, rem = window_accounting(
        toks, n_total=1, max_new=602, stop=stop, carry_n=1, win=8)
    assert (eos_j, n_valid, full, rem) == (3, 5, 0, 5)

    # no EOS, full window: 8 tokens + carry 1 -> emit 1 window, 1 remains
    eos_j, n_valid, full, rem = window_accounting(
        [7] * 8, n_total=1, max_new=602, stop=stop, carry_n=1, win=8)
    assert (eos_j, n_valid, full, rem) == (None, 9, 1, 1)

    # cap reached exactly at call end: eos_j = k-1, all latents valid
    eos_j, n_valid, full, rem = window_accounting(
        [7] * 8, n_total=8, max_new=16, stop=stop, carry_n=1, win=8)
    assert (eos_j, n_valid, full, rem) == (7, 9, 1, 1)

    # cap already exhausted before the first token: eos_j=-1, only carry
    eos_j, n_valid, full, rem = window_accounting(
        [7] * 8, n_total=16, max_new=16, stop=stop, carry_n=1, win=8)
    assert (eos_j, n_valid, full, rem) == (-1, 1, 0, 1)

    # EOS as the very last token of the call, no carry (later lockstep
    # calls): two full windows, no remainder
    eos_j, n_valid, full, rem = window_accounting(
        [7] * 15 + [stop], n_total=9, max_new=602, stop=stop, carry_n=0,
        win=8)
    assert (eos_j, n_valid, full, rem) == (15, 16, 2, 0)


def test_synthesize_all_stop_returns_empty(pipe, monkeypatch):
    """Every segment decoding straight to the stop token (legal HF outcome —
    beam modes may finalize an empty hypothesis) returns empty audio instead
    of crashing on an empty latent concat."""
    stop = pipe.gpt_cfg.stop_audio_token
    monkeypatch.setattr(pipe, "generate_segment_codes",
                        lambda codes, n_codes, **kw: ([stop], None))
    rng = np.random.default_rng(3)
    src = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    wav = pipe.synthesize(src, ref, num_beams=2)
    assert wav.shape == (0,) and wav.dtype == np.float32


def test_synthesize_group_beam(pipe):
    """Group/diverse beam search through the full synthesize path
    (num_beam_groups > 1 route of the vendored generator,
    stream_generator.py:308-317): produces audio, and do_sample is rejected
    like HF rejects it for group mode."""
    rng = np.random.default_rng(7)
    src = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    wav = pipe.synthesize(src, ref, num_beams=4, num_beam_groups=2,
                          diversity_penalty=1.0)
    assert wav.ndim == 1 and wav.shape[0] % 1024 == 0
    assert np.all(np.isfinite(wav))
    with pytest.raises(ValueError, match="do_sample"):
        pipe.synthesize(src, ref, num_beams=4, num_beam_groups=2,
                        beam_do_sample=True)


def test_vocode_tail_matches_exact_slice(pipe):
    """The single-program EOS-remainder vocode (traced row/start/rem +
    masking) is sample-exact vs the exact-width slice+vocode oracle,
    including the overhang case where start+win exceeds the latent buffer
    (serving tick geometry W=9, start=8)."""
    d = pipe.gpt_cfg.model_dim
    stride = pipe.gpt_cfg.code_stride_len
    rng = np.random.default_rng(11)

    for b, w_buf, cases in [
        (1, 16, [(0, 0, 3), (0, 8, 5), (0, 8, 8)]),   # lockstep call widths
        (3, 9, [(1, 0, 2), (2, 8, 1)]),               # serving tick incl. overhang
    ]:
        lats = jnp.asarray(
            rng.standard_normal((b, w_buf, d)).astype(np.float32))
        for row, start, rem in cases:
            want = np.asarray(pipe._vocode_fn(
                pipe.hifigan_params,
                lats[row : row + 1, start : start + rem], rem))[0]
            got = np.asarray(pipe._vocode_tail_fn(
                pipe.hifigan_params, lats, row, start, rem,
                win=8))[0, : rem * stride]
            assert want.shape == got.shape == (rem * stride,)
            np.testing.assert_allclose(got, want, atol=1e-5)
