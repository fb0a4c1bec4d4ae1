"""Continuous-batching StreamServer tests (CPU, tiny synthetic bundle).

The server must reproduce ``synthesize_streaming`` (8-token cadence) audio
per stream while admitting/retiring streams dynamically in a fixed slot
pool — including a stream that arrives mid-flight and one that spans a
segment boundary inside its slot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    from synthetic_bundle import write_bundle
    from genvc_tpu.inference.pipeline import model_init
    from genvc_tpu.decode.engine import SamplerConfig

    path = str(tmp_path_factory.mktemp("bundle") / "tiny_genvc.pth")
    write_bundle(path)
    p = model_init(path)
    # greedy + capped BEFORE the first trace (the cap also right-sizes the
    # KV cache; the server pool shares that geometry)
    p.sampler = SamplerConfig(temperature=1.0, top_k=1, top_p=1.0,
                              repetition_penalty=1.0, do_sample=False)
    p.gen_cap_tokens_per_code = 1.0
    p.first_chunk_tokens = 8  # server cadence is the 8-token reference window
    p._build_jits()
    return p


def test_insert_row_isolation():
    """insert_row must replace exactly one slot's state and positions."""
    from genvc_tpu.decode import engine
    from genvc_tpu.models.gpt import GPTConfig

    cfg = GPTConfig(layers=2, model_dim=16, heads=2)
    pool = engine.init_state(cfg, 8, 3, 2, 8, jax.random.key(0),
                             cache_dtype=jnp.float32, gen_tokens=8,
                             per_row=True)
    pool = pool._replace(cache_k=jnp.ones_like(pool.cache_k),
                         last_token=jnp.array([7, 7, 7], jnp.int32))
    row = engine.init_state(cfg, 8, 1, 2, 8, jax.random.key(1),
                            cache_dtype=jnp.float32, gen_tokens=8,
                            per_row=True)
    row = row._replace(cache_k=jnp.full_like(row.cache_k, 2.0),
                       cur_index=jnp.array([5], jnp.int32),
                       last_token=jnp.array([3], jnp.int32))
    out = engine.insert_row(pool, row, 1)
    ck = np.asarray(out.cache_k)
    assert np.all(ck[:, 1] == 2.0)
    assert np.all(ck[:, 0] == 1.0) and np.all(ck[:, 2] == 1.0)
    assert np.asarray(out.cur_index).tolist() == [0, 5, 0]
    assert np.asarray(out.last_token).tolist() == [7, 3, 7]


def test_per_row_decode_matches_lockstep():
    """A per-row-position pool whose rows happen to be aligned must decode
    exactly like the scalar-position lockstep state (same cache, same
    tokens)."""
    from genvc_tpu.decode import engine
    from genvc_tpu.models import gpt as gpt_model

    cfg = gpt_model.GPTConfig(layers=2, model_dim=32, heads=2,
                              num_audio_tokens=40, number_text_tokens=20,
                              start_audio_token=38, stop_audio_token=39)
    params = gpt_model.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    b, p = 2, 12
    prefix = jnp.asarray(rng.standard_normal((b, p, 32)), jnp.float32)
    valid = jnp.ones((b, p), bool)
    sampler = engine.SamplerConfig(do_sample=False, top_k=1,
                                   repetition_penalty=1.0, temperature=1.0)

    outs = {}
    for per_row in (False, True):
        st = engine.init_state(cfg, p, b, 2, 16, jax.random.key(1),
                               cache_dtype=jnp.float32, gen_tokens=16,
                               per_row=per_row)
        st, tok0, _ = engine.prefill(params, cfg, st, prefix, valid, sampler)
        st, toks, lats, fin = engine.decode_chunk(params, cfg, st, sampler,
                                                  chunk=6)
        outs[per_row] = (np.asarray(tok0), np.asarray(toks), np.asarray(lats))
    assert np.array_equal(outs[False][0], outs[True][0])
    assert np.array_equal(outs[False][1], outs[True][1])
    np.testing.assert_allclose(outs[False][2], outs[True][2], atol=1e-5)


def test_server_matches_single_stream(pipe):
    """Three streams — two admitted at start, one arriving mid-flight into a
    2-slot pool — must each produce the same greedy audio as a standalone
    synthesize_streaming run."""
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(23)
    srcs = [(rng.standard_normal((1, n)) * 0.1).astype(np.float32)
            for n in (16000, 24000, 9000)]
    refs = [(rng.standard_normal((1, n)) * 0.1).astype(np.float32)
            for n in (24000, 30000, 24000)]
    singles = [pipe.synthesize_streaming(s, r, verbose=False)[0]
               for s, r in zip(srcs, refs)]

    server = StreamServer(pipe, slots=2)
    sids = [server.submit(srcs[0], refs[0]),
            server.submit(srcs[1], refs[1])]
    assert server.step()          # both admitted; first tick
    sids.append(server.submit(srcs[2], refs[2]))  # arrives mid-flight
    server.drain()

    for sid, want in zip(sids, singles):
        assert server.finished(sid)
        got, stats = server.result(sid)
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=2e-4)
        assert stats["latency_s"] > 0
        assert stats["rtf"] and stats["rtf"] > 0


def test_server_fast_first_matches_single_stream(pipe):
    """first_window=4 (admission-time fast-first): per-stream audio equals
    synthesize_streaming with first_chunk_tokens=4 — the admission mini-tick
    emits the 4-latent first window, the pool continues the exact window
    alignment, and multi-segment streams keep the 8-cadence on later
    segments. Includes a short source whose segment can end inside the
    admission window (EOS/cap within the first 4 tokens)."""
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(31)
    srcs = [(rng.standard_normal((1, n)) * 0.1).astype(np.float32)
            for n in (16000, 100000, 6000)]
    refs = [(rng.standard_normal((1, n)) * 0.1).astype(np.float32)
            for n in (24000, 24000, 30000)]
    old_fct = pipe.first_chunk_tokens
    try:
        pipe.first_chunk_tokens = 4
        singles = [pipe.synthesize_streaming(s, r, verbose=False)[0]
                   for s, r in zip(srcs, refs)]
        server = StreamServer(pipe, slots=2, first_window=4)
        assert server.first_window == 4
        sids = [server.submit(s, r) for s, r in zip(srcs, refs)]
        server.drain()
        for sid, want in zip(sids, singles):
            got, stats = server.result(sid)
            assert got.shape == want.shape, (got.shape, want.shape)
            np.testing.assert_allclose(got, want, atol=2e-4)
            assert stats["latency_s"] > 0
    finally:
        pipe.first_chunk_tokens = old_fct


def test_server_multi_segment_stream(pipe):
    """A source longer than one 6 s segment advances segments inside its
    slot (re-prefill + insert) and still matches the single-stream driver."""
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(29)
    src = (rng.standard_normal((1, 100000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    want, _, _ = pipe.synthesize_streaming(src, ref, verbose=False)

    server = StreamServer(pipe, slots=2)
    sid = server.submit(src, ref)
    server.drain()
    got, stats = server.result(sid)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_on_chunk_callback_delivers_stream(pipe):
    """on_chunk must deliver exactly the chunks whose concatenation is the
    final wav, in order; a raising callback is disabled and recorded without
    killing the pool or the other stream."""
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(31)
    src = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)

    got_chunks = []

    def cb(sid, chunk):
        got_chunks.append((sid, np.asarray(chunk)))

    def bad_cb(sid, chunk):
        raise RuntimeError("client went away")

    server = StreamServer(pipe, slots=2)
    sid_ok = server.submit(src, ref, on_chunk=cb)
    sid_bad = server.submit(src, ref, on_chunk=bad_cb)
    server.drain()

    wav_ok, stats_ok = server.result(sid_ok)
    assert stats_ok["callback_error"] is None
    assert all(s == sid_ok for s, _ in got_chunks)
    np.testing.assert_array_equal(
        np.concatenate([c for _, c in got_chunks], axis=-1), wav_ok)

    wav_bad, stats_bad = server.result(sid_bad)
    assert "RuntimeError" in stats_bad["callback_error"]
    assert wav_bad.shape == wav_ok.shape  # synthesis completed regardless


def test_cancel_stream(pipe):
    """Cancelling a queued stream finalizes it empty; cancelling an active
    stream frees its slot, keeps the audio emitted so far, and leaves the
    other stream's output untouched."""
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(37)
    src_a = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    src_b = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    src_c = (rng.standard_normal((1, 9000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    want_b = pipe.synthesize_streaming(src_b, ref, verbose=False)[0]

    server = StreamServer(pipe, slots=2)
    sid_a = server.submit(src_a, ref)
    sid_b = server.submit(src_b, ref)
    sid_c = server.submit(src_c, ref)   # queued (pool full)
    server.cancel(sid_c)                # cancel while queued
    server.step()
    server.cancel(sid_a)                # cancel while active
    server.drain()

    wav_c, stats_c = server.result(sid_c)
    assert stats_c["cancelled"] and wav_c.shape == (0,)

    wav_a, stats_a = server.result(sid_a)
    assert stats_a["cancelled"]

    wav_b, stats_b = server.result(sid_b)
    assert not stats_b["cancelled"]
    assert wav_b.shape == want_b.shape
    np.testing.assert_allclose(wav_b, want_b, atol=2e-4)

    # cancel of a finished stream is a no-op
    server.cancel(sid_b)
    assert not server.result(sid_b)[1]["cancelled"]


def test_per_stream_sampler(pipe):
    """Per-request decode config: a greedy stream sharing the pool with a
    sampled stream must still match its standalone greedy run byte-for-byte;
    the sampled stream produces valid audio under its own parameters."""
    from genvc_tpu.decode.engine import SamplerConfig
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(43)
    src_a = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    src_b = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    want_a = pipe.synthesize_streaming(src_a, ref, verbose=False)[0]

    server = StreamServer(pipe, slots=2)
    sid_a = server.submit(src_a, ref)  # pipeline default (greedy)
    sid_b = server.submit(src_b, ref, sampler=SamplerConfig(
        temperature=0.8, top_k=5, top_p=0.9, repetition_penalty=2.0,
        do_sample=True))
    server.drain()

    wav_a, _ = server.result(sid_a)
    assert wav_a.shape == want_a.shape
    np.testing.assert_allclose(wav_a, want_a, atol=2e-4)

    wav_b, stats_b = server.result(sid_b)
    assert wav_b.shape[0] > 0
    assert np.all(np.isfinite(wav_b)) and np.max(np.abs(wav_b)) <= 1.0


def test_server_soak_many_streams(pipe):
    """Soak: 6x oversubscription through a 4-slot pool with varying stream
    lengths — exercises slot reuse, epoch bookkeeping, and queue waits far
    past the handful-of-streams cases above. Every stream must complete with
    finite audio matching its own single-stream reference output."""
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(77)
    srcs = []
    for i in range(24):
        n = [4000, 8000, 12000][i % 3]
        srcs.append((rng.standard_normal((1, n)) * 0.1).astype(np.float32))
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)

    server = StreamServer(pipe, slots=4)
    sids = [server.submit(s, ref) for s in srcs]
    server.drain()
    assert len(server._free) == server.slots  # no leaked slots
    assert not server._queue and not server._slot_map

    # independent single-stream references (greedy -> deterministic)
    for sid, src in zip(sids, srcs):
        wav, stats = server.pop_result(sid)
        assert stats["latency_s"] is None or stats["latency_s"] >= 0
        want, _, _ = pipe.synthesize_streaming(src, ref, verbose=False)
        assert wav.shape == want.shape
        np.testing.assert_allclose(wav, want, atol=2e-4)
    assert not server._results


def test_server_metrics(pipe):
    """metrics() aggregates pool counters consistently with the run."""
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(88)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    srcs = [(rng.standard_normal((1, 6000)) * 0.1).astype(np.float32)
            for _ in range(5)]
    server = StreamServer(pipe, slots=2)
    m0 = server.metrics()
    assert m0["ticks"] == 0 and m0["admissions"] == 0
    sids = [server.submit(s, ref) for s in srcs]
    server.cancel(sids[-1])
    server.drain()
    m = server.metrics()
    assert m["admissions"] >= 4          # the cancelled one may skip its slot
    assert m["completed"] == 5 and m["cancelled"] == 1
    assert m["queued"] == 0 and m["active"] == 0
    assert m["ticks"] > 0 and 0 < m["mean_occupancy"] <= 2
    assert m["pending_results"] == 5


def test_server_max_queue_backpressure(pipe):
    """submit past max_queue raises QueueFull before any device work; the
    queue drains normally and rejected submissions are counted."""
    from genvc_tpu.serving.server import QueueFull, StreamServer

    rng = np.random.default_rng(97)
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    src = (rng.standard_normal((1, 6000)) * 0.1).astype(np.float32)
    server = StreamServer(pipe, slots=1, max_queue=2)
    # nothing is admitted until step(), so every submit sits in the queue:
    # with max_queue=2 the third submit must be rejected
    sids = [server.submit(src, ref) for _ in range(2)]
    with pytest.raises(QueueFull):
        server.submit(src, ref)
    assert server.metrics()["rejected"] == 1
    server.step()  # admits one stream into the slot, freeing queue space
    sids.append(server.submit(src, ref))  # now accepted
    server.drain()
    for sid in sids:
        wav, stats = server.result(sid)
        assert wav.shape[-1] > 0 and not stats["cancelled"]
    m = server.metrics()
    assert m["completed"] == 3 and m["rejected"] == 1 and m["queued"] == 0


def test_batched_admission_wave(pipe):
    """A full admission wave (4 streams into 4 free slots, one batched
    prefill+insert dispatch pair) must produce per-stream audio identical to
    single-stream runs — with heterogeneous source lengths (different
    max_new per row) and a custom sampler on ONE row of the wave (the
    batched values path). Also covers the fast-first wave variant and
    warmup_admission (pool state must be untouched by the warmup)."""
    from genvc_tpu.decode.engine import SamplerConfig
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(51)
    srcs = [(rng.standard_normal((1, n)) * 0.1).astype(np.float32)
            for n in (16000, 9000, 24000, 6000)]
    refs = [(rng.standard_normal((1, n)) * 0.1).astype(np.float32)
            for n in (24000, 30000, 24000, 24000)]
    singles = [pipe.synthesize_streaming(s, r, verbose=False)[0]
               for s, r in zip(srcs, refs)]

    for fw in (8, 4):
        old_fct = pipe.first_chunk_tokens
        try:
            pipe.first_chunk_tokens = fw
            if fw != 8:
                singles_fw = [pipe.synthesize_streaming(
                    s, r, verbose=False)[0] for s, r in zip(srcs, refs)]
            else:
                singles_fw = singles
            server = StreamServer(pipe, slots=4, first_window=fw,
                                  adm_batch=4)
            assert server._adm_buckets == (1, 2, 4)
            def snap(pool):
                return [np.asarray(
                    jax.random.key_data(x)
                    if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
                    else x) for x in jax.tree.leaves(pool)]

            pool_before = snap(server._pool)
            server.warmup_admission()
            # warmup is pure: the pool state must be bit-identical
            for a, b in zip(pool_before, snap(server._pool)):
                assert np.array_equal(a, b)
            sids = [server.submit(s, r) for s, r in zip(srcs, refs)]
            # one custom-sampler stream rides the same wave
            sid_x = None
            server.drain()
            assert server.metrics()["admissions"] == 4
            for sid, want in zip(sids, singles_fw):
                got, stats = server.result(sid)
                assert got.shape == want.shape, (fw, got.shape, want.shape)
                np.testing.assert_allclose(got, want, atol=2e-4)
        finally:
            pipe.first_chunk_tokens = old_fct

    # custom sampler inside a batched wave: greedy rows must still match
    server = StreamServer(pipe, slots=4, adm_batch=4)
    sid_g = server.submit(srcs[0], refs[0])
    sid_s = server.submit(srcs[1], refs[1], sampler=SamplerConfig(
        temperature=0.8, top_k=5, top_p=0.9, repetition_penalty=2.0,
        do_sample=True))
    sid_g2 = server.submit(srcs[2], refs[2])
    server.drain()
    for sid, want in ((sid_g, singles[0]), (sid_g2, singles[2])):
        got, _ = server.result(sid)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4)
    wav_s, _ = server.result(sid_s)
    assert wav_s.shape[0] > 0 and np.all(np.isfinite(wav_s))


def test_admission_spillback_order(pipe):
    """A wave larger than the largest bucket spills back to the queue head:
    FIFO completion order of admission (admit_t monotone in submit order)
    and correct audio for every stream."""
    from genvc_tpu.serving.server import StreamServer

    rng = np.random.default_rng(52)
    srcs = [(rng.standard_normal((1, 6000 + 2000 * i)) * 0.1
             ).astype(np.float32) for i in range(6)]
    ref = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    server = StreamServer(pipe, slots=3, adm_batch=2)
    assert server._adm_buckets == (1, 2)
    sids = [server.submit(s, ref) for s in srcs]
    server.drain()
    admit_ts = []
    for sid, src in zip(sids, srcs):
        wav, stats = server.result(sid)
        want, _, _ = pipe.synthesize_streaming(src, ref, verbose=False)
        assert wav.shape == want.shape
        np.testing.assert_allclose(wav, want, atol=2e-4)
        admit_ts.append(stats["queue_wait_s"])
    # earlier submissions never wait longer than later ones (FIFO admission)
    assert all(a <= b + 1e-6 for a, b in zip(admit_ts, admit_ts[3:]))


def test_poisson_sweep_refinement(monkeypatch):
    """The sweep's bisection probes must tighten the max-sustainable-lambda
    bracket: with a synthetic load model that passes below a threshold rate
    and fails above it, the reported max lambda lands within one bisection
    step of the threshold instead of on the coarse grid point."""
    import bench_serving

    capacity = 10.0
    threshold = 9.0  # streams/s: pass below, fail above

    def fake_load(pipe, src, ref, slots, lam, n_arrivals, seed=0,
                  max_queue=None, adm_batch=4):
        ok = lam <= threshold
        return {
            "lambda": round(lam, 3), "arrivals": n_arrivals,
            "completed": n_arrivals, "wall_s": 1.0,
            "throughput_streams_per_s": min(lam, threshold),
            "ttfa_ms_p50": 100.0 if ok else 900.0,
            "ttfa_ms_p95": 200.0 if ok else 2000.0,
            "queue_wait_ms_p95": 10.0,
            "rtf_incl_queue_p50": 0.5, "rtf_incl_queue_p95": 0.6,
            "rtf_service_p50": 0.4, "rtf_service_p95": 0.5,
            "ttfa_growth_ms": 0.0 if ok else 800.0,
            "sustained": ok,
        }

    monkeypatch.setattr(bench_serving, "poisson_load", fake_load)
    rows, max_lam = bench_serving.poisson_sweep(
        None, None, None, 8, capacity, factors=(0.75, 1.0, 1.5), refine=2)
    # grid alone would report 0.75 x 10 = 7.5; two bisections between 0.75
    # and 1.0 must reach [0.875, 0.9375] -> max sustained 8.75 or higher
    assert max_lam is not None and 8.75 <= max_lam <= threshold
    assert [r["capacity_factor"] for r in rows] == sorted(
        r["capacity_factor"] for r in rows)
    # everything passing: no probes fired beyond the grid, no bracket above
    rows2, max_lam2 = bench_serving.poisson_sweep(
        None, None, None, 8, capacity, factors=(0.5, 0.75), refine=2)
    assert max_lam2 == 7.5 and len(rows2) == 2
    # everything failing: probes halve downward below the grid
    rows3, max_lam3 = bench_serving.poisson_sweep(
        None, None, None, 8, 40.0, factors=(0.5, 1.0), refine=2)
    assert max_lam3 is None or max_lam3 <= threshold
    assert min(r["capacity_factor"] for r in rows3) < 0.5
