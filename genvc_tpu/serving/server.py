"""Continuous-batching streaming VC server: a fixed pool of decode slots on
one chip, with streams admitted and retired at 8-token tick boundaries.

The reference has no serving layer — one stream per process
(/root/reference/inference/inference_utils.py:136-217). This is TPU capacity
surface beyond the reference: the lockstep batch API
(``GenVCPipeline.synthesize_streaming_batch``) requires all streams to start
together and stalls every row on the slowest row's segment round; the server
instead keeps a ``slots``-row decode pool always ticking, admits a new
stream the moment a slot frees (per-row KV-cache insertion,
``decode.engine.insert_row``), and retires each stream independently. Decode
is HBM-bound gemv work, so pooled rows share each step's weight stream —
per-stream cost falls with pool occupancy exactly as in the lockstep sweep,
but without the barrier.

Per-stream audio semantics are identical to
``GenVCPipeline.synthesize_streaming`` with ``first_chunk_tokens=8`` (the
8-token reference cadence; parity test
``tests/test_serving.py::test_server_matches_single_stream``): same 8-token
windows, same EOS/cap remainder vocoding, same 1024-sample crossfade
assembly, same multi-segment progression.

Engine mechanics: pool rows sit at different decode depths, so the pool's
``DecodeState`` uses per-row cache positions (``init_state(per_row=True)``);
admission prefills queued streams in WAVES — up to ``adm_batch`` waiting
streams per batched segment-prefill dispatch (power-of-two buckets) plus one
batched ``insert_many`` call, amortizing the B=1-starved ContentVec/prefill
matmuls that otherwise bound the sustainable arrival rate (measured 3x
per-stream at B=4; ``warmup_admission`` pre-compiles the buckets). Every
tick is ONE device call
(``pipeline.stream_chunk_batch_fn``): 8 decode steps + the completed
8-latent window vocoded for all rows, with device->host copies started at
dispatch. Streams may carry per-request decode parameters
(``submit(sampler=SamplerConfig(...))``); the tick threads (B,) parameter
arrays through the vectorized warper chain only while some active slot has
a custom config — all-default pools tick through the cheaper scalar trace.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from genvc_tpu.decode import engine
from genvc_tpu.inference.pipeline import (CROSSFADE, STREAM_CHUNK, TEXT_WIDTH,
                                          _handle_chunk, window_accounting)
from genvc_tpu.models import gpt as gpt_model, hifigan
from genvc_tpu.ops.conv import linear_interp_x4


class QueueFull(RuntimeError):
    """``submit`` refused: the admission queue is at ``max_queue`` streams.

    Backpressure signal for producers — catch it and retry after draining
    (``step``/``drain``) or shed the request upstream."""


@dataclasses.dataclass
class _Stream:
    sid: int
    segments: list                 # [(padded_seg_16k, t_real), ...]
    cond: jnp.ndarray              # (1, 32, D) speaker latent (device)
    submit_t: float
    audio_samples: int             # true source length (16 kHz samples)
    seg_idx: int = 0
    n_total: int = 0               # tokens incl. prefill token, this segment
    max_new: int = 0
    first_tick: bool = True
    chunks: list = dataclasses.field(default_factory=list)
    overlap: np.ndarray | None = None
    latency: float | None = None
    admit_t: float | None = None   # first slot admission (queue wait ends)
    done_t: float | None = None
    on_chunk: object = None        # optional per-stream chunk callback
    callback_error: str | None = None
    sampler: object = None         # per-stream decode config (None = pipe's)


def _serving_jits(pipe):
    """Build (or fetch the cached) jitted serving programs for ``pipe``:
    single-row per-row-position segment prefill, slot insertion (state +
    carry + per-row decode params), and the pool tick. Cached on the pipe
    so repeated StreamServer construction costs no retrace;
    ``GenVCPipeline._build_jits`` clears the cache (program changes)."""
    cached = getattr(pipe, "_serving_jit_cache", None)
    if cached is not None:
        return cached

    gcfg = pipe.gpt_cfg
    sampler = pipe.sampler
    cache_dtype = pipe._cache_dtype

    @jax.jit
    def row_prefill(cv_params, cd_params, gpt_params, cond, seg16k,
                    sample_valid, rng, row_params):
        """Single-row segment prefill with per-row cache positions — the
        admission payload for ``insert_row``. ``row_params``: the stream's
        decode config as (1,) arrays (first-token sampling uses it)."""
        codes, n_codes = pipe._content_fn(cv_params, cd_params, seg16k,
                                          sample_valid)
        codes = jnp.pad(codes, ((0, 0), (0, TEXT_WIDTH - codes.shape[1])))
        prefix, valid = gpt_model.build_prefix_emb(
            gpt_params, gcfg, cond, codes, n_codes.astype(jnp.int32))
        state = engine.init_state(
            gcfg, pipe._prefix_width, 1, gcfg.heads,
            gcfg.model_dim // gcfg.heads, rng, cache_dtype=cache_dtype,
            gen_tokens=pipe._cache_gen_tokens(), per_row=True)
        return engine.prefill(gpt_params, gcfg, state, prefix, valid,
                              sampler, row_params=row_params)

    @functools.partial(jax.jit, static_argnames=("fw",))
    def row_prefill_first(cv_params, cd_params, gpt_params, hifi_params,
                          cond, seg16k, sample_valid, rng, row_params, fw):
        """Fast-first admission in ONE dispatch: segment prefill + ``fw``
        decode steps + the first ``fw``-latent window's vocode. Halves the
        per-admission dispatch count vs prefill-then-mini-tick (each
        dispatch costs a host round trip on remote-tunnel setups)."""
        codes, n_codes = pipe._content_fn(cv_params, cd_params, seg16k,
                                          sample_valid)
        codes = jnp.pad(codes, ((0, 0), (0, TEXT_WIDTH - codes.shape[1])))
        prefix, valid = gpt_model.build_prefix_emb(
            gpt_params, gcfg, cond, codes, n_codes.astype(jnp.int32))
        state = engine.init_state(
            gcfg, pipe._prefix_width, 1, gcfg.heads,
            gcfg.model_dim // gcfg.heads, rng, cache_dtype=cache_dtype,
            gen_tokens=pipe._cache_gen_tokens(), per_row=True)
        state, tok0, lat0 = engine.prefill(gpt_params, gcfg, state, prefix,
                                           valid, sampler,
                                           row_params=row_params)
        state, toks, lats, pre_fin = engine.decode_chunk(
            gpt_params, gcfg, state, sampler, chunk=fw,
            row_params=row_params)
        all_lats = jnp.concatenate([lat0[:, None, :], lats], axis=1)
        x = jnp.swapaxes(all_lats[:, :fw], 1, 2)
        x = linear_interp_x4(x, pipe.hifigan_scale_factor)
        wav = hifigan.generator_forward(hifi_params, x,
                                        pipe.config.vocoder_config)[:, 0]
        return state, toks, all_lats, pre_fin, wav

    @jax.jit
    def insert_many_fn(pool, rows, slots, carry, lat_rows, pool_params,
                       row_values):
        """Admit a wave of prefilled rows (``rows``: a DecodeState holding
        B rows from one batched prefill dispatch) into the B ``slots``:
        per-row cache insertion, each prefill latent becomes its slot's
        window carry, and each slot's decode params are set to its stream's
        config — ONE device call for the whole wave (see
        ``StreamServer._admit``)."""
        b = rows.last_token.shape[0]
        z = jnp.int32(0)

        def body(i, acc):
            pool, carry, params = acc
            row = engine.DecodeState(
                cache_k=jax.lax.dynamic_slice_in_dim(rows.cache_k, i, 1, 1),
                cache_v=jax.lax.dynamic_slice_in_dim(rows.cache_v, i, 1, 1),
                key_valid=jax.lax.dynamic_slice_in_dim(rows.key_valid,
                                                       i, 1, 0),
                cur_index=jax.lax.dynamic_slice_in_dim(rows.cur_index,
                                                       i, 1, 0),
                n_generated=jax.lax.dynamic_slice_in_dim(rows.n_generated,
                                                         i, 1, 0),
                last_token=jax.lax.dynamic_slice_in_dim(rows.last_token,
                                                        i, 1, 0),
                seen=jax.lax.dynamic_slice_in_dim(rows.seen, i, 1, 0),
                finished=jax.lax.dynamic_slice_in_dim(rows.finished, i, 1, 0),
                rng=rows.rng)
            s = slots[i]
            pool = engine.insert_row(pool, row, s)
            lat = jax.lax.dynamic_slice_in_dim(lat_rows, i, 1, 0)
            carry = jax.lax.dynamic_update_slice(
                carry, lat[:, None, :].astype(carry.dtype), (s, z, z))
            params = {
                k: jax.lax.dynamic_update_slice(
                    params[k],
                    jax.lax.dynamic_slice_in_dim(row_values[k], i, 1, 0),
                    (s,))
                for k in params
            }
            return (pool, carry, params)

        return jax.lax.fori_loop(0, b, body, (pool, carry, pool_params))

    pipe._serving_jit_cache = (row_prefill, row_prefill_first,
                               insert_many_fn)
    return pipe._serving_jit_cache


class _AdmResult:
    """Device results of one (possibly batched) fast-first admission
    dispatch, shared by the slots admitted in that wave; fetched to host at
    most once (the first slot processed pays the copy, the rest read it)."""

    __slots__ = ("toks", "all_lats", "pre_fin", "wavs", "_np")

    def __init__(self, toks, all_lats, pre_fin, wavs):
        self.toks, self.all_lats = toks, all_lats
        self.pre_fin, self.wavs = pre_fin, wavs
        self._np = None

    def ready(self) -> bool:
        if self._np is not None:
            return True
        try:
            return (self.toks.is_ready() and self.pre_fin.is_ready()
                    and self.wavs.is_ready())
        except Exception:
            return False  # no readiness API: the forced path handles it

    def fetch(self):
        if self._np is None:
            self._np = jax.device_get((self.toks, self.pre_fin, self.wavs))
        return self._np


class StreamServer:
    """Slot-pool server over a built ``GenVCPipeline``.

    Usage::

        server = StreamServer(pipe, slots=8)
        sid = server.submit(src_wav, ref_audio)   # any time
        server.step()                             # admit + one 8-token tick
        ...
        server.drain()                            # run until all streams done
        wav, stats = server.result(sid)
    """

    def __init__(self, pipe, slots: int = 8, depth: int = 2, mesh=None,
                 max_queue: int | None = None,
                 first_window: int | None = None, adm_batch: int = 4):
        """``mesh`` (optional ``jax.sharding.Mesh``): shard the slot pool
        over the mesh's FIRST axis — scale-out serving, slots/chips rows per
        chip. Decode has no cross-row ops, so GSPMD partitions the tick
        program cleanly on the batch axis; admissions (``insert_row`` at a
        traced slot index) lower to a masked update on the owning shard.
        ``slots`` must divide evenly over the axis. Validated on the virtual
        8-device CPU mesh (tests/test_multichip.py::test_sharded_stream_server).

        ``max_queue`` (optional): cap on WAITING streams (excluding active
        slots); a ``submit`` past the cap raises :class:`QueueFull` before
        any device work — the backpressure surface for long-running servers
        (an unbounded queue grows host memory and admission latency without
        bound under overload).

        ``first_window`` (default: the pipeline's ``first_chunk_tokens``,
        reference-exact 8-token windows at ``STREAM_CHUNK``): size in AR
        tokens of each stream's FIRST emitted window. Values below
        STREAM_CHUNK activate admission-time fast-first: the admitting host
        runs one single-row mini-tick (``first_window`` decode steps + that
        window's vocode) and emits the stream's first audio BEFORE the row
        enters the shared pool — time-to-first-audio stops paying for a full
        8-token pool tick plus the in-flight pipeline depth. Later windows
        (and later segments) keep the 8-token pool cadence; per-stream audio
        matches ``synthesize_streaming`` with ``first_chunk_tokens ==
        first_window`` (parity test tests/test_serving.py). Costs one extra
        dispatch + host sync per admission.

        ``adm_batch`` (default 4): maximum admission wave size. When several
        streams are waiting and slots are free, up to ``adm_batch`` of them
        are prefilled in ONE batched dispatch (power-of-two buckets) instead
        of one dispatch each. Per-admission device time is dominated by
        B=1-starved ContentVec/prefill matmuls and the HBM weight stream of
        the fast-first decode steps, both of which batching amortizes — the
        difference between a pool that saturates on admissions and one that
        saturates on decode (measured: the sustainable Poisson arrival rate
        bound, bench_serving). ``adm_batch=1`` restores per-stream
        admissions. Call :meth:`warmup_admission` to pre-compile the bucket
        programs before serving live traffic."""
        self.pipe = pipe
        self.slots = int(slots)
        ab = max(1, int(adm_batch))
        # power-of-two buckets <= adm_batch: bounded compile count, and a
        # wave of any size admits in <= log2(adm_batch)+1 dispatches
        self._adm_buckets = tuple(b for b in (1, 2, 4, 8, 16, 32)
                                  if b <= ab)
        fw = (pipe.first_chunk_tokens if first_window is None
              else int(first_window))
        self.first_window = max(1, min(int(fw), STREAM_CHUNK))
        self.max_queue = None if max_queue is None else int(max_queue)
        # ticks kept in flight (double buffering): the host processes tick N
        # while tick N+1 computes on device, hiding the dispatch/fetch round
        # trip. A row admitted while ticks are in flight simply has its stale
        # in-flight data skipped (per-slot epoch counters) — it costs up to
        # depth-1 wasted row-ticks per admission, nothing in correctness.
        # depth=1 = fully synchronous (lowest admission latency).
        self.depth = max(1, int(depth))
        self._queue: deque[_Stream] = deque()
        self._slot_map: dict[int, _Stream] = {}
        self._free = list(range(self.slots))
        self._results: dict[int, tuple[np.ndarray, dict]] = {}
        self._next_sid = 0
        self._inflight: deque = deque()   # (tick result, epoch snapshot)
        # fast-first admission mini-tick results awaiting host processing,
        # keyed by slot (see _start_segment/_process_admission)
        self._pending_adm: dict[int, tuple] = {}
        self._slot_epoch = [0] * self.slots
        self._cancelled: set[int] = set()
        # slots whose stream carries a custom SamplerConfig — when none do,
        # ticks dispatch the scalar-sampler trace (cheaper warper chain)
        self._slot_custom = [False] * self.slots
        # aggregate pool counters (metrics())
        self._n_ticks = 0
        self._occupancy_sum = 0
        self._n_admissions = 0
        self._n_completed = 0
        self._n_cancelled = 0
        self._n_rejected = 0

        gcfg = pipe.gpt_cfg
        cache_dtype = pipe._cache_dtype

        pool = engine.init_state(
            gcfg, pipe._prefix_width, self.slots, gcfg.heads,
            gcfg.model_dim // gcfg.heads, pipe._next_rng(),
            cache_dtype=cache_dtype, gen_tokens=pipe._cache_gen_tokens(),
            per_row=True)
        # never-occupied slots still tick; give them one valid key so their
        # attention softmax is defined (all-masked keys -> NaN latents, which
        # are harmless but pollute profiles/debugging) and mark them finished
        pool = pool._replace(
            key_valid=pool.key_valid.at[:, 0].set(True),
            finished=jnp.ones((self.slots,), bool))
        carry = jnp.zeros((self.slots, 1, gcfg.model_dim), jnp.float32)
        # per-slot decode params (per-request generation config); idle slots
        # hold the pipeline defaults
        row_params = {
            k: jnp.broadcast_to(v, (self.slots,) + v.shape[1:]).copy()
            for k, v in self._sampler_values(pipe.sampler).items()
        }
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            if self.slots % mesh.shape[axis] != 0:
                raise ValueError(
                    f"slots={self.slots} must divide over mesh axis "
                    f"'{axis}' ({mesh.shape[axis]} devices)")
            row = NamedSharding(mesh, P(axis))            # (B, ...) leaves
            pool = engine.DecodeState(
                cache_k=jax.device_put(
                    pool.cache_k, NamedSharding(mesh, P(None, axis))),
                cache_v=jax.device_put(
                    pool.cache_v, NamedSharding(mesh, P(None, axis))),
                key_valid=jax.device_put(pool.key_valid, row),
                cur_index=jax.device_put(pool.cur_index, row),
                n_generated=jax.device_put(pool.n_generated, row),
                last_token=jax.device_put(pool.last_token, row),
                seen=jax.device_put(pool.seen, row),
                finished=jax.device_put(pool.finished, row),
                rng=jax.device_put(pool.rng, NamedSharding(mesh, P())))
            carry = jax.device_put(carry, row)
            row_params = {k: jax.device_put(v, row)
                          for k, v in row_params.items()}
        self._pool = pool
        self._carry = carry
        self._row_params = row_params
        # pre-compile the EOS-remainder tail programs: the tick geometry
        # (W = STREAM_CHUNK + 1: one carried latent + 8 decoded) and, when
        # fast-first admission is active, the admission mini-tick geometry
        # (B=1, W = first_window + 1) — so no stream's final window pays a
        # compile mid-serve
        try:
            pipe._vocode_tail_fn(
                pipe.hifigan_params,
                jnp.zeros((self.slots, STREAM_CHUNK + 1, gcfg.model_dim),
                          jnp.float32),
                0, 0, 1, win=STREAM_CHUNK)
            if self.first_window < STREAM_CHUNK:
                pipe._vocode_tail_fn(
                    pipe.hifigan_params,
                    jnp.zeros((1, self.first_window + 1, gcfg.model_dim),
                              jnp.float32),
                    0, 0, 1, win=self.first_window)
        except Exception:
            pass

    # the serving jits are cached on the pipeline (one trace per pipe,
    # shared by every server instance) and resolved at CALL time, so a
    # pipe._build_jits() rebuild (sampler change) is picked up here exactly
    # like the tick program is — never a stale-sampler prefill
    @property
    def _row_prefill(self):
        return _serving_jits(self.pipe)[0]

    @property
    def _row_prefill_first(self):
        return _serving_jits(self.pipe)[1]

    @property
    def _insert_many_fn(self):
        return _serving_jits(self.pipe)[2]

    @staticmethod
    def _sampler_values(sampler) -> dict:
        """A SamplerConfig as the (1,) device arrays row_params expects."""
        return {
            "temperature": jnp.asarray([sampler.temperature], jnp.float32),
            "top_k": jnp.asarray([sampler.top_k], jnp.int32),
            "top_p": jnp.asarray([sampler.top_p], jnp.float32),
            "repetition_penalty": jnp.asarray([sampler.repetition_penalty],
                                              jnp.float32),
            "do_sample": jnp.asarray([sampler.do_sample], bool),
        }

    # ------------------------------------------------------------- submit

    def submit(self, src_wav: np.ndarray, ref_audio: np.ndarray,
               on_chunk=None, sampler=None,
               arrival_t: float | None = None) -> int:
        """Register a stream (any time). The reference conditioning latent is
        computed immediately (one dispatch); decoding starts when a slot
        frees at the next ``step``.

        ``on_chunk(sid, chunk)`` (optional) is called with each crossfaded
        24 kHz audio chunk as it is emitted — the live-streaming delivery
        path. A raising callback is disabled for that stream and recorded in
        its result stats (``callback_error``); synthesis continues.

        ``sampler`` (optional ``SamplerConfig``) sets THIS stream's decode
        parameters (temperature/top_k/top_p/repetition_penalty/do_sample) —
        per-request generation config; rows decode under their own params in
        the shared pool tick. Default: the pipeline's sampler.

        ``arrival_t`` (optional ``time.perf_counter()`` timestamp) backdates
        the stream's arrival: latency/queue-wait/RTF stats are measured from
        it instead of the ``submit`` call time. Pass the moment the request
        actually arrived upstream (proxy receive time, scheduled arrival in a
        load generator) so a busy host loop submitting late doesn't hide the
        wait — the coordinated-omission correction.

        Raises :class:`QueueFull` (before any device work) when the server
        was built with ``max_queue`` and that many streams are waiting."""
        if (self.max_queue is not None
                and len(self._queue) >= self.max_queue):
            self._n_rejected += 1
            raise QueueFull(
                f"admission queue full ({len(self._queue)} waiting >= "
                f"max_queue={self.max_queue}); drain with step() or retry")
        sid = self._next_sid
        self._next_sid += 1
        stream = _Stream(
            sid=sid,
            segments=list(self.pipe._segments(src_wav)),
            cond=self.pipe.get_gpt_cond_latents(ref_audio),
            submit_t=(time.perf_counter() if arrival_t is None
                      else float(arrival_t)),
            audio_samples=int(src_wav.shape[-1]),
            on_chunk=on_chunk,
            sampler=sampler)
        if not stream.segments:  # zero-length source: retire immediately
            self._results[sid] = (np.zeros((0,), np.float32), {
                "latency_s": None, "queue_wait_s": None, "service_s": None,
                "wall_s": 0.0, "audio_s": 0.0, "rtf": None,
                "rtf_service": None, "callback_error": None,
                "cancelled": False})
            return sid
        self._queue.append(stream)
        return sid

    # ---------------------------------------------------------- admission

    def _start_segment(self, stream: _Stream, slot: int):
        """Prefill the stream's current segment and insert it into ``slot``
        (single-stream wave — segment advances and adm_batch=1 admissions)."""
        self._start_segments([stream], [slot])

    def _start_segments(self, streams: list, slots: list):
        """Prefill one segment per stream and insert the rows into ``slots``
        — ONE batched prefill dispatch + ONE batched insert for the whole
        wave (``len(streams)`` is a compiled bucket size, see ``_admit``).

        With fast-first active (``first_window < STREAM_CHUNK``, segment 0
        only — later segments are not latency-critical, same rule as the
        single-stream driver), the dispatch additionally decodes
        ``first_window`` tokens and vocodes each stream's first window; rows
        enter the pool carrying latent ``fw`` so pool ticks continue the
        exact window alignment of ``synthesize_streaming`` with
        ``first_chunk_tokens == fw``. The mini-tick result is NOT fetched
        here — admission stays fully asynchronous (a blocking fetch per
        admission would serialize the host and cost drain throughput); it is
        recorded per slot in ``_pending_adm`` (one shared
        :class:`_AdmResult` per wave) and processed by ``step()``
        opportunistically (``is_ready``) or forcibly before consuming any
        pool-tick data for the slot. A segment that ends inside the
        admission window is detected there and the slot advanced then.

        Waves mirror the batch decode paths' rng semantics: the wave shares
        one rng fold, exactly like rows of a pool tick or of
        ``synthesize_streaming_batch`` share theirs."""
        pipe = self.pipe
        fw = self.first_window
        b = len(streams)
        segs, t_reals, conds, values_l = [], [], [], []
        for s in streams:
            seg, t_real = s.segments[s.seg_idx]
            s.max_new = pipe._max_new(pipe._host_n_codes(t_real))
            segs.append(pipe._pcm16(seg))
            t_reals.append(t_real)
            conds.append(s.cond)
            values_l.append(self._sampler_values(s.sampler or pipe.sampler))
        seg16k = jnp.asarray(segs[0] if b == 1 else np.concatenate(segs, 0))
        t_arr = jnp.asarray(t_reals, jnp.int32)
        cond = conds[0] if b == 1 else jnp.concatenate(conds, 0)
        values = (values_l[0] if b == 1 else
                  {k: jnp.concatenate([v[k] for v in values_l])
                   for k in values_l[0]})
        pending = None
        if streams[0].seg_idx == 0 and fw < STREAM_CHUNK:
            # ONE dispatch: prefills + fw decode steps + first-window vocodes
            rows, toks, all_lats, pre_fin, wavs = self._row_prefill_first(
                pipe.contentvec_params, pipe.content_dvae_params,
                pipe.gpt_params, pipe.hifigan_params, cond, seg16k, t_arr,
                pipe._next_rng(), values, fw=fw)
            try:
                toks.copy_to_host_async()
                pre_fin.copy_to_host_async()
                wavs.copy_to_host_async()
            except Exception:
                pass
            pending = _AdmResult(toks, all_lats, pre_fin, wavs)
            lat_rows = all_lats[:, fw, :]        # latent fw: next window's carry
            for s in streams:
                s.n_total = 1 + fw
                s.first_tick = False             # prefill EOS handled async
        else:
            rows, tok0, lat_rows = self._row_prefill(
                pipe.contentvec_params, pipe.content_dvae_params,
                pipe.gpt_params, cond, seg16k, t_arr, pipe._next_rng(),
                values)
            for s in streams:
                s.n_total = 1
                s.first_tick = True
        self._pool, self._carry, self._row_params = self._insert_many_fn(
            self._pool, rows, jnp.asarray(slots, jnp.int32), self._carry,
            lat_rows, self._row_params, values)
        for i, (s, slot) in enumerate(zip(streams, slots)):
            self._slot_epoch[slot] += 1  # in-flight ticks for the slot: stale
            self._slot_custom[slot] = s.sampler is not None
            if pending is not None:
                self._pending_adm[slot] = (pending, i)

    def _process_admission(self, slot: int, force: bool):
        """Consume the pending fast-first admission result for ``slot``:
        emit the first window (and the EOS tail when the segment ended
        inside it, advancing the slot). ``force=False`` returns without
        blocking when the device result is not on host yet; ``force=True``
        fetches — only used once a LATER-dispatched pool tick has completed,
        so the fetch is a local copy, never a device wait. Slots admitted in
        one wave share the :class:`_AdmResult`; row ``i`` is this slot's."""
        ent = self._pending_adm.get(slot)
        if ent is None:
            return
        rec, i = ent
        if not force and not rec.ready():
            return
        del self._pending_adm[slot]
        s = self._slot_map[slot]
        if s.sid in self._cancelled:
            return  # the tick loop's cancel branch retires the stream
        pipe = self.pipe
        fw = self.first_window
        stop = pipe.gpt_cfg.stop_audio_token
        toks_np, pre_np, wavs_np = rec.fetch()
        if bool(pre_np[i, 0]):
            # EOS at the prefill-sampled token: vocode just its latent
            wav = pipe._vocode_tail_fn(pipe.hifigan_params, rec.all_lats,
                                       i, 0, 1, win=fw)
            self._emit(s, np.asarray(wav)[0, : pipe.gpt_cfg.code_stride_len])
            self._advance(s, slot)
            return
        eos_j, n_lat_valid, full, rem = window_accounting(
            toks_np[i], 1, s.max_new, stop, carry_n=1, win=fw)
        if full >= 1:
            self._emit(s, wavs_np[i])
        if eos_j is not None:
            if rem > 0:
                wav = pipe._vocode_tail_fn(
                    pipe.hifigan_params, rec.all_lats, i, full * fw, rem,
                    win=fw)
                self._emit(s, np.asarray(wav)
                           [0, : rem * pipe.gpt_cfg.code_stride_len])
            self._advance(s, slot)

    def _admit(self):
        while self._queue and self._free:
            # pop the next admission WAVE: up to the largest bucket that
            # fits the waiting streams and the free slots, admitted in one
            # batched prefill+insert dispatch pair; leftovers (wave size not
            # a bucket) go back to the queue head and admit on the next loop
            # iteration at a smaller bucket — FIFO order is preserved
            cap = min(len(self._free), self._adm_buckets[-1])
            wave = []
            while self._queue and len(wave) < cap:
                stream = self._queue.popleft()
                if stream.sid in self._cancelled:
                    self._finalize(stream, cancelled=True)
                    continue
                wave.append(stream)
            if not wave:
                continue
            b = max(x for x in self._adm_buckets if x <= len(wave))
            for s in reversed(wave[b:]):
                self._queue.appendleft(s)
            wave = wave[:b]
            slots = [self._free.pop(0) for _ in wave]
            now = time.perf_counter()
            for s, slot in zip(wave, slots):
                self._slot_map[slot] = s
                self._n_admissions += 1
                if s.admit_t is None:
                    s.admit_t = now
            self._start_segments(wave, slots)

    def warmup_admission(self, buckets=None):
        """Pre-compile every admission-path program this server can
        dispatch: the (batched) segment prefill for each wave bucket, the
        batched insert, and the fast-first EOS-tail vocode at each wave
        width. Call once before serving live traffic — otherwise the first
        wave of each size pays its compile mid-serve (tens of seconds on a
        fresh cache) and every stream queued behind it inherits that wait as
        fake TTFA. Results are discarded; the pool state is NOT mutated
        (the jitted programs are pure and cached on the pipeline, so one
        warmed server warms every server over the same pipe)."""
        pipe = self.pipe
        fw = self.first_window
        fastfirst = fw < STREAM_CHUNK
        width = pipe._seg_len_16k
        zseg = pipe._pcm16(np.zeros((1, width), np.float32))
        cond1 = pipe.get_gpt_cond_latents(
            np.zeros((1, pipe.sample_rate), np.float32))
        vals1 = self._sampler_values(pipe.sampler)
        want = [b for b in (buckets or self._adm_buckets) if b <= self.slots]
        if fastfirst and 1 not in want:
            want.append(1)  # segment advances always prefill at B=1
        for b in sorted(want):
            seg16k = jnp.asarray(np.concatenate([zseg] * b, 0))
            t_arr = jnp.asarray([width] * b, jnp.int32)
            cond = cond1 if b == 1 else jnp.concatenate([cond1] * b, 0)
            vals = (vals1 if b == 1 else
                    {k: jnp.concatenate([vals1[k]] * b) for k in vals1})
            if fastfirst:
                rows, toks, all_lats, pre_fin, wavs = self._row_prefill_first(
                    pipe.contentvec_params, pipe.content_dvae_params,
                    pipe.gpt_params, pipe.hifigan_params, cond, seg16k,
                    t_arr, pipe._next_rng(), vals, fw=fw)
                lat_rows = all_lats[:, fw, :]
                # EOS inside the admission window vocodes a tail at this
                # wave width (B=b, fw+1 latents)
                pipe._vocode_tail_fn(pipe.hifigan_params, all_lats, 0, 0, 1,
                                     win=fw)
                if b == 1:  # later segments of a fast-first stream
                    self._row_prefill(
                        pipe.contentvec_params, pipe.content_dvae_params,
                        pipe.gpt_params, cond, seg16k, t_arr,
                        pipe._next_rng(), vals)
            else:
                rows, tok0, lat_rows = self._row_prefill(
                    pipe.contentvec_params, pipe.content_dvae_params,
                    pipe.gpt_params, cond, seg16k, t_arr, pipe._next_rng(),
                    vals)
            out = self._insert_many_fn(
                self._pool, rows, jnp.arange(b, dtype=jnp.int32),
                self._carry, lat_rows, self._row_params, vals)
            jax.block_until_ready(out)

    def cancel(self, sid: int):
        """Cancel a stream. Queued: finalized (empty) at the next admit
        pass; active: its slot frees at the next processed tick; finished:
        no-op. The result keeps whatever audio was emitted, with
        ``stats['cancelled'] = True``."""
        if sid not in self._results:
            self._cancelled.add(sid)

    # -------------------------------------------------------------- ticks

    def _dispatch_tick(self):
        pipe = self.pipe
        self._n_ticks += 1
        self._occupancy_sum += len(self._slot_map)
        k = STREAM_CHUNK
        # the common all-default pool ticks through the scalar-sampler trace
        # (identity warpers elided at trace time); per-row params are only
        # threaded when some active slot carries a custom config
        rp = self._row_params if any(self._slot_custom) else None
        res = pipe._stream_chunk_batch_fn(
            pipe.gpt_params, pipe.hifigan_params, self._pool, k, self._carry,
            win=k, row_params=rp)
        st, toks, all_lats, pre_fin, wavs = res
        self._pool = st
        self._carry = all_lats[:, k : k + 1]
        try:
            toks.copy_to_host_async()
            pre_fin.copy_to_host_async()
            wavs.copy_to_host_async()
        except Exception:
            pass
        self._inflight.append((res, list(self._slot_epoch)))

    def step(self) -> bool:
        """Admit pending streams, keep ``depth`` 8-token pool ticks in
        flight, and process the oldest tick's results (one device fetch).
        Returns False when the pool is idle and the queue empty."""
        self._admit()
        # emit any fast-first admission window whose result already reached
        # the host (non-blocking; the forced path below covers the rest)
        for slot in list(self._pending_adm):
            self._process_admission(slot, force=False)
        if not self._slot_map and not self._inflight:
            return False
        while self._slot_map and len(self._inflight) < self.depth:
            self._dispatch_tick()
        if not self._inflight:
            return False
        (st, toks, all_lats, pre_fin, wavs), epochs = \
            self._inflight.popleft()
        toks_np, pre_fin_np, wavs_np = jax.device_get((toks, pre_fin, wavs))

        pipe = self.pipe
        k = STREAM_CHUNK
        stop = pipe.gpt_cfg.stop_audio_token
        for slot in sorted(self._slot_map):
            if slot in self._pending_adm:
                # the admission window must be emitted before (and its EOS
                # handling decided ahead of) any tick data for this slot;
                # the tick we just fetched was dispatched after the
                # admission, so the forced fetch is already on host
                self._process_admission(slot, force=True)
                if slot not in self._slot_map:
                    continue  # segment ended at admission; stream retired
                # a segment advance re-inserted the slot: the epoch check
                # below skips this tick's (stale) row data for it
            s = self._slot_map[slot]
            if s.sid in self._cancelled:
                self._finalize(s, cancelled=True)
                del self._slot_map[slot]
                self._pending_adm.pop(slot, None)
                self._slot_custom[slot] = False
                self._free.append(slot)
                self._free.sort()
                continue
            if epochs[slot] != self._slot_epoch[slot]:
                # this tick was dispatched before the slot's current stream/
                # segment was inserted — its row data belongs to the previous
                # occupant (already finalized); skip
                continue
            seg_done = False
            if s.first_tick and bool(pre_fin_np[slot, 0]):
                # EOS at the prefill-sampled token: vocode just its latent
                # (reference behavior; pipeline._synthesize_streaming)
                wav = pipe._vocode_tail_fn(pipe.hifigan_params, all_lats,
                                           slot, 0, 1, win=k)
                self._emit(s, np.asarray(wav)
                           [0, : pipe.gpt_cfg.code_stride_len])
                seg_done = True
            else:
                # every tick carries exactly one latent (the prefill/window
                # boundary token), decodes k=win tokens, and emits at most
                # one full window — the same accounting as the single-stream
                # driver with carry_n=1
                eos_j, n_lat_valid, full, rem = window_accounting(
                    toks_np[slot], s.n_total, s.max_new, stop, carry_n=1,
                    win=k)
                if full >= 1:
                    self._emit(s, wavs_np[slot, 0])
                if eos_j is not None:
                    if rem > 0:
                        wav = pipe._vocode_tail_fn(
                            pipe.hifigan_params, all_lats, slot, full * k,
                            rem, win=k)
                        self._emit(s, np.asarray(wav)
                                   [0, : rem * pipe.gpt_cfg.code_stride_len])
                    seg_done = True
                else:
                    s.n_total += k
            s.first_tick = False
            if seg_done:
                self._advance(s, slot)
        return True

    def _emit(self, s: _Stream, wav_window: np.ndarray):
        chunk, s.overlap = _handle_chunk(np.asarray(wav_window), s.overlap,
                                         CROSSFADE)
        s.chunks.append(chunk)
        if s.latency is None:
            s.latency = time.perf_counter() - s.submit_t
        if s.on_chunk is not None:
            try:
                s.on_chunk(s.sid, chunk)
            except Exception as e:  # a client callback must not kill the pool
                s.callback_error = f"{type(e).__name__}: {e}"
                s.on_chunk = None

    def _finalize(self, s: _Stream, cancelled: bool = False):
        s.done_t = time.perf_counter()
        wav = (np.concatenate(s.chunks, axis=-1) if s.chunks
               else np.zeros((0,), np.float32))
        wall = s.done_t - s.submit_t
        audio_s = s.audio_samples / self.pipe.content_sample_rate
        queue_wait = (s.admit_t - s.submit_t if s.admit_t is not None
                      else None)
        service = (s.done_t - s.admit_t if s.admit_t is not None else None)
        self._results[s.sid] = (wav, {
            "latency_s": s.latency,          # submit -> first audio (incl. queue)
            "queue_wait_s": queue_wait,      # submit -> slot admission
            "service_s": service,            # admission -> retirement
            "wall_s": wall,
            "audio_s": audio_s,
            "rtf": wall / audio_s if audio_s > 0 else None,
            # RTF excluding queue wait — the per-stream processing number a
            # capacity planner compares against 1.0
            "rtf_service": (service / audio_s
                            if service is not None and audio_s > 0 else None),
            "callback_error": s.callback_error,
            "cancelled": cancelled,
        })
        self._n_completed += 1
        if cancelled:
            self._n_cancelled += 1
        self._cancelled.discard(s.sid)

    def _advance(self, s: _Stream, slot: int):
        s.seg_idx += 1
        if s.seg_idx < len(s.segments) and s.sid not in self._cancelled:
            # later segments always enter the pool (fast-first is segment-0
            # only), so one _start_segment suffices
            self._start_segment(s, slot)
            return
        self._finalize(s, cancelled=s.sid in self._cancelled)
        del self._slot_map[slot]
        self._pending_adm.pop(slot, None)
        self._slot_custom[slot] = False
        self._free.append(slot)
        self._free.sort()

    # ------------------------------------------------------------ results

    def drain(self):
        """Run ticks until every submitted stream has retired."""
        while self.step():
            pass

    def finished(self, sid: int) -> bool:
        return sid in self._results

    def result(self, sid: int):
        """(wav, stats) for a finished stream; stats: latency_s (submit ->
        first audio), wall_s, audio_s, rtf (wall/audio incl. queue wait),
        callback_error."""
        return self._results[sid]

    def pop_result(self, sid: int):
        """Like :meth:`result` but releases the stored wav — call this in a
        long-running server so retired streams don't accumulate."""
        return self._results.pop(sid)

    def metrics(self) -> dict:
        """Aggregate pool snapshot for monitoring: tick count, mean slot
        occupancy over dispatched ticks, admissions/completions/cancels,
        current queue depth and active slots."""
        return {
            "slots": self.slots,
            "ticks": self._n_ticks,
            "mean_occupancy": (self._occupancy_sum / self._n_ticks
                               if self._n_ticks else 0.0),
            "admissions": self._n_admissions,
            "completed": self._n_completed,
            "cancelled": self._n_cancelled,
            "rejected": self._n_rejected,
            "queued": len(self._queue),
            "active": len(self._slot_map),
            "pending_results": len(self._results),
        }
