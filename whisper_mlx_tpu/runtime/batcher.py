"""Continuous batching for transcription serving.

The reference serializes ALL generation behind one asyncio.Lock (reference
``daemon/server.py:280,743``; SURVEY.md §2.4 calls this the opposite of
parallelism). On TPU the economics invert: a decode step for 8 windows
costs nearly the same as for 1, so the serving path batches windows
ACROSS requests:

    request A (90 s audio) → 3 windows ┐
    request B (30 s audio) → 1 window  ├─→ one batch of ≤B windows
    request C (60 s audio) → 2 windows ┘    → one encode + one decode loop

A single worker drains a queue of window jobs, pads the batch to the fixed
compile shape, runs the jitted pipeline once, and resolves per-request
futures as their windows complete. Latency knob: ``max_wait_ms`` bounds how
long a lone window waits for company.

Semantics match ``transcribe(batch_windows=True)`` (fixed-stride windows,
no conditioning on previous text — the reference launcher's configuration,
reference ``run:5``).

Multi-chip: pass ``mesh=`` (``parallel.mesh.make_mesh``) and each flushed
batch is DP-sharded over the mesh's "dp" axis — one decode loop spans all
chips, token-identical to single-device (GSPMD changes layout, not math).
"""

from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.audio.mel import HOP_LENGTH, N_FRAMES, N_SAMPLES, SAMPLE_RATE, log_mel_spectrogram
from whisper_mlx_tpu.decoding.task import DecodingOptions, decode
from whisper_mlx_tpu.models.whisper import encode


@dataclass
class _WindowJob:
    request_id: int
    window_idx: int
    mel: jax.Array  # (3000, n_mels), device-resident (never fetched to host)
    time_offset: float


@dataclass
class _Request:
    n_windows: int
    results: dict[int, Any] = field(default_factory=dict)
    done: asyncio.Future = None  # type: ignore[assignment]
    events: asyncio.Queue | None = None  # per-window completions (streaming)


class TranscriptionBatcher:
    """Cross-request window batcher over one whisper model."""

    def __init__(
        self,
        params,
        config,
        tokenizer,
        batch_size: int | tuple[int, ...] | list[int] = 8,
        max_wait_ms: float = 50.0,
        decoding: DecodingOptions | None = None,
        mesh=None,  # jax.sharding.Mesh — multi-chip DP over windows
        idle_gap_ms: float = 25.0,
    ) -> None:
        self.config = config
        self.tokenizer = tokenizer
        # Multi-chip serving (SURVEY.md §2.4 — replaces the reference's
        # single-writer lock, reference daemon/server.py:280): params are
        # committed to the mesh (TP-split for fp trees, replicated for
        # quantized; whisper fits one chip so DP over windows is the
        # scaling axis) and every flushed window batch is sharded over
        # "dp". Tokens are identical to single-device execution
        # (tests/test_batcher.py::test_batcher_mesh_token_identical).
        self.mesh = mesh
        self._dp = int(mesh.shape.get("dp", 1)) if mesh is not None else 1
        if mesh is not None:
            from whisper_mlx_tpu.parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.params = params
        # batch-size BUCKETS: each is one compiled decode executable; a
        # flush rides the smallest bucket that fits its jobs, so a lone
        # 1-window request doesn't pay the largest compile shape's cost
        if isinstance(batch_size, int):
            batch_size = (batch_size,)
        # each bucket must divide evenly over "dp" — round up
        dp = self._dp
        self.buckets = tuple(sorted({-(-b // dp) * dp for b in batch_size}))
        self.batch_size = self.buckets[-1]
        self.max_wait_ms = max_wait_ms
        self.idle_gap_ms = idle_gap_ms
        self.decoding = decoding or DecodingOptions()
        self._queue: asyncio.Queue[_WindowJob] = asyncio.Queue()
        self._requests: dict[int, _Request] = {}
        self._next_id = 0
        self._worker: asyncio.Task | None = None
        self.stats = {"batches": 0, "windows": 0, "fill_sum": 0.0}

    # -- public API ---------------------------------------------------------

    async def transcribe(self, audio: np.ndarray) -> dict[str, Any]:
        """Enqueue all windows of ``audio``; resolves when every window is
        decoded. Returns the reference transcription dict. Raises the
        worker's exception if the batch it rode in failed (the next request
        restarts the worker — same drain discipline as batch_engine)."""
        req_id, request = await self._enqueue(audio)
        try:
            results = await request.done
        finally:
            del self._requests[req_id]
        # segment assembly (per-token BPE decode) is pure-Python host work —
        # run it off the event loop so the loop keeps collecting/flushing
        # batches for concurrent requests while this response is built
        return await asyncio.to_thread(self._assemble, results)

    async def stream_transcribe(self, audio: np.ndarray):
        """Progressive transcription: yields each window's segments as soon
        as that window decodes (BASELINE config 5 streaming stretch)."""
        req_id, request = await self._enqueue(audio)
        try:
            emitted = 0
            while emitted < request.n_windows:
                item = await request.events.get()
                if isinstance(item, BaseException):  # worker failure
                    raise item
                emitted += 1
                w, (time_offset, result) = item
                partial = self._assemble({w: (time_offset, result)})
                yield {"window": w, "of": request.n_windows,
                       "segments": partial["segments"], "text": partial["text"]}
        finally:
            del self._requests[req_id]

    async def _enqueue(self, audio: np.ndarray) -> tuple[int, "_Request"]:
        # mel stays DEVICE-RESIDENT: through the axon relay a host fetch of
        # the full mel (~6 MB/120 s request) plus _launch's re-upload of the
        # stacked batch (~86 MB at B=56) dominated the serving wall at
        # saturation (host-bound 123 RTF vs 320 raw, docs/performance.md).
        # JAX shapes are static, so the window count needs no fetch; windows
        # are device slices and _launch stacks them on device.
        self._ensure_worker()
        audio = np.asarray(audio)
        if audio.dtype == np.int16:
            # raw-PCM16 upload (audio.decode.load_audio_pcm16): half the f32
            # bytes over the relay; the /2^15 conversion on device is
            # bit-identical to the host one (both exact in f32)
            dev = jnp.asarray(audio).astype(jnp.float32) / 32768.0
        else:
            dev = jnp.asarray(np.asarray(audio, np.float32))
        # pad the 30 s zero tail on device — uploading it costs ~1.9 MB of
        # relay traffic per request for bytes the device can materialize
        mel_all = log_mel_spectrogram(
            jnp.pad(dev, (0, N_SAMPLES)),
            n_mels=self.config.n_mels,
        )
        content_frames = max(mel_all.shape[0] - N_FRAMES, 1)
        n_windows = max(1, -(-content_frames // N_FRAMES))
        # the N_SAMPLES zero tail guarantees n_windows * N_FRAMES frames
        # exist, so every window slice is full-length (mel-of-silence in the
        # overhang, same values the host path produced)
        windows = mel_all[: n_windows * N_FRAMES].reshape(
            n_windows, N_FRAMES, mel_all.shape[1]
        )

        req_id = self._next_id
        self._next_id += 1
        loop = asyncio.get_event_loop()
        request = _Request(n_windows=n_windows, done=loop.create_future())
        request.events = asyncio.Queue()
        self._requests[req_id] = request

        for w in range(n_windows):
            await self._queue.put(_WindowJob(
                request_id=req_id, window_idx=w, mel=windows[w],
                time_offset=w * N_FRAMES * HOP_LENGTH / SAMPLE_RATE,
            ))
        return req_id, request

    def shutdown(self) -> None:
        if self._worker is not None:
            self._worker.cancel()
            self._worker = None

    # -- worker -------------------------------------------------------------

    def _ensure_worker(self) -> None:
        if self._worker is None or self._worker.done():
            self._worker = asyncio.get_event_loop().create_task(self._run())

    async def _run(self) -> None:
        # one-step-lag pipelining (same pattern as inference/batch_engine):
        # batch i executes on device while batch i+1 is collected and
        # DISPATCHED (decode defer=True) — the host dispatch/fetch
        # round-trips hide behind device compute. At most one extra batch
        # is in flight, bounding device memory.
        pending: asyncio.Task | None = None
        try:
            while True:
                jobs = [await self._queue.get()]
                # Fill-aware adaptive flush (r4 sweep showed fixed-deadline
                # flushes go partial under arrival jitter: 278.5 @28 clients
                # but 213-259 @36-60). Three regimes:
                # - device BUSY (a batch in flight): flushing a partial
                #   batch buys nothing — it would only queue behind the
                #   running one — so keep collecting until full fill or the
                #   device frees up. Saturated load therefore always flushes
                #   full, independent of jitter.
                # - device IDLE, lone-request fill (fits the smallest
                #   bucket): debounce — flush idle_gap_ms after the last
                #   arrival. A single caller sees ~idle_gap latency, not the
                #   hard deadline.
                # - device IDLE, fill beyond the smallest bucket (a
                #   concurrent burst is ramping): hold for the max_wait_ms
                #   hard deadline — an idle_gap hiccup in the arrival stream
                #   (e.g. the host serializing WAV reads) must not flush a
                #   partial batch, which would cost every straggler a whole
                #   extra batch execution (r5: the v1 plateau-break measured
                #   258 @28 vs fixed-deadline's 278 for exactly this reason).
                # After a busy wait the deadline is re-armed with a short
                # grace window so post-batch stragglers still coalesce.
                deadline = time.monotonic() + self.max_wait_ms / 1000.0
                idle_gap = self.idle_gap_ms / 1000.0
                was_busy = False
                while len(jobs) < self.batch_size:
                    busy = pending is not None and not pending.done()
                    if busy:
                        timeout = 0.02  # poll tick; re-check device state
                    else:
                        if was_busy:  # device just freed: straggler grace
                            deadline = max(
                                deadline,
                                time.monotonic() + 2 * idle_gap)
                        remaining = deadline - time.monotonic()
                        if remaining <= 0 and self._queue.empty():
                            break
                        timeout = max(min(idle_gap, remaining), 0.001)
                    was_busy = busy
                    try:
                        jobs.append(await asyncio.wait_for(
                            self._queue.get(), timeout=timeout
                        ))
                    except asyncio.TimeoutError:
                        if busy:
                            continue
                        if (len(jobs) <= self.buckets[0]
                                or deadline - time.monotonic() <= 0):
                            break  # lone-request plateau or hard deadline
                finalize = await asyncio.to_thread(self._launch, jobs)
                if pending is not None:
                    await pending
                pending = asyncio.create_task(
                    asyncio.to_thread(self._complete, jobs, finalize)
                )
        except asyncio.CancelledError:
            raise
        except BaseException as exc:
            # a failed launch/completion must not strand waiters: fail every
            # incomplete request's future (and wake streaming consumers),
            # then end cleanly (a re-raise would log "exception never
            # retrieved" — the waiters already carry it) — _ensure_worker
            # restarts on the next enqueue, and stale queued jobs of failed
            # requests are skipped in _complete
            self._fail_incomplete(exc)
        finally:
            if pending is not None:
                try:
                    await pending
                except BaseException as exc:  # noqa: BLE001
                    self._fail_incomplete(exc)

    def _fail_incomplete(self, exc: BaseException) -> None:
        for request in self._requests.values():
            if not request.done.done():
                request.done.set_exception(exc)
                # streaming consumers read .events, never .done — retrieve
                # the exception so GC doesn't log "never retrieved"
                request.done.exception()
            if request.events is not None:
                request.events.put_nowait(exc)

    def _launch(self, jobs: list[_WindowJob]):
        """Dispatch one padded window batch (mel→encode→decode); returns the
        decode finalize callable without waiting for device execution."""
        real = len(jobs)
        bucket = next(b for b in self.buckets if b >= real)
        mel = jnp.stack([j.mel for j in jobs])  # device op — no host copy
        if real < bucket:  # pad to the bucket's compile shape
            mel = jnp.concatenate([
                mel,
                jnp.zeros((bucket - real, *mel.shape[1:]), mel.dtype),
            ])
        # packed 4/8-bit checkpoints: the ENCODER always runs at
        # windows×1500 matmul rows, where dense jit-argument weights beat
        # the fused Pallas kernel (ops/quant.py policy) — bench.py gets
        # this via decode(mel), but the batcher encodes separately, and
        # skipping it here measured −20% serving RTF at quant=4. The same
        # dense tree (cached, resident anyway) also feeds decode() below —
        # even for small buckets, where the generic ≤16-row policy would
        # keep the packed kernel: measured 48.1 vs 56 single-request RTF,
        # and the dense tree costs no extra HBM once the encoder holds it.
        from whisper_mlx_tpu.ops.quant import maybe_dense_decode_params

        params = maybe_dense_decode_params(
            self.params, rows=bucket * mel.shape[1], dtype=self.config.dtype)
        if self.mesh is not None:
            # commit the window batch over "dp" — GSPMD compiles the same
            # encode/decode jits SPMD; buckets are dp-divisible (__init__)
            from whisper_mlx_tpu.parallel.sharding import shard_batch

            mel = shard_batch(mel, self.mesh)
        states = encode(params, jnp.asarray(mel), self.config)
        if self.decoding.beam_size is not None:  # defer is greedy-only
            results = decode(
                params, states, self.tokenizer, self.config,
                self.decoding, states_precomputed=True,
            )
            return lambda: results
        return decode(
            params, states, self.tokenizer, self.config, self.decoding,
            states_precomputed=True, defer=True,
        )

    def _complete(self, jobs: list[_WindowJob], finalize) -> None:
        results = finalize()
        real = len(jobs)
        self.stats["batches"] += 1
        self.stats["windows"] += real
        self.stats["fill_sum"] += real / next(
            b for b in self.buckets if b >= real
        )
        loop_results: list[tuple[_WindowJob, Any]] = list(zip(jobs, results[:real]))
        for job, result in loop_results:
            request = self._requests.get(job.request_id)
            if request is None:
                continue
            entry = (job.time_offset, result)
            request.results[job.window_idx] = entry
            if request.events is not None:
                request.done.get_loop().call_soon_threadsafe(
                    request.events.put_nowait, (job.window_idx, entry)
                )
            if len(request.results) == request.n_windows and not request.done.done():
                request.done.get_loop().call_soon_threadsafe(
                    request.done.set_result, dict(request.results)
                )

    # -- assembly -----------------------------------------------------------

    def _assemble(self, results: dict[int, tuple[float, Any]]) -> dict[str, Any]:
        input_stride = N_FRAMES // self.config.n_audio_ctx
        time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE
        ts_begin = self.tokenizer.timestamp_begin
        segments = []
        for w in sorted(results):
            time_offset, r = results[w]
            tokens = np.asarray(r.tokens)
            ts_mask = tokens >= ts_begin
            consecutive = np.where(ts_mask[:-1] & ts_mask[1:])[0] + 1
            bounds = [0] + consecutive.tolist() + [len(tokens)]
            for b0, b1 in zip(bounds[:-1], bounds[1:]):
                seg_toks = tokens[b0:b1]
                if len(seg_toks) == 0:
                    continue
                ts_in = seg_toks[seg_toks >= ts_begin]
                text = self.tokenizer.decode(
                    [t for t in seg_toks.tolist() if t < self.tokenizer.eot]
                )
                if not text.strip():
                    continue
                segments.append({
                    "id": len(segments),
                    "seek": w * N_FRAMES,
                    "start": time_offset + (float(ts_in[0] - ts_begin) * time_precision if len(ts_in) else 0.0),
                    "end": time_offset + (float(ts_in[-1] - ts_begin) * time_precision if len(ts_in) else 30.0),
                    "text": text,
                    "tokens": list(map(int, seg_toks)),
                    "temperature": r.temperature,
                    "avg_logprob": r.avg_logprob,
                    "compression_ratio": r.compression_ratio,
                    "no_speech_prob": r.no_speech_prob,
                })
        return {
            "text": "".join(s["text"] for s in segments),
            "segments": segments,
            "language": self.tokenizer.language,
        }
