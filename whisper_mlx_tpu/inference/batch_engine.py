"""Continuous batching: many chat requests share ONE resident decode batch.

The reference serializes all generation behind a single asyncio lock
(reference ``daemon/server.py:273-355``) — request N+1 waits for request N's
full completion. TPU-native serving instead keeps a fixed-shape batch of S
decode *slots* resident on device:

- one jitted per-token step advances every active slot together (the MXU
  sees a (S, 1) batch instead of (1, 1) — decode is HBM-bound, so batching
  is nearly free throughput);
- a new request joins mid-flight by prefilling into a free slot (bucketed
  prompt shapes → a handful of stable executables), without stopping the
  other slots;
- a finished request frees its slot at its stop token; the others continue.

All shapes are static: the KV cache is (S, kv_heads, head_dim, max_len)
per layer (time-minor — models/qwen.py init_kv_cache), prompts are
right-padded to PROMPT_BUCKET multiples, and per-slot positions drive
per-row RoPE/mask/cache-scatter in ``models.qwen.decode_step`` (pos as a
(S,) vector).

Host/device split: a single worker thread owns the device state and runs
admit → step → dispatch; requests talk to it through thread-safe queues.
Per-request temperature is honored per slot ((S,) vector into
``sample_token``); top_p/top_k are engine-level (shared executable).
"""

from __future__ import annotations

import itertools
import queue
import threading
from dataclasses import dataclass, field
from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.inference.generate import sample_token
from whisper_mlx_tpu.models.qwen import (
    Params,
    QwenConfig,
    decode_step,
    init_kv_cache,
)


@partial(jax.jit, static_argnames=("config", "top_p", "top_k"), donate_argnums=(1,))
def _batch_step(
    params: Params,
    cache: list,
    logits: jnp.ndarray,  # (S, V) fp32 — last logits per slot
    pos: jnp.ndarray,  # (S,) int32 — next cache position per slot
    temps: jnp.ndarray,  # (S,) fp32
    rng: jax.Array,
    stop_tokens: jnp.ndarray,  # (n_stop,) int32
    config: QwenConfig,
    top_p: float,
    top_k: int,
):
    """Sample one token per slot, then advance all slots one position."""
    tok = sample_token(logits, rng, temps, top_p, top_k)  # (S,)
    is_stop = jnp.any(tok[:, None] == stop_tokens[None, :], axis=1)
    new_logits, new_cache = decode_step(params, tok[:, None], pos, cache, config)
    return tok, is_stop, new_logits[:, -1].astype(jnp.float32), new_cache, pos + 1


@partial(jax.jit, static_argnames=("config",), donate_argnums=(1,))
def _prefill_slot(
    params: Params,
    cache: list,
    logits: jnp.ndarray,  # (S, V)
    pos: jnp.ndarray,  # (S,)
    prompt: jnp.ndarray,  # (1, T_bucket)
    true_len: jnp.ndarray,  # scalar int32
    slot: jnp.ndarray,  # scalar int32
    config: QwenConfig,
):
    """Prefill one prompt into ``slot`` without touching the other slots.

    Runs the prompt through a fresh single-row cache (same executable for
    every request in the same length bucket), then scatters that row into
    the resident S-row cache.
    """
    max_len = cache[0]["kt" if "kt" in cache[0] else "k8t"].shape[3]
    row_cache = init_kv_cache(config, 1, max_len)
    lg, row_cache = decode_step(params, prompt, jnp.int32(0), row_cache, config)
    last = jax.lax.dynamic_slice_in_dim(lg, true_len - 1, 1, axis=1)[0, 0]
    new_cache = [
        {k: big[k].at[slot].set(row[k][0]) for k in big}
        for big, row in zip(cache, row_cache)
    ]
    return (
        new_cache,
        logits.at[slot].set(last.astype(jnp.float32)),
        pos.at[slot].set(true_len),
    )


@dataclass
class _Request:
    rid: int
    prompt_ids: list[int]
    max_tokens: int
    temperature: float
    out: "queue.SimpleQueue[int | None]" = field(default_factory=queue.SimpleQueue)
    emitted: int = 0
    cancelled: bool = False
    done: bool = False  # emission closed (worker-side; see pipelined loop)


class RequestHandle:
    """Consumer side of one in-flight request."""

    def __init__(self, req: _Request, tokenizer, stop_ids: set[int]):
        self._req = req
        self._tokenizer = tokenizer
        self._stop_ids = stop_ids

    def tokens(self) -> Iterator[int]:
        """Blocking iterator over generated token ids (stop token excluded)."""
        while True:
            tok = self._req.out.get()
            if tok is None:
                return
            yield tok

    def text_stream(self) -> Iterator[str]:
        """Decoded text increments (same UTF-8-boundary rule as
        LLMEngine.stream_generate)."""
        out: list[int] = []
        sent = 0
        for tok in self.tokens():
            out.append(tok)
            text = self._tokenizer.decode(out)
            if not text.endswith("�") and len(text) > sent:
                yield text[sent:]
                sent = len(text)

    def result_text(self) -> str:
        return "".join(self.text_stream())

    def cancel(self) -> None:
        self._req.cancelled = True


class ContinuousBatchEngine:
    """S-slot resident decode batch with mid-flight admission."""

    PROMPT_BUCKET = 128

    def __init__(
        self,
        params: Params,
        config: QwenConfig,
        tokenizer,
        *,
        slots: int = 4,
        max_len: int = 4096,
        top_p: float = 1.0,
        top_k: int = 0,
        stop_ids: "set[int] | None" = None,
    ):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.slots = slots
        self.max_len = max_len
        self.top_p = top_p
        self.top_k = top_k
        self._stop_ids = set(stop_ids) if stop_ids else self._default_stops()
        self._stop_arr = jnp.asarray(sorted(self._stop_ids) or [0], jnp.int32)

        # device state — owned exclusively by the worker thread
        self._cache = init_kv_cache(config, slots, max_len)
        self._logits = jnp.zeros((slots, config.vocab_size), jnp.float32)
        self._pos = jnp.zeros((slots,), jnp.int32)
        self._key = jax.random.PRNGKey(0)

        self._slot_req: list[_Request | None] = [None] * slots
        self._pending: "queue.SimpleQueue[_Request]" = queue.SimpleQueue()
        self._wakeup = threading.Event()
        self._shutdown = False
        self._ids = itertools.count()
        self._steps = 0  # total batch steps (telemetry/tests)
        self._step_occupancy: list[int] = []  # active slots per step (tests)
        self._worker = threading.Thread(
            target=self._worker_loop, name="llm-batch-worker", daemon=True
        )
        self._worker.start()

    # -- public API ----------------------------------------------------------

    def submit(
        self,
        prompt: "str | list[int]",
        max_tokens: int = 512,
        temperature: float = 0.7,
    ) -> RequestHandle:
        ids = self.tokenizer.encode(prompt) if isinstance(prompt, str) else list(prompt)
        if not ids:
            raise ValueError("submit() requires a non-empty prompt")
        # keep the prompt tail; always leave generation room (same budget rule
        # as LLMEngine._fit_context)
        ids = ids[-(self.max_len - 64):]
        max_tokens = max(1, min(max_tokens, self.max_len - len(ids)))
        req = _Request(next(self._ids), ids, max_tokens, float(temperature))
        self._pending.put(req)
        self._wakeup.set()
        return RequestHandle(req, self.tokenizer, self._stop_ids)

    def generate_text(self, prompt, max_tokens: int = 512, temperature: float = 0.7) -> str:
        return self.submit(prompt, max_tokens, temperature).result_text()

    def close(self) -> None:
        self._shutdown = True
        self._wakeup.set()
        self._worker.join(timeout=10)

    # -- worker --------------------------------------------------------------

    def _default_stops(self) -> set[int]:
        stops = set()
        for attr in ("eos_token_id", "im_end_id"):
            v = getattr(self.tokenizer, attr, None)
            if isinstance(v, int):
                stops.add(v)
            elif isinstance(v, (list, tuple)):
                stops.update(v)
        for text in ("<|im_end|>", "<|endoftext|>"):
            try:
                ids = self.tokenizer.encode(text)
                if len(ids) == 1:
                    stops.add(ids[0])
            except Exception:
                pass
        return stops or {0}

    def _bucket(self, ids: list[int]) -> tuple[list[int], int]:
        true_len = len(ids)
        bucket = -(-true_len // self.PROMPT_BUCKET) * self.PROMPT_BUCKET
        bucket = min(bucket, self.max_len)
        return ids + [0] * (bucket - true_len), true_len

    def _admit(self) -> None:
        while None in self._slot_req:
            try:
                req = self._pending.get_nowait()
            except queue.Empty:
                return
            if req.cancelled:
                req.out.put(None)
                continue
            slot = self._slot_req.index(None)
            padded, true_len = self._bucket(req.prompt_ids)
            self._cache, self._logits, self._pos = _prefill_slot(
                self.params, self._cache, self._logits, self._pos,
                jnp.asarray([padded], jnp.int32), jnp.int32(true_len),
                jnp.int32(slot), config=self.config,
            )
            self._slot_req[slot] = req

    def _finish(self, slot: int) -> None:
        req = self._slot_req[slot]
        if req is not None and not req.done:
            req.done = True
            req.out.put(None)
        self._slot_req[slot] = None

    def _worker_loop(self) -> None:
        try:
            self._run()
        except BaseException:  # noqa: BLE001 — release every waiter, then re-raise
            for i in range(self.slots):
                self._finish(i)
            while True:
                try:
                    self._pending.get_nowait().out.put(None)
                except queue.Empty:
                    break
            raise

    def _run(self) -> None:
        # Pipelined by one step: dispatch step i+1 to the device BEFORE
        # fetching step i's tokens to the host, so the device→host round
        # trip overlaps the next step's compute (per-token dispatch+fetch
        # latency otherwise serializes the whole decode — on this
        # environment's relay it dominates). The lag means a slot that
        # stops at step i still computes a throwaway token at step i+1;
        # emission captures request OBJECTS at dispatch time, so a slot
        # re-admitted in between never receives the stale token.
        in_flight = None  # (tok_dev, stop_dev, pos_dev, [(slot, req), ...])

        def drain(batch) -> None:
            tok_dev, stop_dev, pos_dev, slot_reqs = batch
            tok_np = np.asarray(tok_dev)
            stop_np = np.asarray(stop_dev)
            pos_np = np.asarray(pos_dev)
            for i, req in slot_reqs:
                if req.done:
                    continue  # stopped at the previous step; stale token
                if req.cancelled or stop_np[i]:
                    if self._slot_req[i] is req:
                        self._finish(i)
                    else:  # slot already re-assigned; close just the req
                        req.done = True
                        req.out.put(None)
                    continue
                req.out.put(int(tok_np[i]))
                req.emitted += 1
                if req.emitted >= req.max_tokens or pos_np[i] >= self.max_len - 1:
                    if self._slot_req[i] is req:
                        self._finish(i)
                    else:
                        req.done = True
                        req.out.put(None)

        while not self._shutdown:
            if (not any(self._slot_req) and self._pending.empty()
                    and in_flight is None):
                self._wakeup.wait(timeout=0.2)
                self._wakeup.clear()
                continue
            self._admit()
            active = [i for i, r in enumerate(self._slot_req) if r is not None]
            if active:
                temps = np.zeros(self.slots, np.float32)
                for i in active:
                    temps[i] = self._slot_req[i].temperature
                self._key, sub = jax.random.split(self._key)
                tok, is_stop, self._logits, self._cache, self._pos = _batch_step(
                    self.params, self._cache, self._logits, self._pos,
                    jnp.asarray(temps), sub, self._stop_arr,
                    config=self.config, top_p=self.top_p, top_k=self.top_k,
                )
                self._steps += 1
                self._step_occupancy.append(len(active))
                next_flight = (tok, is_stop, self._pos,
                               [(i, self._slot_req[i]) for i in active])
            else:
                next_flight = None
            if in_flight is not None:
                drain(in_flight)
            in_flight = next_flight

        # shutdown: the one-step pipeline lag may hold a computed token
        # batch — deliver it, then close every remaining consumer so a
        # thread blocked in RequestHandle.result_text() never hangs.
        if in_flight is not None:
            drain(in_flight)
        for i in range(self.slots):
            self._finish(i)
        while True:  # never-admitted requests also get a closing sentinel
            try:
                self._pending.get_nowait().out.put(None)
            except queue.Empty:
                break
