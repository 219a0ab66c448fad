"""LLM generation engine: KV-cached decode with sampling + streaming.

Replaces the reference's ``mlx_lm.load``/``mlx_lm.generate`` usage
(reference ``llm.py:155-193``, ``daemon/chat.py:153-215``): ChatML prompt
building, prefill + incremental decode over the Qwen model, temperature /
top-p / top-k sampling, stop-token handling, and a streaming generator
(feeds the daemon's SSE path, reference ``daemon/server.py:821+``).

Two loops:
- :meth:`LLMEngine.generate` — whole loop in one jit (fastest; batch-able);
- :meth:`LLMEngine.stream_generate` — host loop around the jitted single
  step, yielding decoded text increments per token.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from functools import partial
from typing import TYPE_CHECKING, Iterator

if TYPE_CHECKING:
    from whisper_mlx_tpu.inference.batch_engine import ContinuousBatchEngine

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.models.qwen import (
    Params,
    QwenConfig,
    decode_step,
    init_kv_cache,
)

# ---------------------------------------------------------------------------
# sampling (pure, jit-safe)
# ---------------------------------------------------------------------------


def sample_token(
    logits: jnp.ndarray,  # (b, V) fp32
    rng: jax.Array,
    temperature: jnp.ndarray,  # scalar, or (b,) per-row (continuous batching)
    top_p: float = 1.0,
    top_k: int = 0,
) -> jnp.ndarray:
    """Greedy at temperature 0, else nucleus/top-k sampling."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temperature = jnp.asarray(temperature)
    if temperature.ndim == 1:
        temperature = temperature[:, None]
    scaled = logits / jnp.maximum(temperature, 1e-6)

    if top_k and top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep smallest prefix with cumulative mass > top_p (always ≥ 1 tok)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)

    sampled = jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)
    use_sample = (temperature > 0).reshape(sampled.shape) if temperature.ndim else temperature > 0
    return jnp.where(use_sample, sampled, greedy)


@partial(jax.jit, static_argnames=("config", "top_p", "top_k"))
def _stream_step(
    params: Params,
    last: jnp.ndarray,  # (1, V) fp32 — logits to sample from
    cache: list,
    pos: jnp.ndarray,
    temperature: jnp.ndarray,
    rng: jax.Array,
    config: QwenConfig,
    top_p: float,
    top_k: int,
):
    """Fused sample + decode step for the streaming loop: keeps the token
    on device so the host can dispatch step i+1 before fetching token i."""
    tok = sample_token(last, rng, temperature, top_p, top_k)  # (1,)
    logits, cache = decode_step(params, tok[:, None], pos, cache, config)
    return tok, logits[:, -1].astype(jnp.float32), cache


# ---------------------------------------------------------------------------
# chat template (ChatML — the Qwen family format)
# ---------------------------------------------------------------------------


def apply_chat_template(
    messages: list[dict[str, str]],
    add_generation_prompt: bool = True,
    enable_thinking: bool = False,
) -> str:
    """Qwen ChatML template (mirrors tokenizer.apply_chat_template usage at
    reference ``daemon/chat.py:194-198``)."""
    parts = []
    for m in messages:
        parts.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    if add_generation_prompt:
        parts.append("<|im_start|>assistant\n")
        if not enable_thinking:
            parts.append("<think>\n\n</think>\n\n")
    return "".join(parts)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


@dataclass
class GenerationResult:
    text: str
    tokens: list[int]
    prompt_tokens: int
    generation_tokens: int
    prompt_tps: float
    generation_tps: float


@partial(jax.jit, static_argnames=("config", "max_new", "max_len", "top_p", "top_k"))
def _generate_jit(
    params: Params,
    prompt: jnp.ndarray,  # (b, t_padded) — right-padded to a length bucket
    prompt_len: jnp.ndarray,  # scalar: true prompt length (traced)
    requested: jnp.ndarray,  # scalar: user's max_tokens (traced, ≤ max_new)
    temperature: jnp.ndarray,
    rng: jax.Array,
    stop_tokens: jnp.ndarray,  # (n_stop,) int32
    config: QwenConfig,
    max_new: int,
    max_len: int,
    top_p: float,
    top_k: int,
):
    """Prompt lengths are bucketed so one executable serves a whole bucket:
    the prefill writes garbage KV at padded positions, but generated tokens
    are placed from ``prompt_len`` onward and overwrite each slot before the
    causal mask ever exposes it."""
    b, _tpad = prompt.shape
    t0 = prompt_len
    # Packed 4-bit params stay packed: the fused Pallas dequant kernel is
    # the fastest measured LLM decode form e2e (qwen2.5-7b B=1: 48.9 tok/s
    # vs 11.8 for in-jit native-code grouped einsums — bench_history r3;
    # microbenchmarks predicted the opposite, e2e is the only truth here).
    cache = init_kv_cache(config, b, max_len)
    logits, cache = decode_step(params, prompt, jnp.int32(0), cache, config)
    last = jax.lax.dynamic_slice_in_dim(logits, t0 - 1, 1, axis=1)[:, 0].astype(jnp.float32)

    buf = jnp.zeros((b, max_new), jnp.int32)

    def cond(s):
        i, _, _, _, done, _ = s
        return (i < jnp.minimum(requested, max_new)) & ~jnp.all(done)

    def body(s):
        i, last, cache, buf, done, key = s
        key, sub = jax.random.split(key)
        tok = sample_token(last, sub, temperature, top_p, top_k)
        is_stop = jnp.any(tok[:, None] == stop_tokens[None, :], axis=1)
        buf = jax.lax.dynamic_update_slice(buf, tok[:, None], (0, i))
        done_now = done | is_stop
        logits, cache = decode_step(
            params, tok[:, None], (t0 + i).astype(jnp.int32), cache, config
        )
        return (i + 1, logits[:, -1].astype(jnp.float32), cache, buf, done_now, key)

    i, _, _, buf, done, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), last, cache, buf, jnp.zeros(b, bool), rng)
    )
    return buf, i


class LLMEngine:
    """Loaded model + tokenizer; the reference's ``QwenModel`` equivalent."""

    def __init__(self, params: Params, config: QwenConfig, tokenizer,
                 max_context: int = 4096,
                 draft: "tuple[Params, QwenConfig] | None" = None):
        import dataclasses
        import os

        # quantized KV cache opt-in (WTPU_LLM_KV_BITS=8 or 4): int8 halves /
        # native-int4 quarters KV HBM, scaling context per chip accordingly
        # (models/qwen.py kv_bits; exact scale-folded attention; quality
        # bounds in docs/kv_quant_study.md)
        kv_bits = int(os.environ.get("WTPU_LLM_KV_BITS", "0"))
        if kv_bits and config.kv_bits != kv_bits:
            config = dataclasses.replace(config, kv_bits=kv_bits)
        # Opt-in (WTPU_NATIVE_RESIDENT=1/auto): promote packed weights to
        # uint8-code residency for the per-step jits. DEFAULT OFF — despite
        # microbenchmarks favoring it, the XLA grouped-einsum dequant
        # measured 4× slower than the fused Pallas kernel in the real
        # decode loop (qwen2.5-7b B=1: 11.8 vs 48.9 tok/s, bench r3).
        from whisper_mlx_tpu.ops.quant import promote_resident_native

        resident = os.environ.get("WTPU_NATIVE_RESIDENT", "0")
        if resident != "0":
            params, promoted = promote_resident_native(
                params, budget_bytes=None if resident == "1" else 9 << 30)
            if promoted and draft is not None:
                dp, _ = promote_resident_native(draft[0],
                                                budget_bytes=None)
                draft = (dp, draft[1])
        # Opt-in (WTPU_MBT_RESIDENT=1): transpose packed linears ONCE to
        # the multi-buffered DMA-ring layout (ops/quant_pallas_mb) — the
        # kernel keeps DEPTH weight-slab DMAs in flight per matmul.
        # Measured +7% decode (qwen2.5-7b B=1: 52.2 vs 48.9 tok/s, r3);
        # token-exact vs packed. uint32 planes cross jit boundaries, so
        # per-step loops (SSE streaming, batch engine) can use it too.
        # Opt-in (WTPU_QWEN_A8=1): re-quantize packed linears to per-channel
        # int8 (ops/quant_a8.py) — decode matvecs become pure s8×s8 MXU dots
        # with zero per-value VPU dequant (the r3 "B=1 wall"). Numerics
        # change (W8A8 vs exact int4 dequant): opt-in, deltas measured in
        # tests/test_quant.py. Runs before MBT, which then skips A8 leaves —
        # so A8 wins when both flags are set.
        if os.environ.get("WTPU_QWEN_A8", "0") == "1":
            from whisper_mlx_tpu.ops.quant_a8 import prepare_a8_params

            params = prepare_a8_params(params)
            if draft is not None:
                draft = (prepare_a8_params(draft[0]), draft[1])
        if os.environ.get("WTPU_MBT_RESIDENT", "0") == "1":
            from whisper_mlx_tpu.ops.quant import prepare_mbt_params

            params = prepare_mbt_params(params)
            if draft is not None:
                draft = (prepare_mbt_params(draft[0]), draft[1])
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.max_context = max_context
        # optional draft model for greedy speculative decoding
        # (inference/speculative.py) — single-stream latency path
        self.draft = draft
        self._batch_engine = None
        self._batch_lock = threading.Lock()

    def continuous(self, slots: int = 4) -> "ContinuousBatchEngine":
        """Shared continuous-batching engine over the same weights
        (inference/batch_engine.py): S concurrent requests share one resident
        decode batch instead of serializing behind a lock."""
        from whisper_mlx_tpu.inference.batch_engine import ContinuousBatchEngine

        with self._batch_lock:
            if self._batch_engine is None:
                self._batch_engine = ContinuousBatchEngine(
                    self.params, self.config, self.tokenizer,
                    slots=slots, max_len=self.max_context,
                )
            return self._batch_engine

    PROMPT_BUCKET = 128  # prompt lengths rounded up → one jit per bucket

    def _fit_context(self, ids: list[int], max_tokens: int) -> tuple[list[int], int]:
        """Budget prompt + generation into max_context: keep the prompt tail
        (chat history recency), always leave ≥64 tokens of generation room."""
        ids = ids[-(self.max_context - 64):]
        max_new = max(1, min(max_tokens, self.max_context - len(ids)))
        return ids, max_new

    def _bucket_prompt(self, ids: list[int]) -> tuple[list[int], int]:
        """Right-pad to the bucket size → stable compile shapes."""
        true_len = len(ids)
        bucket = -(-true_len // self.PROMPT_BUCKET) * self.PROMPT_BUCKET
        bucket = min(bucket, self.max_context)
        return ids + [0] * (bucket - true_len), true_len

    # stop tokens: <|im_end|> + eos
    def _stop_ids(self) -> list[int]:
        stops = []
        for attr in ("eos_token_id", "im_end_id"):
            v = getattr(self.tokenizer, attr, None)
            if isinstance(v, int):
                stops.append(v)
            elif isinstance(v, (list, tuple)):
                stops.extend(v)
        for text in ("<|im_end|>", "<|endoftext|>"):
            try:
                ids = self.tokenizer.encode(text)
                if len(ids) == 1:
                    stops.append(ids[0])
            except Exception:
                pass
        return sorted(set(stops)) or [0]

    def generate(
        self,
        prompt: str,
        max_tokens: int = 512,
        temperature: float = 0.7,
        top_p: float = 1.0,
        top_k: int = 0,
        seed: int = 0,
    ) -> GenerationResult:
        if max_tokens <= 0:
            return GenerationResult(text="", tokens=[], prompt_tokens=len(self.tokenizer.encode(prompt)),
                                    generation_tokens=0, prompt_tps=0.0, generation_tps=0.0)
        ids = self.tokenizer.encode(prompt)
        if not ids:
            raise ValueError("generate() requires a non-empty prompt")
        ids, max_tokens = self._fit_context(ids, max_tokens)
        if self.draft is not None and temperature == 0.0:
            return self._generate_speculative(ids, max_tokens)
        t_prompt0 = time.perf_counter()
        padded, true_len = self._bucket_prompt(ids)
        prompt_arr = jnp.asarray([padded], jnp.int32)
        stops = self._stop_ids()
        stop_arr = jnp.asarray(stops, jnp.int32)
        # max_new bucketed too (coarser) so compile shapes stay stable
        max_new = min(-(-max_tokens // 256) * 256, self.max_context)
        buf, n = _generate_jit(
            self.params, prompt_arr, jnp.int32(true_len), jnp.int32(max_tokens),
            jnp.float32(temperature), jax.random.PRNGKey(seed), stop_arr,
            config=self.config, max_new=max_new,
            max_len=self.max_context, top_p=top_p, top_k=top_k,
        )
        buf = np.asarray(buf)[0]
        n = int(n)
        dt = time.perf_counter() - t_prompt0
        toks = buf[:n].tolist()
        while toks and toks[-1] in stops:
            toks = toks[:-1]
        text = self.tokenizer.decode(toks)
        return GenerationResult(
            text=text, tokens=toks, prompt_tokens=len(ids),
            generation_tokens=len(toks),
            prompt_tps=len(ids) / max(dt, 1e-9),
            generation_tps=len(toks) / max(dt, 1e-9),
        )

    def _generate_speculative(self, ids: list[int], max_tokens: int) -> GenerationResult:
        from whisper_mlx_tpu.inference.speculative import speculative_generate

        draft_params, draft_config = self.draft
        stops = set(self._stop_ids())
        t0 = time.perf_counter()
        toks, stats = speculative_generate(
            self.params, self.config, draft_params, draft_config,
            ids, max_tokens=max_tokens, stop_ids=stops,
            max_len=self.max_context,
        )
        dt = time.perf_counter() - t0
        while toks and toks[-1] in stops:
            toks = toks[:-1]
        text = self.tokenizer.decode(toks)
        return GenerationResult(
            text=text, tokens=toks, prompt_tokens=len(ids),
            generation_tokens=len(toks),
            prompt_tps=len(ids) / max(dt, 1e-9),
            generation_tps=len(toks) / max(dt, 1e-9),
        )

    def stream_generate(
        self,
        prompt: str,
        max_tokens: int = 512,
        temperature: float = 0.7,
        top_p: float = 1.0,
        top_k: int = 0,
        seed: int = 0,
    ) -> Iterator[str]:
        """Yield decoded text increments token by token (SSE feed)."""
        ids = self.tokenizer.encode(prompt)
        if not ids:
            raise ValueError("stream_generate() requires a non-empty prompt")
        ids, max_tokens = self._fit_context(ids, max_tokens)
        padded, true_len = self._bucket_prompt(ids)
        stops = set(self._stop_ids())
        cache = init_kv_cache(self.config, 1, self.max_context)
        logits, cache = decode_step(
            self.params, jnp.asarray([padded], jnp.int32), jnp.int32(0), cache, self.config
        )
        last = logits[:, true_len - 1].astype(jnp.float32)
        ids = ids[:true_len]
        key = jax.random.PRNGKey(seed)
        out: list[int] = []
        sent = 0
        pos = len(ids)

        def emit(tok: int):
            nonlocal sent
            out.append(tok)
            text = self.tokenizer.decode(out)
            if not text.endswith("�") and len(text) > sent:
                inc = text[sent:]
                sent = len(text)
                return inc
            return None

        # pipelined by one step: dispatch the fused sample+decode for step
        # i+1 BEFORE fetching step i's token, so the device→host fetch
        # overlaps the next step's compute (same structure as
        # batch_engine._run; a stop token costs one throwaway step).
        pending = None
        for _ in range(max_tokens):
            key, sub = jax.random.split(key)
            tok_dev, last, cache = _stream_step(
                self.params, last, cache, jnp.int32(pos),
                jnp.float32(temperature), sub,
                config=self.config, top_p=top_p, top_k=top_k,
            )
            pos += 1
            if pending is not None:
                tok = int(pending[0])
                if tok in stops:
                    return
                inc = emit(tok)
                if inc is not None:
                    yield inc
            pending = tok_dev
        if pending is not None:
            tok = int(pending[0])
            if tok not in stops:
                inc = emit(tok)
                if inc is not None:
                    yield inc

    def chat(
        self,
        messages: list[dict[str, str]],
        max_tokens: int = 512,
        temperature: float = 0.7,
        **kw,
    ) -> GenerationResult:
        prompt = apply_chat_template(messages)
        return self.generate(prompt, max_tokens=max_tokens, temperature=temperature, **kw)
