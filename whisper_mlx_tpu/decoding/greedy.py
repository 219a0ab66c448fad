"""Batched greedy / temperature-sampling decode loop, fully jitted.

The reference decodes token-by-token in Python over MLX graphs (the HOTTEST
LOOP of SURVEY.md §3.1). TPU-native design: the entire loop — prefill,
per-step logit filtering, sampling, KV-cache update, finish masking — is one
``lax.while_loop`` inside one jit. The host sees only the final token
buffer. Batch = many 30 s windows (possibly from different files), which is
how long-form audio scales across a mesh (SURVEY.md §2.4: DP over windows).

Temperature is a *traced* scalar so the fallback ladder (0.0→1.0) reuses the
compiled executable; temperature==0 lowers to argmax via ``lax.select``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from whisper_mlx_tpu.decoding.filters import FilterConfig, apply_filters
from whisper_mlx_tpu.models.whisper import (
    Params,
    WhisperConfig,
    cross_kv,
    decode_step,
    init_kv_cache,
)


class GreedyResult(NamedTuple):
    tokens: jnp.ndarray  # (batch, n_ctx) int32, EOT-padded after finish
    lengths: jnp.ndarray  # (batch,) int32 — total valid length incl. initial tokens
    sum_logprobs: jnp.ndarray  # (batch,) fp32 — sum over sampled tokens up to EOT
    no_speech_probs: jnp.ndarray  # (batch,) fp32 — P(no_speech) at the SOT position


@partial(
    jax.jit,
    static_argnames=("config", "filter_cfg", "sample_len", "sot_index",
                     "share_xkv_groups", "grow_cache", "phases", "unroll"),
)
def greedy_decode(
    params: Params,
    audio_states: jnp.ndarray,  # (batch, 1500, d) encoder output
    initial_tokens: jnp.ndarray,  # (batch, n_init) — sot sequence (+ prompt)
    suppress_mask: jnp.ndarray,  # (n_vocab,) bool
    blank_mask: jnp.ndarray,  # (n_vocab,) bool
    temperature: jnp.ndarray,  # scalar fp32, traced (fallback ladder reuses jit)
    rng: jax.Array,  # PRNG key for temperature sampling
    config: WhisperConfig,
    filter_cfg: FilterConfig,
    sample_len: int,
    sot_index: int,
    no_speech_token: int,
    share_xkv_groups: int = 1,
    grow_cache: bool = True,
    phases: tuple[int, ...] | None = None,
    unroll: int = 1,
) -> GreedyResult:
    """``share_xkv_groups=g``: audio_states holds batch/g windows whose
    cross K/V are SHARED by g consecutive decode rows (best_of candidates
    — decoding/task.py) instead of being replicated g× into the decode
    loop's dominant HBM stream."""
    batch, n_init = initial_tokens.shape
    n_ctx = config.n_text_ctx
    eot = filter_cfg.eot

    # Packed 4/8-bit params reach here only at few-row shapes — batched
    # callers convert to dense jit arguments first (decoding/task.py via
    # ops/quant.py maybe_dense_decode_params: in-jit residency conversions
    # all measured SLOWER than dense arguments at B=56, and the fused
    # Pallas kernel wins at few rows).
    xkv = cross_kv(params, audio_states, config)
    # right-size the cache to the real horizon — every step re-reads it all.
    horizon = n_init + sample_len
    # growing-cache phase ladder: decode with progressively larger
    # allocations so early steps never stream dead tail positions. The
    # time-minor layout rounds allocations to the 128 lane tile (one
    # boundary is all that helps at a 224-step horizon); time-major has no
    # lane constraint on T, so a finer ladder pays (exact-horizon final
    # phase). ``phases=None`` resolves the default here; callers override
    # via the STATIC arg (decoding/task.py threads WTPU_SELF_PHASES so the
    # choice participates in the jit cache key).
    if phases is None:
        phases = ((64, 128, 192) if config.self_kv_layout == "tmajor"
                  else (128,))
    phase_bounds = [b for b in sorted(set(phases))
                    if grow_cache and n_init + 1 < b and horizon > b + 32]
    cache = init_kv_cache(
        config, batch,
        max_len=phase_bounds[0] if phase_bounds else horizon
    )

    # ---- prefill ----------------------------------------------------------
    logits_all, cache, _ = decode_step(
        params, initial_tokens, jnp.int32(0), cache, xkv, config,
        share_xkv_groups=share_xkv_groups,
    )
    no_speech_probs = jax.nn.softmax(logits_all[:, sot_index].astype(jnp.float32), axis=-1)[
        :, no_speech_token
    ]
    last_logits = logits_all[:, -1].astype(jnp.float32)

    tokens0 = jnp.zeros((batch, n_ctx), jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(tokens0, initial_tokens.astype(jnp.int32), (0, 0))

    class State(NamedTuple):
        tokens: jnp.ndarray
        cur_len: jnp.ndarray
        logits: jnp.ndarray
        cache: list
        sum_logprobs: jnp.ndarray
        done: jnp.ndarray
        rng: jax.Array

    state = State(
        tokens=tokens0,
        cur_len=jnp.int32(n_init),
        logits=last_logits,
        cache=cache,
        sum_logprobs=jnp.zeros(batch, jnp.float32),
        done=jnp.zeros(batch, bool),
        rng=rng,
    )
    max_len = min(n_init + sample_len, n_ctx)

    def body(s: State) -> State:
        logits = apply_filters(
            s.logits, s.tokens, s.cur_len, suppress_mask, blank_mask, filter_cfg
        )
        logprobs = jax.nn.log_softmax(logits, axis=-1)

        key, subkey = jax.random.split(s.rng)
        greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        temp = jnp.maximum(temperature, 1e-6)
        sampled_tok = jax.random.categorical(subkey, logits / temp, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(temperature > 0, sampled_tok, greedy_tok)

        tok_logprob = jnp.take_along_axis(logprobs, next_tok[:, None], axis=-1)[:, 0]
        # accumulate logprob (incl. the EOT that finishes the sequence)
        sum_logprobs = s.sum_logprobs + jnp.where(s.done, 0.0, tok_logprob)
        next_tok = jnp.where(s.done, eot, next_tok)
        done = s.done | (next_tok == eot)

        tokens = jax.lax.dynamic_update_slice(
            s.tokens, next_tok[:, None], (0, s.cur_len)
        )
        step_logits, cache, _ = decode_step(
            params, next_tok[:, None], s.cur_len, s.cache, xkv, config,
            share_xkv_groups=share_xkv_groups,
        )
        return State(
            tokens=tokens,
            cur_len=s.cur_len + 1,
            logits=step_logits[:, -1].astype(jnp.float32),
            cache=cache,
            sum_logprobs=sum_logprobs,
            done=done,
            rng=key,
        )

    def run_loop(s0: State, bound: int) -> State:
        """Decode until ``cur_len == bound`` or every lane is done.

        ``unroll=k`` (static, WTPU_DECODE_UNROLL) runs k chained steps per
        while iteration — fewer loop-carried fusion boundaries, a k-step
        scheduling window for XLA. Exactness: the pair condition stops
        while ≥k steps remain; each of the ≤k−1 trailing steps re-checks
        the ORIGINAL single-step condition under ``lax.cond``, so token /
        logprob / early-exit semantics are bit-identical to unroll=1 (a
        mid-pair all-done batch runs a harmless frozen step: every lane
        emits EOT with sum_logprobs masked by ``done``)."""
        def cond1(s: State):
            return (s.cur_len < bound) & ~jnp.all(s.done)

        if unroll <= 1:
            return jax.lax.while_loop(cond1, body, s0)

        def condk(s: State):
            return (s.cur_len + (unroll - 1) < bound) & ~jnp.all(s.done)

        def bodyk(s: State) -> State:
            for _ in range(unroll):
                s = body(s)
            return s

        out = jax.lax.while_loop(condk, bodyk, s0)
        for _ in range(unroll - 1):
            out = jax.lax.cond(cond1(out), body, lambda s: s, out)
        return out

    t_axis = {"k8t": 3, "v8t": 3, "kT": 0, "ksT": 0, "vT": 0, "vsT": 0}
    for i, pb in enumerate(phase_bounds):
        mid = run_loop(state, min(pb, max_len))
        nxt = phase_bounds[i + 1] if i + 1 < len(phase_bounds) else horizon
        big = init_kv_cache(config, batch, max_len=nxt)
        grown = []
        for small, dst in zip(mid.cache, big):
            grown.append({
                key: jax.lax.dynamic_update_slice_in_dim(
                    dst[key], small[key], 0, axis=t_axis.get(key, 2))
                for key in small
            })
        state = mid._replace(cache=grown)
    final = run_loop(state, max_len)

    # effective length: position of first EOT after sample_begin (or cur_len)
    pos = jnp.arange(n_ctx)[None, :]
    sampled_region = pos >= n_init
    is_eot = (final.tokens == eot) & sampled_region & (pos < final.cur_len)
    first_eot = jnp.where(
        jnp.any(is_eot, axis=1), jnp.argmax(is_eot, axis=1), final.cur_len
    )
    return GreedyResult(
        tokens=final.tokens,
        lengths=first_eot.astype(jnp.int32),
        sum_logprobs=final.sum_logprobs,
        no_speech_probs=no_speech_probs,
    )
