"""Speculative whisper decoding: draft-model propose, target verify — one jit.

The serving decode loop streams the target's cross-attention K/V (the
dominant HBM stream — docs/performance.md) once PER TOKEN. Speculative
decoding commits up to ``k+1`` tokens per target call: a cheap draft
decoder (e.g. large-v3-turbo's 4-layer decoder, which shares large-v3's
encoder) proposes ``k`` tokens; the target verifies all of them in ONE
(k+1)-position forward, so the 32-layer cross-KV stream is read once per
~(acceptance·k+1) committed tokens. With greedy acceptance the output is
PROVABLY token-identical to target-only greedy decoding (the same argument
as the LLM path, inference/speculative.py — accept the longest prefix where
each proposal equals the target's filtered argmax; the target's argmax at
the first mismatch becomes the next committed token).

Unlike the LLM path (a host loop), this is whisper-semantics-complete and
fully jitted: suppress/blank masks and the timestamp grammar
(decoding/filters.py) are applied at EVERY proposal and verify position
with that position's exact token prefix, so timestamp-rule state stays
bit-identical to the sequential loop. The reference stack has no
speculative mode (mlx_whisper decodes token-by-token, SURVEY.md §3.1);
this is a TPU-first serving feature for real checkpoint pairs
(large-v3 + turbo draft), exactness-tested offline.

Numerics note: "token-identical" holds under exact arithmetic (the verify
logits ARE the sequential greedy logits) and is asserted bit-for-bit on
CPU f32 (tests/test_spec_whisper.py). On TPU bf16, the (k+1)-position
verify matmul's low bits can differ from the 1-position step's, so a
near-tie argmax may flip — the same caveat as any prefill-vs-incremental
bf16 comparison (observed on the LLM bracket,
scripts/bench_speculative.py).

Cache-garbage invariant (both caches, same as inference/speculative.py):
after an iteration commits m tokens, positions [s_len, s_len+k) may hold
proposal K/V that diverged from the committed sequence; the next
iteration's writes cover exactly [s_len-1, s_len+k) before the causal mask
(keys ≤ query position) can expose any stale entry.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.decoding.filters import FilterConfig, apply_filters
from whisper_mlx_tpu.models.whisper import (
    Params,
    WhisperConfig,
    cross_kv,
    decode_step,
    init_kv_cache,
)


class SpecResult(NamedTuple):
    tokens: jnp.ndarray  # (1, n_ctx) int32, valid up to lengths
    lengths: jnp.ndarray  # (1,) int32 — first-EOT position (abs), else s_len
    sum_logprobs: jnp.ndarray  # (1,) fp32 over sampled tokens incl. EOT
    no_speech_probs: jnp.ndarray  # (1,) fp32 at the SOT position
    proposed: jnp.ndarray  # () int32 — draft tokens proposed
    accepted: jnp.ndarray  # () int32 — proposals accepted by the target
    target_calls: jnp.ndarray  # () int32 — verify forwards (excl. prefill)


@partial(
    jax.jit,
    static_argnames=("config_t", "config_d", "filter_cfg", "sample_len",
                     "sot_index", "k"),
)
def spec_decode(
    params_t: Params,
    params_d: Params,
    audio_states_t: jnp.ndarray,  # (1, 1500, d_t) target encoder output
    audio_states_d: jnp.ndarray,  # (1, 1500, d_d) draft encoder output
    initial_tokens: jnp.ndarray,  # (1, n_init)
    suppress_mask: jnp.ndarray,
    blank_mask: jnp.ndarray,
    config_t: WhisperConfig,
    config_d: WhisperConfig,
    filter_cfg: FilterConfig,
    sample_len: int,
    sot_index: int,
    no_speech_token: int,
    k: int = 4,
) -> SpecResult:
    """Greedy speculative decode of ONE window; token-identical to
    ``greedy_decode(temperature=0)`` on the target (tests/test_spec_whisper).
    """
    assert config_t.n_vocab == config_d.n_vocab, "draft must share the vocab"
    _, n_init = initial_tokens.shape
    assert n_init >= 2, "2-token draft sync needs >= 2 initial tokens"
    n_ctx = config_t.n_text_ctx
    eot = filter_cfg.eot
    max_len = min(n_init + sample_len, n_ctx)
    # k+1-wide commit writes must never clamp against the buffer end
    buf_len = n_ctx + k + 1
    horizon = max_len + k + 1

    xkv_t = cross_kv(params_t, audio_states_t, config_t)
    xkv_d = cross_kv(params_d, audio_states_d, config_d)
    t_cache = init_kv_cache(config_t, 1, max_len=horizon)
    d_cache = init_kv_cache(config_d, 1, max_len=horizon)

    def filt(logits_1v, tokens_buf, cur_len):
        return apply_filters(
            logits_1v.astype(jnp.float32), tokens_buf[:, :n_ctx],
            cur_len, suppress_mask, blank_mask, filter_cfg)

    # ---- prefill (both models) --------------------------------------------
    t_logits, t_cache, _ = decode_step(
        params_t, initial_tokens, jnp.int32(0), t_cache, xkv_t, config_t)
    _, d_cache, _ = decode_step(
        params_d, initial_tokens, jnp.int32(0), d_cache, xkv_d, config_d)
    no_speech_probs = jax.nn.softmax(
        t_logits[:, sot_index].astype(jnp.float32), axis=-1)[:, no_speech_token]

    tokens0 = jnp.zeros((1, buf_len), jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(
        tokens0, initial_tokens.astype(jnp.int32), (0, 0))
    lg0 = filt(t_logits[:, -1], tokens0, jnp.int32(n_init))
    t1 = jnp.argmax(lg0, axis=-1).astype(jnp.int32)  # (1,)
    lp0 = jnp.take_along_axis(
        jax.nn.log_softmax(lg0, axis=-1), t1[:, None], axis=-1)[:, 0]
    tokens0 = jax.lax.dynamic_update_slice(tokens0, t1[:, None], (0, n_init))

    class State(NamedTuple):
        tokens: jnp.ndarray  # (1, buf_len) committed through s_len
        s_len: jnp.ndarray  # committed length; tokens[s_len-1] not in caches
        t_cache: list
        d_cache: list
        sum_logprobs: jnp.ndarray  # (1,)
        done: jnp.ndarray  # (1,) bool
        proposed: jnp.ndarray
        accepted: jnp.ndarray
        target_calls: jnp.ndarray

    state = State(
        tokens=tokens0,
        s_len=jnp.int32(n_init + 1),
        t_cache=t_cache,
        d_cache=d_cache,
        sum_logprobs=lp0,
        done=(t1 == eot),
        proposed=jnp.int32(0),
        accepted=jnp.int32(0),
        target_calls=jnp.int32(0),
    )

    def cond(s: State):
        return (s.s_len < max_len) & ~jnp.all(s.done)

    def body(s: State) -> State:
        last = jax.lax.dynamic_slice(s.tokens, (0, s.s_len - 1), (1, 1))

        # ---- draft: k filtered proposals (scratch holds the prefix) -------
        # 2-token sync: after a FULLY-accepted block the draft cache is
        # missing TWO trailing positions (the last proposal was never fed
        # back, and the bonus token is new); after a partial block, one.
        # Re-feeding [S[-2], S[-1]] covers both (the first write is
        # idempotent), keeping the draft cache hole-free — without this,
        # acceptance silently degrades after every full block (n_init ≥ 2
        # always: SOT sequences are ≥ 2 tokens).
        scratch = s.tokens
        props = []
        sync = jax.lax.dynamic_slice(s.tokens, (0, s.s_len - 2), (1, 2))
        d_logits, d_cache, _ = decode_step(
            params_d, sync, s.s_len - 2, s.d_cache, xkv_d, config_d)
        p = jnp.argmax(filt(d_logits[:, -1], scratch, s.s_len),
                       axis=-1).astype(jnp.int32)
        scratch = jax.lax.dynamic_update_slice(scratch, p[:, None], (0, s.s_len))
        props.append(p)
        for j in range(1, k):
            d_logits, d_cache, _ = decode_step(
                params_d, p[:, None], s.s_len + (j - 1), d_cache, xkv_d,
                config_d)
            p = jnp.argmax(filt(d_logits[:, -1], scratch, s.s_len + j),
                           axis=-1).astype(jnp.int32)
            scratch = jax.lax.dynamic_update_slice(
                scratch, p[:, None], (0, s.s_len + j))
            props.append(p)

        # ---- target: verify [last, p1..pk] in ONE (k+1)-position forward --
        block = jnp.concatenate([last] + [pp[:, None] for pp in props], axis=1)
        v_logits, t_cache, _ = decode_step(
            params_t, block, s.s_len - 1, s.t_cache, xkv_t, config_t)

        g_list, lp_list = [], []
        for i in range(k + 1):
            lg = filt(v_logits[:, i], scratch, s.s_len + i)
            g_i = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # (1,)
            lp_i = jnp.take_along_axis(
                jax.nn.log_softmax(lg, axis=-1), g_i[:, None], axis=-1)[:, 0]
            g_list.append(g_i[0])
            lp_list.append(lp_i[0])
        g = jnp.stack(g_list)  # (k+1,) target's filtered greedy picks
        lp = jnp.stack(lp_list)
        p_vec = jnp.stack([pp[0] for pp in props])  # (k,)

        match = (p_vec == g[:k]).astype(jnp.int32)
        n = jnp.sum(jnp.cumprod(match))  # leading accepted proposals
        idx = jnp.arange(k + 1, dtype=jnp.int32)
        eot_hit = (g == eot) & (idx <= n)
        first_eot = jnp.where(jnp.any(eot_hit),
                              jnp.argmax(eot_hit).astype(jnp.int32),
                              jnp.int32(k + 1))
        m = jnp.minimum(jnp.minimum(n + 1, first_eot + 1),
                        jnp.int32(max_len) - s.s_len)

        # commit: positions s_len+i hold g_i for i < m (g_i == p_{i+1} while
        # accepted); the k+1-wide write's tail beyond m is garbage that the
        # next iteration's scratch/caches overwrite before any read
        tokens = jax.lax.dynamic_update_slice(s.tokens, g[None, :], (0, s.s_len))
        sum_logprobs = s.sum_logprobs + jnp.sum(
            jnp.where(idx < m, lp, 0.0))[None]
        done = s.done | jnp.any((g == eot) & (idx < m))[None]
        return State(
            tokens=tokens,
            s_len=s.s_len + m,
            t_cache=t_cache,
            d_cache=d_cache,
            sum_logprobs=sum_logprobs,
            done=done,
            proposed=s.proposed + jnp.int32(k),
            accepted=s.accepted + jnp.minimum(n, m),
            target_calls=s.target_calls + 1,
        )

    final = jax.lax.while_loop(cond, body, state)

    toks = final.tokens[:, :n_ctx]
    pos = jnp.arange(n_ctx)[None, :]
    cur = jnp.minimum(final.s_len, jnp.int32(max_len))
    is_eot = (toks == eot) & (pos >= n_init) & (pos < cur)
    first_eot = jnp.where(jnp.any(is_eot, axis=1),
                          jnp.argmax(is_eot, axis=1), cur)
    return SpecResult(
        tokens=toks,
        lengths=first_eot.astype(jnp.int32),
        sum_logprobs=final.sum_logprobs,
        no_speech_probs=no_speech_probs,
        proposed=final.proposed,
        accepted=final.accepted,
        target_calls=final.target_calls,
    )


def spec_decode_task(
    params_t: Params,
    params_d: Params,
    mel_or_states,
    tokenizer,
    config_t: WhisperConfig,
    config_d: WhisperConfig,
    options,
    *,
    k: int = 4,
    states_precomputed: bool = False,
    draft_shares_encoder: bool | None = None,
):
    """Host wrapper → list[DecodingResult] (greedy semantics, batch of 1+
    windows decoded sequentially — speculative decoding is a single-stream
    LATENCY feature; batched throughput uses decoding/greedy.py).

    ``draft_shares_encoder`` (default: auto when widths match) reuses the
    target's encoder output for the draft — the large-v3-turbo checkpoint
    keeps large-v3's encoder, so the draft costs only its 4 decoder layers.
    """
    from whisper_mlx_tpu.decoding.filters import make_suppress_mask
    from whisper_mlx_tpu.decoding.task import (
        DecodingResult,
        _resolve_suppress,
        build_initial_tokens,
        compression_ratio,
    )
    from whisper_mlx_tpu.models.whisper import encode

    states_t = (mel_or_states if states_precomputed
                else encode(params_t, mel_or_states, config_t))
    if draft_shares_encoder is None:
        draft_shares_encoder = (
            config_d.n_audio_state == config_t.n_audio_state
            and "encoder" not in params_d)
    if states_precomputed or draft_shares_encoder or "encoder" not in params_d:
        # precomputed states force sharing: the mel is gone. The intended
        # draft (large-v3-turbo) keeps large-v3's encoder, so this is the
        # natural serving configuration anyway.
        states_d = states_t
    else:
        states_d = encode(params_d, mel_or_states, config_d)

    init_tokens, sot_index, sample_begin = build_initial_tokens(
        tokenizer, options, config_t.n_text_ctx)
    sample_len = options.sample_len or (config_t.n_text_ctx // 2)
    suppress_ids = _resolve_suppress(options, tokenizer)
    blank_ids = (tuple(tokenizer.encode(" ")) + (tokenizer.eot,)
                 if options.suppress_blank else ())
    always_np, begin_np = make_suppress_mask(
        config_t.n_vocab, suppress_ids, blank_ids)
    max_initial_ts_idx = (
        round(options.max_initial_timestamp / 0.02)
        if options.max_initial_timestamp is not None else None)
    filter_cfg = FilterConfig(
        eot=tokenizer.eot,
        no_timestamps=tokenizer.no_timestamps,
        timestamp_begin=tokenizer.timestamp_begin,
        sample_begin=sample_begin,
        max_initial_timestamp_index=max_initial_ts_idx,
        apply_timestamp_rules=not options.without_timestamps,
    )

    out = []
    init = jnp.asarray(init_tokens, jnp.int32)[None, :]
    for w in range(states_t.shape[0]):
        res = spec_decode(
            params_t, params_d,
            states_t[w:w + 1], states_d[w:w + 1], init,
            jnp.asarray(always_np), jnp.asarray(begin_np),
            config_t=config_t, config_d=config_d, filter_cfg=filter_cfg,
            sample_len=sample_len, sot_index=sot_index,
            no_speech_token=tokenizer.no_speech, k=k,
        )
        tokens_np = np.asarray(res.tokens)[0]
        L = int(res.lengths[0])
        toks = tokens_np[sample_begin:L].tolist()
        text = tokenizer.decode(toks).strip()
        n_sampled = max(L - sample_begin + 1, 1)  # + EOT, like greedy ranking
        out.append(DecodingResult(
            tokens=toks, text=text, language=tokenizer.language,
            avg_logprob=float(res.sum_logprobs[0]) / n_sampled,
            no_speech_prob=float(res.no_speech_probs[0]),
            temperature=0.0,
            compression_ratio=compression_ratio(text),
            spec_stats={
                "proposed": int(res.proposed),
                "accepted": int(res.accepted),
                "target_calls": int(res.target_calls),
            },
        ))
    return out
