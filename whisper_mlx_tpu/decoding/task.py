"""Decoding task: options → initial tokens → jitted loop → results.

Equivalent of the reference dependency's ``DecodingOptions``/``DecodingTask``
orchestration (SURVEY.md §2.1 "Decoding strategies"): sot-sequence
construction (language/task/prompt/prefix), suppress-list assembly, the
greedy or beam loop, and host-side result metrics (avg_logprob, zlib
compression ratio, no_speech_prob) that drive the temperature-fallback
ladder in the transcribe seek loop.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.decoding.filters import FilterConfig, make_suppress_mask
from whisper_mlx_tpu.decoding.greedy import greedy_decode
from whisper_mlx_tpu.decoding.tokenizer import WhisperTokenizer
from whisper_mlx_tpu.models.whisper import Params, WhisperConfig, encode


@dataclass(frozen=True)
class DecodingOptions:
    """Mirror of the reference's decode options surface."""

    task: str = "transcribe"
    language: str | None = None
    temperature: float = 0.0
    sample_len: int | None = None
    best_of: int | None = None  # sampling candidates (temperature > 0)
    beam_size: int | None = None
    patience: float | None = None
    length_penalty: float | None = None
    prompt: str | Sequence[int] | None = None  # condition-on-previous-text tokens
    prefix: str | Sequence[int] | None = None
    suppress_tokens: str | Sequence[int] | None = "-1"  # "-1" = non-speech default
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: float | None = 1.0
    fp16: bool = False


@dataclass
class DecodingResult:
    tokens: list[int]
    text: str
    language: str
    avg_logprob: float
    no_speech_prob: float
    temperature: float
    compression_ratio: float
    # decoding/speculative.py: {"proposed", "accepted", "target_calls"}
    spec_stats: dict | None = None


def _self_phases() -> tuple[int, ...] | None:
    """Growing-cache phase ladder override (WTPU_SELF_PHASES="64,128,192").

    Read HERE, outside jit, so the choice is a STATIC greedy_decode arg and
    participates in the jit cache key (an in-trace env read would bake the
    first value into every later call). None → layout default (greedy.py);
    "" → single exact-horizon allocation."""
    import os

    raw = os.environ.get("WTPU_SELF_PHASES")
    if raw is None:
        return None
    return tuple(int(x) for x in raw.split(",") if x)


def _decode_unroll() -> int:
    """Greedy-loop unroll factor (WTPU_DECODE_UNROLL, default 1).

    Read outside jit (static greedy_decode arg → jit cache key), same
    rationale as _self_phases. k>1 chains k decode steps per while-loop
    iteration; results are bit-identical (greedy.py run_loop)."""
    import os

    return int(os.environ.get("WTPU_DECODE_UNROLL", "1"))


def compression_ratio(text: str) -> float:
    """zlib ratio used by the hallucination heuristics (ratio > 2.4 ⇒ retry)."""
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def _resolve_suppress(options: DecodingOptions, tokenizer: WhisperTokenizer) -> tuple[int, ...]:
    st = options.suppress_tokens
    if isinstance(st, str):
        st = [int(t) for t in st.split(",")] if st else []
    st = list(st or [])
    if -1 in st:
        st = [t for t in st if t >= 0]
        st.extend(tokenizer.non_speech_tokens)
    suppress = set(st)
    suppress.update(
        [tokenizer.transcribe, tokenizer.translate, tokenizer.sot,
         tokenizer.sot_prev, tokenizer.sot_lm]
    )
    if tokenizer.no_speech is not None:
        suppress.add(tokenizer.no_speech)
    return tuple(sorted(suppress))


def build_initial_tokens(
    tokenizer: WhisperTokenizer, options: DecodingOptions, n_text_ctx: int
) -> tuple[list[int], int, int]:
    """→ (initial_tokens, sot_index, sample_begin)."""
    tokens = list(
        tokenizer.sot_sequence_including_notimestamps
        if options.without_timestamps
        else tokenizer.sot_sequence
    )
    sot_index = 0

    if options.prefix is not None:
        prefix = (
            tokenizer.encode(" " + options.prefix.strip())
            if isinstance(options.prefix, str)
            else list(options.prefix)
        )
        if options.sample_len is not None:
            prefix = prefix[-(n_text_ctx // 2 - options.sample_len):]
        tokens = tokens + prefix

    if options.prompt is not None:
        prompt = (
            tokenizer.encode(" " + options.prompt.strip())
            if isinstance(options.prompt, str)
            else list(options.prompt)
        )
        prev = [tokenizer.sot_prev] + prompt[-(n_text_ctx // 2 - 1):]
        tokens = prev + tokens
        sot_index = len(prev)

    sample_begin = len(tokens)
    return tokens, sot_index, sample_begin


def detect_language(
    params: Params,
    audio_states: jnp.ndarray,
    tokenizer: WhisperTokenizer,
    config: WhisperConfig,
) -> tuple[list[str], np.ndarray]:
    """Single forward pass on [sot] → per-window language + probs.

    Mirrors the reference behavior of softmax over language tokens only.
    """
    from whisper_mlx_tpu.models.whisper import cross_kv, decode_step, init_kv_cache

    batch = audio_states.shape[0]
    xkv = cross_kv(params, audio_states, config)
    cache = init_kv_cache(config, batch)
    toks = jnp.full((batch, 1), tokenizer.sot, jnp.int32)
    logits, _, _ = decode_step(params, toks, jnp.int32(0), cache, xkv, config)
    logits = np.asarray(logits[:, 0].astype(jnp.float32))
    lang_ids = np.asarray(tokenizer.all_language_tokens)
    mask = np.full(logits.shape[-1], -np.inf, np.float32)
    mask[lang_ids] = 0.0
    probs = jax.nn.softmax(jnp.asarray(logits + mask), axis=-1)
    probs = np.asarray(probs)[:, lang_ids]
    best = probs.argmax(axis=-1)
    codes = [tokenizer.all_language_codes[i] for i in best]
    return codes, probs.max(axis=-1)


def decode(
    params: Params,
    mel_or_states: jnp.ndarray,
    tokenizer: WhisperTokenizer,
    config: WhisperConfig,
    options: DecodingOptions = DecodingOptions(),
    *,
    states_precomputed: bool = False,
    rng: jax.Array | None = None,
    defer: bool = False,
) -> "list[DecodingResult] | Callable[[], list[DecodingResult]]":
    """Decode a batch of 30 s windows → one DecodingResult per window.

    ``mel_or_states``: (batch, 3000, n_mels) mel, or (batch, 1500, d)
    encoder states when ``states_precomputed`` (the transcribe seek loop
    reuses encoder output across the temperature-fallback ladder).

    ``defer=True`` returns a zero-arg callable instead of the result list:
    all device work is DISPATCHED (jax dispatch is async) but the
    device→host fetch happens when the callable runs. Callers overlap the
    next batch's dispatch with the current batch's execution —
    steady-state serving hides the per-batch host round-trips behind
    device compute (greedy path only).
    """
    # packed 4/8-bit checkpoints: at batched decode shapes, dense weights
    # passed as jit ARGUMENTS are the fastest serving form measured on v5e
    # (ops/quant.py maybe_dense_decode_params — one cached device-side
    # dequant, then the loop runs at exact bf16 speed); few-row decodes
    # keep the packed tree for the fused Pallas kernel's smaller stream.
    from whisper_mlx_tpu.ops.quant import maybe_dense_decode_params

    n_rows = mel_or_states.shape[0] * (
        options.beam_size or options.best_of or 1)
    params = maybe_dense_decode_params(params, n_rows, dtype=config.dtype)

    if options.beam_size is not None:
        from whisper_mlx_tpu.decoding.beam import beam_decode_task

        assert not defer, "defer is greedy-only"
        # Integer-MXU attention dots default ON for beam over quantized
        # caches: +4.8% on hardware at the serving beam config (103.6 vs
        # 98.9 RTF/chip, bench_history r5) — opposite sign from greedy,
        # where the same lowering measured -10% and stays opt-in. Quality
        # bounds: docs/kv_quant_study.md (perturbation inside the shipped
        # kv4/self8 band). Escape hatch: WTPU_BEAM_ATTN_MXU=0. fp beam
        # caches have no integer lowering, hence the quantized-only gate.
        import dataclasses as _dc
        import os as _os

        if (not config.attn_mxu
                and config.kv_bits in (4, 8)
                and config.self_kv_bits in (4, 8)
                and _os.environ.get("WTPU_BEAM_ATTN_MXU", "1") == "1"):
            config = _dc.replace(config, attn_mxu=True)
        return beam_decode_task(
            params, mel_or_states, tokenizer, config, options,
            states_precomputed=states_precomputed,
        )

    audio_states = (
        mel_or_states if states_precomputed else encode(params, mel_or_states, config)
    )
    batch = audio_states.shape[0]

    init_tokens, sot_index, sample_begin = build_initial_tokens(
        tokenizer, options, config.n_text_ctx
    )
    sample_len = options.sample_len or (config.n_text_ctx // 2)

    suppress_ids = _resolve_suppress(options, tokenizer)
    blank_ids = tuple(tokenizer.encode(" ")) + (tokenizer.eot,) if options.suppress_blank else ()
    n_vocab = config.n_vocab
    always_np, begin_np = make_suppress_mask(n_vocab, suppress_ids, blank_ids)

    max_initial_ts_idx = (
        round(options.max_initial_timestamp / 0.02)
        if options.max_initial_timestamp is not None
        else None
    )
    filter_cfg = FilterConfig(
        eot=tokenizer.eot,
        no_timestamps=tokenizer.no_timestamps,
        timestamp_begin=tokenizer.timestamp_begin,
        sample_begin=sample_begin,
        max_initial_timestamp_index=max_initial_ts_idx,
        apply_timestamp_rules=not options.without_timestamps,
    )

    n_candidates = options.best_of if (options.best_of and options.temperature > 0) else 1
    # best_of sampling: n_candidates decode rows per window, ranked by
    # sum_logprob. The windows' cross K/V are SHARED across candidates
    # (share_xkv_groups) — audio_states stays unreplicated.
    eff_batch = audio_states.shape[0] * n_candidates
    initial = jnp.tile(jnp.asarray(init_tokens, jnp.int32)[None, :], (eff_batch, 1))
    if rng is None:
        rng = jax.random.PRNGKey(0)

    result = greedy_decode(
        params,
        audio_states,
        initial,
        jnp.asarray(always_np),
        jnp.asarray(begin_np),
        jnp.float32(options.temperature),
        rng,
        config=config,
        filter_cfg=filter_cfg,
        sample_len=sample_len,
        sot_index=sot_index,
        no_speech_token=tokenizer.no_speech,
        share_xkv_groups=n_candidates,
        phases=_self_phases(),
        unroll=_decode_unroll(),
    )

    def finalize() -> list[DecodingResult]:
        # one batched fetch (vs four np.asarray round-trips through the
        # device relay); this is the only host sync in the greedy path
        tokens_np, lengths, sum_lp, ns_probs = jax.device_get(
            (result.tokens, result.lengths, result.sum_logprobs,
             result.no_speech_probs)
        )
        return _rank_greedy(tokens_np, lengths, sum_lp, ns_probs, batch,
                            n_candidates, sample_begin, tokenizer, options)

    if defer:
        return finalize
    return finalize()


def _rank_greedy(tokens_np, lengths, sum_lp, ns_probs, batch: int,
                 n_candidates: int, sample_begin: int,
                 tokenizer: WhisperTokenizer,
                 options: DecodingOptions) -> list[DecodingResult]:
    """Host-side tail of :func:`decode`: pick the best candidate per window
    (MaximumLikelihoodRanker semantics) and build DecodingResults."""
    results: list[DecodingResult] = []
    for w in range(batch):
        cands = range(w * n_candidates, (w + 1) * n_candidates)
        best, best_score = None, -np.inf
        for c in cands:
            toks = tokens_np[c, sample_begin : lengths[c]].tolist()
            n_sampled = len(toks) + 1  # +1 for EOT, whisper's avg denominator
            avg_lp = float(sum_lp[c]) / n_sampled
            # MaximumLikelihoodRanker semantics (whisper decoding): normalize
            # total logprob by length — or the GoogleNMT penalty when
            # length_penalty is set — so best_of isn't biased toward shorter
            # candidates (matches beam.py's finished-pool ranking).
            if options.length_penalty is None:
                penalty = float(max(len(toks), 1))
            else:
                penalty = ((5.0 + len(toks)) / 6.0) ** options.length_penalty
            score = float(sum_lp[c]) / penalty
            if score > best_score:
                best_score = score
                best = (toks, avg_lp, c)
        toks, avg_lp, c = best
        text = tokenizer.decode(toks).strip()
        results.append(
            DecodingResult(
                tokens=toks,
                text=text,
                language=tokenizer.language,
                avg_logprob=avg_lp,
                no_speech_prob=float(ns_probs[c]),
                temperature=options.temperature,
                compression_ratio=compression_ratio(text),
            )
        )
    return results
