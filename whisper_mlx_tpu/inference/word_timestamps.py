"""Word-level timestamps: cross-attention DTW alignment.

Re-implements the word-timing pipeline the reference gets from mlx_whisper
(SURVEY.md §2.1 "Word timestamps" row): teacher-forced decoder pass
exporting cross-attention of the alignment heads, per-head normalization +
median filter, DTW over the token×frame cost matrix, word grouping via the
tokenizer, and punctuation merging.

TPU design: the teacher-forced pass is ONE ``decode_step`` prefill over the
whole token sequence (no per-token loop) with ``collect_cross_attn=True``;
only the alignment heads are gathered to the host. DTW runs on host (numpy,
anti-diagonal-free row scan — token count is tens, frames ≤1500, so the
O(T·F) DP is microseconds; a C++ native kernel slot exists for batch mode).

Alignment heads: real checkpoints ship a per-model head mask; without one we
default to all heads of the upper half of the decoder (the published
fallback for models lacking dumps).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.decoding.tokenizer import WhisperTokenizer
from whisper_mlx_tpu.models.whisper import (
    Params,
    WhisperConfig,
    cross_kv,
    decode_step,
    encode,
    init_kv_cache,
)

AUDIO_TIME_PER_TOKEN = 0.02


def default_alignment_heads(config: WhisperConfig) -> list[tuple[int, int]]:
    """All heads of the upper half of decoder layers (fallback mask)."""
    lo = config.n_text_layer // 2
    return [(l, h) for l in range(lo, config.n_text_layer) for h in range(config.n_text_head)]


def median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """Median filter along the last axis, reflect-padded (odd width)."""
    if width <= 1 or x.shape[-1] <= width:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotone alignment path minimizing summed cost.

    ``cost`` is (tokens, frames). Returns (text_indices, time_indices) —
    the standard 3-move (↓, →, ↘) DTW traceback. Uses the native C++ kernel
    (native/audio.cc wtpu_dtw) when built; NumPy fallback otherwise.

    Tie-breaking copies the openai/transformers comparator verbatim
    (diag/down only when STRICTLY smaller than both alternatives, else
    right — including the quirk that ``diag == down < right`` takes
    ``right``), so alignment paths are bit-identical to the reference
    implementations on tied costs
    (transformers/models/whisper/generation_whisper.py
    ``_dynamic_time_warping``; verified by
    tests/test_word_timestamps.py::test_dtw_matches_transformers).
    """
    try:
        from whisper_mlx_tpu.native import lib as _native

        if _native is not None:
            return _native.dtw(cost)
    except (ImportError, AttributeError, ValueError):
        pass
    N, M = cost.shape
    D = np.full((N + 1, M + 1), np.inf, dtype=np.float64)
    D[0, 0] = 0.0
    trace = np.zeros((N + 1, M + 1), dtype=np.int8)
    for i in range(1, N + 1):
        row = cost[i - 1]
        prev = D[i - 1]
        cur = D[i]
        # c[j] = row[j-1] + min(prev[j-1] (diag), prev[j] (down), cur[j-1] (right))
        m_diag = prev[:-1]
        m_down = prev[1:]
        c_prev = np.inf
        for j in range(1, M + 1):
            c0, c1, c2 = m_diag[j - 1], m_down[j - 1], c_prev
            if c0 < c1 and c0 < c2:
                best, move = c0, 0  # diagonal
            elif c1 < c0 and c1 < c2:
                best, move = c1, 1  # down (advance token only)
            else:
                best, move = c2, 2  # right (advance frame only)
            c_prev = row[j - 1] + best
            cur[j] = c_prev
            trace[i, j] = move
    # traceback
    i, j = N, M
    text_idx, time_idx = [], []
    while i > 0 and j > 0:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        move = trace[i, j]
        if move == 0:
            i, j = i - 1, j - 1
        elif move == 1:
            i -= 1
        else:
            j -= 1
    return np.array(text_idx[::-1]), np.array(time_idx[::-1])


def alignment_path(
    w: np.ndarray,  # (heads, tokens, 1500) post-softmax cross-attention
    num_frames: int,
    *,
    n_skip_rows: int,
    medfilt_width: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """Post-attention timing pipeline: normalize → median-filter → head-mean
    → DTW. Pure so the differential oracle can feed identical weights here
    and to transformers' ``_extract_token_timestamps``
    (tests/test_word_timestamps.py::test_alignment_times_match_hf_extractor).

    Rows ``[n_skip_rows : -1]`` enter the DTW (openai semantics: drop the
    sot-sequence rows and the row AT eot). Slicing post-softmax weights to
    ``num_frames // 2`` and renormalizing over the kept frames equals
    openai's softmax-after-slice exactly; transformers skips the renorm —
    a known HF-vs-openai divergence that vanishes at full windows.
    """
    w = w[:, :, : num_frames // 2].astype(np.float32)
    w = w / np.maximum(w.sum(-1, keepdims=True), 1e-9)  # renorm over sliced frames
    mean = w.mean(axis=-2, keepdims=True)
    std = w.std(axis=-2, keepdims=True)
    w = (w - mean) / np.maximum(std, 1e-9)
    w = median_filter(w, medfilt_width)
    matrix = w.mean(axis=0)  # (T, frames)
    matrix = matrix[n_skip_rows:-1]  # rows for [no_timestamps, *text_tokens]
    return dtw(-matrix.astype(np.float64))


@dataclass
class WordTiming:
    word: str
    tokens: list[int]
    start: float
    end: float
    probability: float


def find_alignment(
    params: Params,
    config: WhisperConfig,
    tokenizer: WhisperTokenizer,
    text_tokens: list[int],
    mel_window: np.ndarray,  # (3000, n_mels) — one 30 s window
    num_frames: int,
    *,
    medfilt_width: int = 7,
    alignment_heads: list[tuple[int, int]] | None = None,
) -> list[WordTiming]:
    if not text_tokens:
        return []
    # precedence: explicit arg > checkpoint's model-specific mask
    # (config.alignment_heads, loaded from config.json) > upper-half fallback
    heads = (alignment_heads or
             (list(config.alignment_heads) if config.alignment_heads else None)
             or default_alignment_heads(config))
    sot_seq = list(tokenizer.sot_sequence)
    tokens = sot_seq + [tokenizer.no_timestamps] + list(text_tokens) + [tokenizer.eot]
    n_real = len(tokens)

    if config.kv_bits or config.self_kv_bits:
        # alignment needs full-precision cross-attention weights
        import dataclasses

        config = dataclasses.replace(config, kv_bits=0, self_kv_bits=0)
    # bucket the teacher-forced prefill length (pad with EOT to the next
    # multiple of 32): every distinct token count would otherwise trace and
    # compile its OWN executable — minutes per length through this
    # environment's remote-compile relay. Causality makes pad rows inert;
    # all reads below slice the real n_real rows.
    n_pad = min(-(-n_real // 32) * 32, config.n_text_ctx)
    tokens_in = tokens + [tokenizer.eot] * (n_pad - n_real)
    states = encode(params, jnp.asarray(mel_window)[None], config)
    xkv = cross_kv(params, states, config)
    cache = init_kv_cache(config, 1)
    logits, _, cross = decode_step(
        params, jnp.asarray([tokens_in], jnp.int32), jnp.int32(0), cache, xkv,
        config, collect_cross_attn=True,
    )
    # token probabilities (text vocab only), positions predicting text_tokens
    lg = np.asarray(logits[0].astype(jnp.float32))  # (T, V)
    sampled = lg[len(sot_seq) : len(sot_seq) + len(text_tokens), : tokenizer.eot]
    probs = np.exp(sampled - sampled.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    text_token_probs = probs[np.arange(len(text_tokens)), text_tokens]

    # cross: (layers, 1, heads, T, 1500) → selected heads (H, T, frames);
    # keep only the n_real true token rows (the T-axis normalization below
    # must not see the bucket-pad rows)
    cross_np = np.asarray(cross[:, 0].astype(jnp.float32))
    w = np.stack([cross_np[l, h] for l, h in heads])  # (H, T, 1500)
    text_indices, time_indices = alignment_path(
        w[:, :n_real], num_frames, n_skip_rows=len(sot_seq),
        medfilt_width=medfilt_width)

    words, word_tokens = tokenizer.split_to_word_tokens(list(text_tokens) + [tokenizer.eot])
    if len(word_tokens) <= 1:
        return []
    word_boundaries = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))

    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] * AUDIO_TIME_PER_TOKEN
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[np.minimum(word_boundaries[1:], len(jump_times) - 1)]
    word_probs = [
        float(np.mean(text_token_probs[i:j])) if j > i else 0.0
        for i, j in zip(word_boundaries[:-1], word_boundaries[1:])
    ]
    return [
        WordTiming(word=w_, tokens=t_, start=float(s), end=float(e), probability=p)
        for w_, t_, s, e, p in zip(words[:-1], word_tokens[:-1], start_times, end_times, word_probs)
    ]


def merge_punctuations(alignment: list[WordTiming], prepended: str, appended: str) -> None:
    """Fold leading/trailing punctuation into adjacent words (in place)."""
    i, j = len(alignment) - 2, len(alignment) - 1
    while i >= 0:
        prev, fol = alignment[i], alignment[j]
        if prev.word.startswith(" ") and prev.word.strip() in prepended:
            fol.word = prev.word + fol.word
            fol.tokens = prev.tokens + fol.tokens
            prev.word = ""
            prev.tokens = []
        else:
            j = i
        i -= 1
    i, j = 0, 1
    while j < len(alignment):
        prev, fol = alignment[i], alignment[j]
        if not prev.word.endswith(" ") and fol.word in appended:
            prev.word = prev.word + fol.word
            prev.tokens = prev.tokens + fol.tokens
            fol.word = ""
            fol.tokens = []
        else:
            i = j
        j += 1


def add_word_timestamps(
    segments: list,  # list[Segment] from inference.transcribe
    params: Params,
    config: WhisperConfig,
    tokenizer: WhisperTokenizer,
    mel_window: np.ndarray,
    time_offset: float,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    num_frames: int | None = None,
    alignment_heads: list[tuple[int, int]] | None = None,
) -> None:
    """Attach ``words`` lists to each segment of one window (in place)."""
    if not segments:
        return
    text_tokens_per_segment = [
        [t for t in seg.tokens if t < tokenizer.eot] for seg in segments
    ]
    text_tokens = [t for seg in text_tokens_per_segment for t in seg]
    alignment = find_alignment(
        params, config, tokenizer, text_tokens, mel_window,
        num_frames=num_frames or mel_window.shape[0],
        alignment_heads=alignment_heads,
    )
    word_durations = np.array([w.end - w.start for w in alignment if w.end > w.start])
    median_duration = float(np.median(word_durations)) if len(word_durations) else 0.0
    median_duration = min(0.7, median_duration)
    max_duration = median_duration * 2

    # truncate absurdly long words (hallucination symptom)
    if len(word_durations) > 0:
        sentence_end_marks = ".。!！?？"
        for i in range(1, len(alignment)):
            if alignment[i].end - alignment[i].start > max_duration:
                if alignment[i].word in sentence_end_marks:
                    alignment[i].end = alignment[i].start + max_duration
                elif alignment[i - 1].word in sentence_end_marks:
                    alignment[i].start = alignment[i].end - max_duration

    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    word_index = 0
    for segment, seg_tokens in zip(segments, text_tokens_per_segment):
        saved: list[dict] = []
        remaining = len(seg_tokens)
        while word_index < len(alignment) and remaining > 0:
            timing = alignment[word_index]
            if timing.word:
                saved.append({
                    "word": timing.word,
                    "start": round(time_offset + timing.start, 2),
                    "end": round(time_offset + timing.end, 2),
                    "probability": timing.probability,
                })
            remaining -= len(timing.tokens)
            word_index += 1
        segment.words = saved
        # snap segment boundaries to word boundaries (reference behavior)
        if saved:
            segment.start = saved[0]["start"]
            segment.end = saved[-1]["end"]
