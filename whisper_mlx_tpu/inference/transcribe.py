"""transcribe(): the public API — long-form seek loop + fallback ladder.

Re-implements the pipeline the reference delegates to ``mlx_whisper``
(reference ``run:3-6``; SURVEY.md §3.1 call stack): mel over the whole file,
30 s seek windows, per-window decode with the temperature-fallback ladder,
compression-ratio / logprob rejection, no-speech skip, timestamp-token-driven
seek advance, optional conditioning on previous text, and the
``hallucination_silence_threshold`` skip used by the reference launcher.

Two execution modes:

- **sequential** (default): faithful reference semantics — seek advance is
  data-dependent, so windows run one at a time. Parity mode for golden-text
  tests.
- **batched** (``batch_windows=True``): fixed-stride windows, encoder+decoder
  run over the whole batch in one jitted call; pass ``mesh=`` to DP-shard
  the window batch across chips (parallel/sharding.py — GSPMD, token-
  identical to single-device). This is the >400× RTF serving path; text can
  differ slightly from sequential mode at window boundaries
  (condition_on_previous_text must be False, as in the reference's ``run:5``;
  measured agreement stats: docs/wer_protocol.md).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.audio.mel import (
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
)
from whisper_mlx_tpu.decoding.task import DecodingOptions, DecodingResult, decode
from whisper_mlx_tpu.decoding.tokenizer import WhisperTokenizer
from whisper_mlx_tpu.models.whisper import Params, WhisperConfig, encode


@dataclass
class Segment:
    id: int
    seek: int
    start: float
    end: float
    text: str
    tokens: list[int]
    temperature: float
    avg_logprob: float
    compression_ratio: float
    no_speech_prob: float
    words: list[dict] | None = None

    def to_dict(self) -> dict[str, Any]:
        d = {
            "id": self.id, "seek": self.seek, "start": self.start, "end": self.end,
            "text": self.text, "tokens": self.tokens, "temperature": self.temperature,
            "avg_logprob": self.avg_logprob, "compression_ratio": self.compression_ratio,
            "no_speech_prob": self.no_speech_prob,
        }
        if self.words is not None:
            d["words"] = self.words
        return d


def transcribe(
    audio: str | np.ndarray,
    *,
    params: Params,
    config: WhisperConfig,
    tokenizer: WhisperTokenizer,
    temperature: float | Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: float | None = 2.4,
    logprob_threshold: float | None = -1.0,
    no_speech_threshold: float | None = 0.6,
    condition_on_previous_text: bool = True,
    initial_prompt: str | None = None,
    word_timestamps: bool = False,
    hallucination_silence_threshold: float | None = None,
    clip_timestamps: str | list[float] = "0",
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    verbose: bool | None = None,
    batch_windows: bool = False,
    window_batch_size: int = 8,
    mesh: "Any | None" = None,  # jax.sharding.Mesh — DP-shard the batch
    stage_timer: "Any | None" = None,  # runtime.profiling.StageTimer
    draft_params: "Params | None" = None,
    draft_config: "WhisperConfig | None" = None,
    spec_k: int = 4,
    **decode_options: Any,
) -> dict[str, Any]:
    """→ ``{"text", "segments", "language"}`` (reference public contract,
    BASELINE.json / SURVEY.md §2.1)."""
    if isinstance(audio, (str, bytes)) or hasattr(audio, "__fspath__"):
        from whisper_mlx_tpu.audio.decode import load_audio

        audio = load_audio(audio)
    audio = np.asarray(audio, np.float32)

    if stage_timer is None:
        from whisper_mlx_tpu.runtime.profiling import StageTimer

        stage_timer = StageTimer()

    # mel over content + 30 s of zero padding (so the last window is full)
    padded = np.concatenate([audio, np.zeros(N_SAMPLES, np.float32)])
    with stage_timer.stage("mel"):
        mel_all = np.asarray(log_mel_spectrogram(jnp.asarray(padded), n_mels=config.n_mels))
    content_frames = mel_all.shape[0] - N_FRAMES
    content_duration = content_frames * HOP_LENGTH / SAMPLE_RATE

    # language detection on the first window if unset (reference behavior:
    # single [sot] forward, softmax over language tokens — SURVEY.md §2.1)
    language = decode_options.pop("language", None)
    task = decode_options.pop("task", "transcribe")
    if language is None:
        if config.n_vocab < 51865:
            language = "en"  # English-only / synthetic models
        else:
            from whisper_mlx_tpu.decoding.task import detect_language

            with stage_timer.stage("detect_language"):
                first = mel_all[:N_FRAMES]
                if first.shape[0] < N_FRAMES:
                    first = np.concatenate([
                        first,
                        np.zeros((N_FRAMES - first.shape[0], first.shape[1]), np.float32),
                    ])
                states0 = encode(params, jnp.asarray(first)[None], config)
                codes, _probs = detect_language(params, states0, tokenizer, config)
                language = codes[0]
            if verbose:
                print(f"detected language: {language}")
    tokenizer.language = language
    tokenizer.task = task

    if isinstance(temperature, (int, float)):
        temperatures = [float(temperature)]
    else:
        temperatures = list(temperature)

    # clip_timestamps → seek clip ranges in frames
    if isinstance(clip_timestamps, str):
        clip_points = [float(t) for t in clip_timestamps.split(",")] if clip_timestamps else [0.0]
    else:
        clip_points = list(clip_timestamps) or [0.0]
    seek_points = [round(t * FRAMES_PER_SECOND) for t in clip_points]
    if len(seek_points) % 2 == 1:
        # odd number of points: the final clip is open-ended → runs to EOF
        seek_points.append(content_frames)
    seek_clips = list(zip(seek_points[::2], seek_points[1::2]))

    if batch_windows:
        return _transcribe_batched(
            mel_all, content_frames, params, config, tokenizer,
            temperatures, compression_ratio_threshold, logprob_threshold,
            no_speech_threshold, initial_prompt, window_batch_size,
            word_timestamps, decode_options, mesh=mesh,
        )

    input_stride = N_FRAMES // config.n_audio_ctx  # 2 mel frames per token
    time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE  # 0.02 s

    all_tokens: list[int] = []
    all_segments: list[Segment] = []
    prompt_reset_since = 0
    last_speech_timestamp = 0.0  # end of the last aligned word (hallucination logic)
    if initial_prompt is not None:
        initial_prompt_tokens = tokenizer.encode(" " + initial_prompt.strip())
        all_tokens.extend(initial_prompt_tokens)
    else:
        initial_prompt_tokens = []

    def decode_with_fallback(segment_mel: np.ndarray, prompt: list[int] | None) -> DecodingResult:
        with stage_timer.stage("encode"):
            states = encode(params, jnp.asarray(segment_mel)[None], config)
        result: DecodingResult | None = None
        for i, t in enumerate(temperatures):
            opts = DecodingOptions(
                task=task, language=language, temperature=t,
                prompt=prompt if prompt else None,
                **{k: v for k, v in decode_options.items()},
            )
            if t > 0:
                # beam/patience only apply at t==0 (reference ladder semantics)
                opts = replace(opts, beam_size=None, patience=None,
                               best_of=opts.best_of or 5)
            # best_of is a t>0 feature (decode() ignores it at t==0), so the
            # draft path gates only on greedy + no beam
            use_spec = (t == 0 and draft_params is not None
                        and opts.beam_size is None)
            with stage_timer.stage("decode"):
                if use_spec:
                    # draft-assisted greedy (decoding/speculative.py):
                    # token-identical to plain greedy, fewer target passes
                    from whisper_mlx_tpu.decoding.speculative import (
                        spec_decode_task)

                    result = spec_decode_task(
                        params, draft_params, states, tokenizer, config,
                        draft_config or config, opts, k=spec_k,
                        states_precomputed=True,
                    )[0]
                else:
                    result = decode(
                        params, states, tokenizer, config, opts,
                        states_precomputed=True,
                        rng=jax.random.PRNGKey(int(t * 1000) + 17 * len(all_segments)),
                    )[0]
            needs_fallback = False
            if (compression_ratio_threshold is not None
                    and result.compression_ratio > compression_ratio_threshold):
                needs_fallback = True
            if (logprob_threshold is not None
                    and result.avg_logprob < logprob_threshold):
                needs_fallback = True
            if (no_speech_threshold is not None
                    and result.no_speech_prob > no_speech_threshold
                    and logprob_threshold is not None
                    and result.avg_logprob < logprob_threshold):
                needs_fallback = False  # silence: don't ladder, skip outside
            if not needs_fallback:
                break
        return result

    for seek_clip_start, seek_clip_end in seek_clips:
        seek = seek_clip_start
        while seek < min(seek_clip_end, content_frames):
            time_offset = seek * HOP_LENGTH / SAMPLE_RATE
            segment_size = min(N_FRAMES, content_frames - seek, seek_clip_end - seek)
            mel_segment = mel_all[seek : seek + segment_size]
            segment_duration = segment_size * HOP_LENGTH / SAMPLE_RATE
            if mel_segment.shape[0] < N_FRAMES:
                # reference pads the trailing window with zeros in mel space
                mel_segment = np.concatenate([
                    mel_segment,
                    np.zeros((N_FRAMES - mel_segment.shape[0], mel_segment.shape[1]), np.float32),
                ])

            # reference semantics: prompt = everything since the last reset;
            # with condition_on_previous_text=False the reset happens every
            # window, so only the initial_prompt reaches window 0.
            prompt = all_tokens[prompt_reset_since:]
            result = decode_with_fallback(mel_segment, prompt)
            tokens = np.asarray(result.tokens)

            if no_speech_threshold is not None:
                should_skip = result.no_speech_prob > no_speech_threshold
                if (logprob_threshold is not None
                        and result.avg_logprob > logprob_threshold):
                    should_skip = False  # confident text overrides no-speech
                if should_skip:
                    seek += segment_size
                    continue

            previous_seek = seek
            current_segments: list[Segment] = []

            ts_begin = tokenizer.timestamp_begin
            timestamp_tokens = tokens >= ts_begin
            single_timestamp_ending = (
                len(tokens) >= 2 and not timestamp_tokens[-2] and timestamp_tokens[-1]
            )
            consecutive = np.where(timestamp_tokens[:-1] & timestamp_tokens[1:])[0] + 1

            def make_segment(start, end, seg_tokens):
                text_tokens = [t for t in seg_tokens if t < tokenizer.eot]
                return Segment(
                    id=len(all_segments) + len(current_segments),
                    seek=previous_seek,
                    start=start, end=end,
                    text=tokenizer.decode(text_tokens),
                    tokens=list(map(int, seg_tokens)),
                    temperature=result.temperature,
                    avg_logprob=result.avg_logprob,
                    compression_ratio=result.compression_ratio,
                    no_speech_prob=result.no_speech_prob,
                )

            if len(consecutive) > 0:
                slices = consecutive.tolist()
                if single_timestamp_ending:
                    slices.append(len(tokens))
                last_slice = 0
                for current_slice in slices:
                    seg = tokens[last_slice:current_slice]
                    start_pos = seg[0] - ts_begin
                    end_pos = seg[-1] - ts_begin
                    current_segments.append(make_segment(
                        time_offset + start_pos * time_precision,
                        time_offset + end_pos * time_precision,
                        seg,
                    ))
                    last_slice = current_slice
                if single_timestamp_ending:
                    seek += segment_size
                else:
                    last_ts_pos = int(tokens[last_slice - 1] - ts_begin)
                    seek += last_ts_pos * input_stride
            else:
                duration = segment_duration
                timestamps = tokens[timestamp_tokens]
                if len(timestamps) > 0 and timestamps[-1] != ts_begin:
                    duration = float(timestamps[-1] - ts_begin) * time_precision
                current_segments.append(make_segment(
                    time_offset, time_offset + duration, tokens
                ))
                seek += segment_size

            if seek <= previous_seek:
                # guard: a degenerate 0.00/0.00 timestamp pair would stall the
                # loop; force progress past this window
                seek = previous_seek + segment_size

            if word_timestamps:
                from whisper_mlx_tpu.inference.word_timestamps import add_word_timestamps

                with stage_timer.stage("align"):
                    add_word_timestamps(
                        current_segments, params, config, tokenizer,
                        np.asarray(mel_segment), time_offset,
                        prepend_punctuations, append_punctuations,
                        num_frames=segment_size,
                    )
                # aligned timestamps beat predicted ones: when the window did
                # not end on a clean timestamp pair, re-seek to the end of the
                # last aligned word (whisper word_timestamps semantics)
                if not single_timestamp_ending:
                    last_word_end = _get_end(current_segments)
                    if last_word_end is not None and last_word_end > time_offset:
                        seek = round(last_word_end * FRAMES_PER_SECOND)

                # hallucination-silence skip (the reference launcher passes
                # threshold=1 — reference run:6; semantics follow the
                # openai/mlx-whisper heuristic the flag contracts to)
                if hallucination_silence_threshold is not None:
                    seek, drop_window = _hallucination_reseek(
                        current_segments,
                        seek=seek,
                        previous_seek=previous_seek,
                        segment_size=segment_size,
                        time_offset=time_offset,
                        segment_duration=segment_duration,
                        content_frames=content_frames,
                        content_duration=content_duration,
                        threshold=hallucination_silence_threshold,
                        last_speech_timestamp=last_speech_timestamp,
                        single_timestamp_ending=single_timestamp_ending,
                    )
                    if drop_window:
                        continue

                last_word_end = _get_end(current_segments)
                if last_word_end is not None:
                    last_speech_timestamp = last_word_end

            for seg in current_segments:
                # reference keeps degenerate segments but blanks their content
                if seg.start == seg.end or not seg.text.strip():
                    seg.text = ""
                    seg.tokens = []
                    seg.words = [] if seg.words is not None else None
                all_segments.append(seg)
                all_tokens.extend(seg.tokens)

            if not condition_on_previous_text or result.temperature > 0.5:
                prompt_reset_since = len(all_tokens)

            if verbose:
                for seg in current_segments:
                    print(f"[{seg.start:7.2f} → {seg.end:7.2f}] {seg.text}")

    text = "".join(s.text for s in all_segments)
    return {
        "text": text,
        "segments": [s.to_dict() for s in all_segments],
        "language": language,
        "stages": stage_timer.summary(),
    }


# --- hallucination-silence helpers (whisper anomaly heuristic) --------------

_ANOMALY_PUNCT = "\"'“¿([{-\"'.。,，!！?？:：”)]}、"


def _word_anomaly_score(word: dict) -> float:
    """Score how implausible one aligned word looks: low probability,
    impossibly short, or suspiciously long durations all add to the score."""
    probability = word.get("probability", 0.0)
    duration = word["end"] - word["start"]
    score = 0.0
    if probability < 0.15:
        score += 1.0
    if duration < 0.133:
        score += (0.133 - duration) * 15.0
    if duration > 2.0:
        score += duration - 2.0
    return score


def _is_segment_anomaly(segment: "Segment | None") -> bool:
    """A segment is anomalous when its first few non-punctuation words are
    collectively implausible (score ≥ 3, or nearly every word scores)."""
    if segment is None or not segment.words:
        return False
    words = [w for w in segment.words if w["word"].strip() not in _ANOMALY_PUNCT]
    words = words[:8]
    if not words:
        return False
    score = sum(_word_anomaly_score(w) for w in words)
    return score >= 3.0 or score + 0.01 >= len(words)


def _next_words_segment(segments: list["Segment"]) -> "Segment | None":
    return next((s for s in segments if s.words), None)


def _get_end(segments: list["Segment"]) -> float | None:
    """End time of the last aligned word across ``segments`` (None if none)."""
    return next(
        (w["end"] for s in reversed(segments) for w in reversed(s.words or [])),
        None,
    )


def _hallucination_reseek(
    current_segments: list["Segment"],
    *,
    seek: int,
    previous_seek: int,
    segment_size: int,
    time_offset: float,
    segment_duration: float,
    content_frames: int,
    content_duration: float,
    threshold: float,
    last_speech_timestamp: float,
    single_timestamp_ending: bool,
) -> tuple[int, bool]:
    """``hallucination_silence_threshold`` seek logic. Mutates
    ``current_segments`` (may truncate trailing hallucinations) and returns
    ``(new_seek, drop_window)``; ``drop_window=True`` means the caller should
    discard the window entirely and re-decode from ``new_seek``.

    Three rules, applied in order:
    1. long silent tail after the last aligned word → re-window there;
    2. anomalous *first* segment after a silent lead-in gap > threshold →
       drop the window, re-seek to the anomaly start;
    3. anomalous segment surrounded by silence mid-window → truncate the
       segment list at it and re-seek just past its start.
    """
    window_end_time = time_offset + segment_duration
    if not single_timestamp_ending:
        last_word_end = _get_end(current_segments)
        if last_word_end is not None and last_word_end > time_offset:
            remaining = window_end_time - last_word_end
            if remaining > threshold:
                seek = round(last_word_end * FRAMES_PER_SECOND)
            else:
                seek = previous_seek + segment_size

    first_segment = _next_words_segment(current_segments)
    if first_segment is not None and _is_segment_anomaly(first_segment):
        gap = first_segment.start - time_offset
        if gap > threshold:
            return previous_seek + round(gap * FRAMES_PER_SECOND), True

    hal_last_end = last_speech_timestamp
    for si, segment in enumerate(current_segments):
        if not segment.words:
            continue
        if _is_segment_anomaly(segment):
            next_segment = _next_words_segment(current_segments[si + 1:])
            if next_segment is not None:
                hal_next_start = next_segment.words[0]["start"]
            else:
                hal_next_start = time_offset + segment_duration
            silence_before = (
                segment.start - hal_last_end > threshold
                or segment.start < threshold
                or segment.start - time_offset < 2.0
            )
            silence_after = (
                hal_next_start - segment.end > threshold
                or _is_segment_anomaly(next_segment)
                or window_end_time - segment.end < 2.0
            )
            if silence_before and silence_after:
                seek = round(max(time_offset + 1, segment.start) * FRAMES_PER_SECOND)
                if content_duration - segment.end < threshold:
                    seek = content_frames
                current_segments[si:] = []
                break
        hal_last_end = segment.end
    return seek, False


# ---------------------------------------------------------------------------
# batched high-throughput mode
# ---------------------------------------------------------------------------


def _transcribe_batched(
    mel_all: np.ndarray,
    content_frames: int,
    params: Params,
    config: WhisperConfig,
    tokenizer: WhisperTokenizer,
    temperatures: list[float],
    compression_ratio_threshold: float | None,
    logprob_threshold: float | None,
    no_speech_threshold: float | None,
    initial_prompt: str | None,
    window_batch_size: int,
    word_timestamps: bool,
    decode_options: dict,
    mesh: "Any | None" = None,
) -> dict[str, Any]:
    """Fixed-stride windows, batched decode. The mesh-sharded serving path:
    every window is independent (condition_on_previous_text=False semantics,
    matching the reference launcher's flag — reference ``run:5``).

    With ``mesh``, params are committed over the mesh (TP-split fp trees,
    replicated quantized ones) and every window chunk is sharded over "dp"
    — GSPMD compiles the same encode/decode jits SPMD, token-identical to
    single-device (tests/test_transcribe.py::test_transcribe_mesh_token_identical).
    Replaces the reference's single-writer lock (``daemon/server.py:280``)."""
    if mesh is not None:
        from whisper_mlx_tpu.parallel.sharding import shard_params

        dp = int(mesh.shape.get("dp", 1))
        # the chunk batch must divide evenly over "dp" — round up
        window_batch_size = -(-window_batch_size // dp) * dp
        params = shard_params(params, mesh)
    n_windows = max(1, int(np.ceil(content_frames / N_FRAMES)))
    windows = []
    for w in range(n_windows):
        seg = mel_all[w * N_FRAMES : w * N_FRAMES + N_FRAMES]
        if seg.shape[0] < N_FRAMES:
            seg = np.concatenate(
                [seg, np.zeros((N_FRAMES - seg.shape[0], seg.shape[1]), np.float32)]
            )
        windows.append(seg)
    mel_batch = np.stack(windows)  # (n_windows, 3000, n_mels)

    prompt = tokenizer.encode(" " + initial_prompt.strip()) if initial_prompt else None
    all_segments: list[Segment] = []
    seg_id = 0

    # packed 4/8-bit checkpoints: convert once here so the ENCODER also runs
    # on dense jit-argument weights (see ops/quant.py
    # maybe_dense_decode_params; decode() would convert anyway)
    from whisper_mlx_tpu.ops.quant import maybe_dense_decode_params

    params = maybe_dense_decode_params(
        params,
        window_batch_size * (decode_options.get("beam_size")
                             or decode_options.get("best_of") or 1),
        dtype=config.dtype)

    def _rung_opts(t: float) -> DecodingOptions:
        opts = DecodingOptions(
            task=tokenizer.task, language=tokenizer.language, temperature=t,
            prompt=prompt, **decode_options,
        )
        if t > 0:
            opts = replace(opts, beam_size=None, patience=None)
        return opts

    def _launch_chunk(start: int):
        """Dispatch one chunk's encode + first ladder rung; defer the fetch
        so the NEXT chunk's dispatch overlaps this one's device execution
        (cross-chunk pipelining — chunks are independent windows)."""
        chunk = mel_batch[start : start + window_batch_size]
        # pad chunk to the full batch size so one executable serves all chunks
        real = chunk.shape[0]
        if real < window_batch_size:
            chunk = np.concatenate(
                [chunk, np.zeros((window_batch_size - real, *chunk.shape[1:]), np.float32)]
            )
        chunk_dev = jnp.asarray(chunk)
        if mesh is not None:
            from whisper_mlx_tpu.parallel.sharding import shard_batch

            chunk_dev = shard_batch(chunk_dev, mesh)
        states = encode(params, chunk_dev, config)
        opts0 = _rung_opts(temperatures[0])
        rng0 = jax.random.PRNGKey(int(temperatures[0] * 1000))
        if opts0.beam_size is not None:  # defer is greedy-only
            r0 = decode(params, states, tokenizer, config, opts0,
                        states_precomputed=True, rng=rng0)
            fin0 = lambda: r0  # noqa: E731
        else:
            fin0 = decode(params, states, tokenizer, config, opts0,
                          states_precomputed=True, rng=rng0, defer=True)
        return chunk, real, states, fin0

    starts = list(range(0, n_windows, window_batch_size))
    launched = _launch_chunk(starts[0])
    for si, start in enumerate(starts):
        chunk, real, states, fin0 = launched
        if si + 1 < len(starts):  # one-step-lag: dispatch the next chunk now
            launched = _launch_chunk(starts[si + 1])
        results = [None] * real
        pending = list(range(real))
        for ti, t in enumerate(temperatures):
            if not pending:
                break
            if ti == 0:
                # first rung: every window decodes; result was dispatched in
                # _launch_chunk (temperature is traced — decoding/greedy.py)
                batch_results, idx_map = fin0(), list(range(real))
            else:
                # retry rungs decode ONLY the pending windows (VERDICT r2
                # item 6: re-decoding the whole chunk multiplies serving
                # cost by the ladder depth). Pad the gather to the next
                # power of two so executable count stays O(log batch).
                bucket = 1 << (len(pending) - 1).bit_length()
                if mesh is not None:  # keep retry shapes dp-divisible
                    dp = int(mesh.shape.get("dp", 1))
                    bucket = -(-bucket // dp) * dp
                bucket = min(bucket, window_batch_size)
                sel = (pending + [pending[-1]] * (bucket - len(pending)))[:bucket]
                sub_states = states[jnp.asarray(sel)]
                if mesh is not None:
                    from whisper_mlx_tpu.parallel.sharding import shard_batch

                    sub_states = shard_batch(sub_states, mesh)
                idx_map = pending
                batch_results = decode(
                    params, sub_states, tokenizer, config, _rung_opts(t),
                    states_precomputed=True,
                    rng=jax.random.PRNGKey(int(t * 1000)),
                )
            still = []
            for j, i in enumerate(idx_map):
                r = batch_results[j]
                results[i] = r  # latest attempt (kept if the ladder exhausts)
                ok = True
                if (compression_ratio_threshold is not None
                        and r.compression_ratio > compression_ratio_threshold):
                    ok = False
                if logprob_threshold is not None and r.avg_logprob < logprob_threshold:
                    ok = False
                if (no_speech_threshold is not None and r.no_speech_prob > no_speech_threshold):
                    ok = True  # silence — accept, will be skipped below
                if not ok:
                    still.append(i)
            pending = still

        input_stride = N_FRAMES // config.n_audio_ctx
        time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE
        for i in range(real):
            w = start + i
            r = results[i]
            window_segments: list[Segment] = []
            if (no_speech_threshold is not None
                    and r.no_speech_prob > no_speech_threshold
                    and (logprob_threshold is None or r.avg_logprob < logprob_threshold)):
                continue
            time_offset = w * N_FRAMES * HOP_LENGTH / SAMPLE_RATE
            tokens = np.asarray(r.tokens)
            ts_begin = tokenizer.timestamp_begin
            ts_mask = tokens >= ts_begin
            consecutive = np.where(ts_mask[:-1] & ts_mask[1:])[0] + 1
            bounds = [0] + consecutive.tolist() + [len(tokens)]
            for b0, b1 in zip(bounds[:-1], bounds[1:]):
                seg_toks = tokens[b0:b1]
                if len(seg_toks) == 0:
                    continue
                ts_in = seg_toks[seg_toks >= ts_begin]
                s = time_offset + (float(ts_in[0] - ts_begin) * time_precision if len(ts_in) else 0.0)
                e = time_offset + (float(ts_in[-1] - ts_begin) * time_precision if len(ts_in) else 30.0)
                text = tokenizer.decode([t for t in seg_toks.tolist() if t < tokenizer.eot])
                if not text.strip():
                    continue
                window_segments.append(Segment(
                    id=seg_id, seek=w * N_FRAMES, start=s, end=e, text=text,
                    tokens=list(map(int, seg_toks)), temperature=r.temperature,
                    avg_logprob=r.avg_logprob, compression_ratio=r.compression_ratio,
                    no_speech_prob=r.no_speech_prob,
                ))
                seg_id += 1
            if word_timestamps and window_segments:
                from whisper_mlx_tpu.inference.word_timestamps import add_word_timestamps

                add_word_timestamps(
                    window_segments, params, config, tokenizer,
                    chunk[i], w * N_FRAMES * HOP_LENGTH / SAMPLE_RATE,
                )
            all_segments.extend(window_segments)

    return {
        "text": "".join(s.text for s in all_segments),
        "segments": [s.to_dict() for s in all_segments],
        "language": tokenizer.language,
    }
