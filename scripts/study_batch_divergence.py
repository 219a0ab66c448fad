"""Quantify batched-vs-sequential transcription divergence (VERDICT r3 #6).

The serving path (`runtime/batcher.py`, `transcribe(batch_windows=True)`)
decodes FIXED-STRIDE 30 s windows; the reference-exact sequential mode
advances the seek pointer by decoded timestamps, so its later windows can
start mid-stride. r3 asserted the quality delta "slight" without a number
— this study measures it: N synthetic long clips through both modes with
identical weights, reporting per-clip text agreement, segment-boundary
deltas, and the seek-advance distribution that CAUSES divergence.

Context for reading the numbers: when a window decodes to its full 30 s
(the common case on real speech), the sequential advance equals the fixed
stride and the two modes see IDENTICAL windows — divergence can only
enter when a window ends early (final partial segment re-decoded from a
shifted offset). Random weights are the pessimistic extreme: timestamps
are near-uniform noise, so almost every window advances partially and
windows misalign maximally. Real-checkpoint agreement sits between this
floor and exact equality; the protocol (docs/wer_protocol.md) upgrades
the bound to WER-on-real-weights when an artifact feed exists.

Run (CPU, ~minutes):  JAX_PLATFORMS=cpu python scripts/study_batch_divergence.py
Knobs: STUDY_CLIPS (12), STUDY_SECONDS (75), STUDY_MODEL_SEED (0).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_mlx_tpu.runtime.platform import ensure_platform  # noqa: E402

ensure_platform()

N_CLIPS = int(os.environ.get("STUDY_CLIPS", "12"))
SECONDS = float(os.environ.get("STUDY_SECONDS", "75"))
MODEL_SEED = int(os.environ.get("STUDY_MODEL_SEED", "0"))


def edit_distance(a: list[int], b: list[int]) -> int:
    """Token-level Levenshtein (the WER numerator at token granularity)."""
    if not a:
        return len(b)
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def text_tokens(result: dict, eot: int) -> list[int]:
    return [t for seg in result["segments"] for t in seg["tokens"] if t < eot]


def main() -> None:
    from tests.conftest import make_speechy_audio
    from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
    from whisper_mlx_tpu.inference.transcribe import transcribe
    from whisper_mlx_tpu.models.whisper import WhisperConfig, init_params

    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(config, seed=MODEL_SEED)
    common = dict(
        params=params, config=config, tokenizer=tok, verbose=False,
        temperature=0.0, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        condition_on_previous_text=False, language="en",
    )

    rows = []
    advances = []
    for i in range(N_CLIPS):
        audio = make_speechy_audio(seconds=SECONDS, seed=100 + i)
        seq = transcribe(audio, **common)
        bat = transcribe(audio, batch_windows=True, **common)

        # seek-advance distribution: strides the sequential mode actually took
        seeks = sorted({s["seek"] for s in seq["segments"]})
        advances += [b - a for a, b in zip(seeks, seeks[1:])]

        ta, tb = text_tokens(seq, tok.eot), text_tokens(bat, tok.eot)
        dist = edit_distance(ta, tb)
        # boundary deltas over greedily aligned segments (by start time)
        sa = [s for s in seq["segments"] if s["text"].strip()]
        sb = [s for s in bat["segments"] if s["text"].strip()]
        deltas = [abs(x["start"] - y["start"])
                  for x, y in zip(sa, sb)]
        rows.append({
            "clip": i,
            "tokens_seq": len(ta), "tokens_batch": len(tb),
            "token_edit_rate": round(dist / max(len(ta), 1), 4),
            "exact": ta == tb,
            "segments_seq": len(sa), "segments_batch": len(sb),
            "mean_start_delta_s": round(float(np.mean(deltas)), 3) if deltas else None,
        })
        print(json.dumps(rows[-1]), flush=True)

    full_stride = sum(1 for a in advances if a >= 3000)
    summary = {
        "clips": N_CLIPS, "seconds_each": SECONDS,
        "exact_clips": sum(r["exact"] for r in rows),
        "mean_token_edit_rate": round(float(np.mean([r["token_edit_rate"] for r in rows])), 4),
        "max_token_edit_rate": round(max(r["token_edit_rate"] for r in rows), 4),
        "seek_advances": len(advances),
        "full_stride_advances": full_stride,
        "partial_advance_frac": round(1 - full_stride / max(len(advances), 1), 3),
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
