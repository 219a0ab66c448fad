"""WER evaluation harness over a directory of wav+txt pairs.

Usage:
    python scripts/eval_wer.py DATA_DIR --model MODEL_DIR [--batch-windows]

DATA_DIR holds ``{utt}.wav`` with matching ``{utt}.txt`` references
(LibriSpeech exported this way, or any corpus). Prints corpus WER + timing.
No datasets ship in this image — this is the BASELINE measurement harness
for environments with data (BASELINE.md WER-parity target).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main(argv: list[str] | None = None) -> "dict | int":
    parser = argparse.ArgumentParser("eval_wer")
    parser.add_argument("data_dir")
    parser.add_argument("--model", required=True)
    parser.add_argument("--batch-windows", action="store_true")
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args(argv)

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from whisper_mlx_tpu.cli import load_model
    from whisper_mlx_tpu.inference.transcribe import transcribe
    from whisper_mlx_tpu.inference.wer import corpus_wer
    from whisper_mlx_tpu.runtime.platform import enable_compile_cache, ensure_platform

    ensure_platform()
    enable_compile_cache()
    params, config, tokenizer = load_model(args.model, None)

    pairs = []
    total_audio = 0.0
    t0 = time.perf_counter()
    wavs = sorted(Path(args.data_dir).glob("*.wav"))
    if args.limit:
        wavs = wavs[: args.limit]
    if not wavs:
        print(f"no .wav files under {args.data_dir}", file=sys.stderr)
        return 1
    for wav in wavs:
        ref_path = wav.with_suffix(".txt")
        if not ref_path.exists():
            continue
        result = transcribe(
            str(wav), params=params, config=config, tokenizer=tokenizer,
            verbose=False, batch_windows=args.batch_windows,
        )
        pairs.append((ref_path.read_text(), result["text"]))
        from whisper_mlx_tpu.audio.decode import load_audio

        total_audio += len(load_audio(wav)) / 16_000

    dt = time.perf_counter() - t0
    stats = corpus_wer(pairs)
    stats["rtf"] = total_audio / dt if dt else 0.0
    stats["audio_seconds"] = total_audio
    stats["wall_seconds"] = dt
    stats["utterances"] = len(pairs)
    print(stats)
    return stats


if __name__ == "__main__":
    raise SystemExit(0 if isinstance(main(), dict) else 1)
