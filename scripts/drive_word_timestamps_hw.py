"""Hardware drive: sequential long-form transcribe with word timestamps on
the serving config (large-v3 arch, random weights) — validates the bucketed
alignment prefill (inference/word_timestamps.py) end-to-end on the TPU and
times the path. Not a parity test (offline oracles cover that); this is the
BASELINE config-4 workload shape on real hardware.

Run:  python scripts/drive_word_timestamps_hw.py   (knobs: WTS_AUDIO_S)
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_mlx_tpu.runtime.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from bench import _zeros_params
    from whisper_mlx_tpu.decoding.tokenizer import (
        ByteLevelBPE, WhisperTokenizer, bytes_to_unicode,
    )
    from whisper_mlx_tpu.inference.transcribe import transcribe
    from whisper_mlx_tpu.models.whisper import WHISPER_CONFIGS

    audio_s = float(os.environ.get("WTS_AUDIO_S", "90"))
    config = dataclasses.replace(
        WHISPER_CONFIGS["large-v3"], dtype=jnp.bfloat16,
        flash_attention=True, kv_bits=4, self_kv_bits=8,
    )
    byte_vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
    tok = WhisperTokenizer(ByteLevelBPE(byte_vocab, []), n_base=50257,
                           num_languages=100)
    params = _zeros_params(config, jnp.bfloat16)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(16_000 * audio_s)) * 0.1).astype(np.float32)

    def run():
        return transcribe(
            audio, params=params, config=config, tokenizer=tok,
            temperature=0.0, language="en", word_timestamps=True,
            condition_on_previous_text=False, sample_len=64,
        )

    t0 = time.perf_counter()
    run()  # compile + warm (sequential-mode executables are per-shape)
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    result = run()
    wall = time.perf_counter() - t0
    n_words = sum(len(s.get("words", [])) for s in result["segments"])
    mono = all(
        w1["start"] <= w2["start"]
        for s in result["segments"]
        for w1, w2 in zip(s.get("words", []), s.get("words", [])[1:])
    )
    print(json.dumps({
        "metric": "word_ts_transcribe_wall_s",
        "value": round(wall, 2),
        "audio_s": audio_s,
        "rtf": round(audio_s / wall, 2),
        "warm_s": round(warm_s, 1),
        "segments": len(result["segments"]),
        "words": n_words,
        "word_times_monotone": mono,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
