"""Measure DP scaling of the batched transcription pipeline on a mesh.

Runs the jitted windows pipeline (encode + filtered greedy decode) over a
fixed TOTAL batch of 30 s windows at dp=1 and dp=N and reports windows/sec.

On real multi-chip hardware dp=N shards the batch N ways and windows/sec
should scale ~linearly (each chip runs batch/N). On this image only a
virtual CPU mesh exists (N devices share ONE physical core), so wall-clock
cannot improve; the meaningful number here is the OVERHEAD RATIO
(t_dpN / t_dp1 at equal total work): ≈1.0 means GSPMD sharding adds no
collective/layout cost to the DP pipeline beyond the compute itself.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/measure_dp_scaling.py

Emits one JSON line per mesh config; paste results into MULTICHIP notes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update(
            "jax_num_cpu_devices", int(os.environ.get("N_DEVICES", "8")))
    except RuntimeError:
        pass

    import jax.numpy as jnp
    import numpy as np

    from whisper_mlx_tpu.decoding.task import DecodingOptions, decode
    from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
    from whisper_mlx_tpu.models.whisper import WhisperConfig, init_params
    from whisper_mlx_tpu.parallel.mesh import make_mesh
    from whisper_mlx_tpu.parallel.sharding import shard_batch, shard_params

    n = jax.device_count()
    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab, n_audio_ctx=256,
        n_audio_state=256, n_audio_head=4, n_audio_layer=2,
        n_text_state=256, n_text_head=4, n_text_layer=2,
    )
    params = init_params(config, seed=0)
    rng = np.random.default_rng(0)
    total_windows = int(os.environ.get("TOTAL_WINDOWS", str(n * 2)))
    mel = rng.standard_normal(
        (total_windows, 2 * config.n_audio_ctx, config.n_mels)).astype(np.float32)
    opts = DecodingOptions(sample_len=int(os.environ.get("SAMPLE_LEN", "16")))

    results = {}
    for dp in (1, n):
        mesh = make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])
        p = shard_params(params, mesh)
        m = shard_batch(jnp.asarray(mel), mesh)
        decode(p, m, tok, config, opts)  # compile + warmup
        reps = int(os.environ.get("REPS", "3"))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            decode(p, m, tok, config, opts)
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[dp] = best
        print(json.dumps({
            "dp": dp, "total_windows": total_windows, "best_s": round(best, 3),
            "windows_per_sec": round(total_windows / best, 2),
            "devices": n, "note": "virtual CPU mesh: one physical core",
        }))

    overhead = results[n] / results[1]
    print(json.dumps({
        "metric": "dp_sharding_overhead_ratio", "value": round(overhead, 3),
        "meaning": "t_dpN/t_dp1 at equal total work on one core; "
                   "~1.0 = no GSPMD overhead, real chips then scale ~linearly",
    }))


if __name__ == "__main__":
    main()
