"""Bench: multi-buffered dequant-matmul (quant_pallas_mb) vs production.

LLM B=1 decode streams ~4 GB of packed weights per step through
quant_matmul_pallas, whose Mosaic-pipelined single DMA stream measured
~330 GB/s (docs/performance.md). quant_matmul_mb keeps DEPTH weight-slab
copies in flight by hand; this sweeps DEPTH × TILE_N at the qwen2.5-7b
decode shapes and prints effective GB/s per variant.

Method per CLAUDE.md: ITERS chained calls inside one jitted lax.scan
(serial data dependency), operands as runtime arguments, fetch-synced.

Run on TPU: python scripts/bench_quant_mb.py
Knobs: QB_ITERS, QB_M (decode rows), QB_DEPTHS, QB_TILES.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from whisper_mlx_tpu.runtime.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from whisper_mlx_tpu.ops.quant import QuantTensor, quantize  # noqa: E402
from whisper_mlx_tpu.ops.quant_pallas import quant_matmul_pallas  # noqa: E402
from whisper_mlx_tpu.ops.quant_pallas_mb import (  # noqa: E402
    quant_matmul_mbt, transpose_quant)

ITERS = int(os.environ.get("QB_ITERS", "50"))
M = int(os.environ.get("QB_M", "1"))
DEPTHS = [int(d) for d in os.environ.get("QB_DEPTHS", "2,4,8").split(",")]
TILES = [int(t) for t in os.environ.get("QB_TILES", "256,512,1024").split(",")]
REPS = int(os.environ.get("PROF_REPS", "3"))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# qwen2.5-7b shapes: hidden 3584, q 4096(qkv fused 4608+1024)=; use the two
# dominant streams: attn-out-ish square and the fused gate_up + down FFN.
# QB_SHAPES=whisper switches to the large-v3 decoder set (32L; QB_M=56).
if os.environ.get("QB_SHAPES") == "whisper":
    SHAPES = [
        ("qkv", 1280, 3840),
        ("o", 1280, 1280),
        ("xq", 1280, 1280),
        ("xo", 1280, 1280),
        ("fc1", 1280, 5120),
        ("fc2", 5120, 1280),
    ]
    PER_LAYER = 32
else:
    SHAPES = [
        ("qkv", 3584, 4608 + 512 + 512),
        ("o", 4096, 3584),
        ("gate_up", 3584, 2 * 18944),
        ("down", 18944, 3584),
    ]
    PER_LAYER = 28

results = []


def bench(name, fn, x0, gb_call, note=""):
    @jax.jit
    def loop(x, *args):
        def body(c, _):
            o = fn(c, *args)
            # fold output back into a (M, K)-shaped carry for serial dep
            return (c * jnp.bfloat16(0.5)
                    + jnp.broadcast_to(o[..., :1], c.shape) * jnp.bfloat16(1e-6)), None
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    t0 = time.perf_counter()
    np.asarray(loop(x0)[0, :1])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(loop(x0)[0, :1])
        times.append(time.perf_counter() - t0)
    per_call = min(times) / ITERS
    rate = gb_call / per_call
    results.append({"name": name, "us_per_call": round(per_call * 1e6, 1),
                    "gb_s": round(rate, 1), "note": note})
    print(f"# {name:28s} {per_call * 1e6:9.1f} us/call  {rate:6.1f} GB/s  "
          f"(compile {compile_s:.1f}s) {note}", file=sys.stderr, flush=True)
    return per_call


def main():
    rng = np.random.default_rng(0)
    total = {}
    for sname, K, N in SHAPES:
        w = rng.standard_normal((N, K)).astype(np.float32) * 0.02
        w_q, scales, biases = quantize(w, bits=4, group_size=64)
        qt = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales),
                         jnp.asarray(biases), 4, 64)
        x0 = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32) * 0.1,
                         jnp.bfloat16)
        gb = (N * K / 2 + 2 * N * (K // 64) * scales.dtype.itemsize) / 1e9

        t = bench(f"{sname}_prod", lambda x, q=qt: quant_matmul_pallas(x, q),
                  x0, gb, note=f"K={K} N={N}")
        total.setdefault("prod", 0.0)
        total["prod"] += t
        qtt = transpose_quant(qt)  # one-time setup, outside the timed loop
        for depth in DEPTHS:
            for tile in TILES:
                if N < tile:
                    continue
                try:
                    t = bench(f"{sname}_mb_d{depth}_t{tile}",
                              lambda x, q=qtt, d=depth, tl=tile:
                              quant_matmul_mbt(x, q, tile_n=tl, depth=d),
                              x0, gb)
                except Exception as e:  # VMEM overflow at big tile×depth
                    print(f"# {sname}_mb_d{depth}_t{tile} FAILED: "
                          f"{str(e)[:120]}", file=sys.stderr)
                    continue
                total.setdefault(f"mb_d{depth}_t{tile}", 0.0)
                total[f"mb_d{depth}_t{tile}"] += t

    print("# --- per-layer totals (4 matmuls) ---", file=sys.stderr)
    for k, v in sorted(total.items(), key=lambda kv: kv[1]):
        print(f"#   {k:20s} {v * 1e6:9.1f} us  ({PER_LAYER}L -> {v * PER_LAYER * 1e3:.1f} ms/step)",
              file=sys.stderr)
    print(json.dumps({"bench": results, "M": M, "iters": ITERS}))


if __name__ == "__main__":
    main()
