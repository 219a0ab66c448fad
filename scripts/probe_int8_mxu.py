"""Probe: does int8×int8→int32 matmul beat bf16 on the v5e MXU at encoder
shapes? (v5e datasheet: 394 TOPS int8 vs 197 TFLOPs bf16.)

The encoder is within ~10% of its bf16 floor (docs/performance.md encoder
ablation) and is the dominant stage for turbo serving — lower-precision
score/GEMM math is the only identified mover. Before building an int8
encoder path + quality study, measure whether the XLA lowering actually
reaches the double-rate MXU mode:

  gemm   : (M, K) @ (K, N) at the encoder's projection/MLP shapes
  attnqk : (B·H, T, hd) @ (B·H, hd, T) — the half-tile hd=64 case

Method per docs/performance.md rules: runtime arguments (captured
constants time impossibly fast), scan-chained to amortize the ~400 µs
dispatch floor, device→host fetch to sync (block_until_ready lies).

Run: python scripts/probe_int8_mxu.py  (PROBE_M/K/N/STEPS knobs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_mlx_tpu.runtime.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/wtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

STEPS = int(os.environ.get("PROBE_STEPS", "32"))
# encoder MLP fc1 at B=8 windows: (8*1500, 1280) @ (1280, 5120)
M = int(os.environ.get("PROBE_M", "12000"))
K = int(os.environ.get("PROBE_K", "1280"))
N = int(os.environ.get("PROBE_N", "5120"))


def timed(fn, *args) -> float:
    np.asarray(fn(*args))  # compile + fetch-sync (ys is a tiny 1-D array)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / STEPS


def chain_gemm(dtype, acc_dtype):
    @jax.jit
    def run(x, w):
        def body(c, _):
            y = jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            # feed the output back (cast) so steps serialize
            nxt = y[:, :K].astype(dtype)
            return nxt, y[0, 0]
        c, ys = jax.lax.scan(body, x, None, length=STEPS)
        return ys

    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-8, 8, (M, K)), jnp.int8)
        w = jnp.asarray(rng.integers(-8, 8, (K, N)), jnp.int8)
    else:
        x = jnp.asarray(rng.standard_normal((M, K)), dtype)
        w = jnp.asarray(rng.standard_normal((K, N)), dtype)
    return timed(run, x, w)


def chain_attn_qk(dtype, acc_dtype, bh=160, t=1500, hd=64):
    @jax.jit
    def run(q, kk):
        def body(c, _):
            s = jax.lax.dot_general(
                c, kk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=acc_dtype)  # (BH, T, T)
            nxt = s[:, :, :hd].astype(dtype)
            return nxt, s[0, 0, 0]
        c, ys = jax.lax.scan(body, q, None, length=STEPS)
        return ys

    rng = np.random.default_rng(1)
    if dtype == jnp.int8:
        q = jnp.asarray(rng.integers(-8, 8, (bh, t, hd)), jnp.int8)
        kk = jnp.asarray(rng.integers(-8, 8, (bh, t, hd)), jnp.int8)
    else:
        q = jnp.asarray(rng.standard_normal((bh, t, hd)), dtype)
        kk = jnp.asarray(rng.standard_normal((bh, t, hd)), dtype)
    return timed(run, q, kk)


def main() -> None:
    flops_gemm = 2 * M * K * N
    res = {}
    for name, dt, acc in (("bf16", jnp.bfloat16, jnp.float32),
                          ("int8", jnp.int8, jnp.int32)):
        s = chain_gemm(dt, acc)
        res[f"gemm_{name}_us"] = round(s * 1e6, 1)
        res[f"gemm_{name}_tflops"] = round(flops_gemm / s / 1e12, 1)
    bh, t, hd = 160, 1500, 64
    flops_qk = 2 * bh * t * t * hd
    for name, dt, acc in (("bf16", jnp.bfloat16, jnp.float32),
                          ("int8", jnp.int8, jnp.int32)):
        s = chain_attn_qk(dt, acc, bh, t, hd)
        res[f"attnqk_{name}_us"] = round(s * 1e6, 1)
        res[f"attnqk_{name}_tflops"] = round(flops_qk / s / 1e12, 1)
    res["gemm_speedup"] = round(
        res["gemm_bf16_us"] / res["gemm_int8_us"], 2)
    res["attnqk_speedup"] = round(
        res["attnqk_bf16_us"] / res["attnqk_int8_us"], 2)
    print(json.dumps({"metric": "int8_mxu_probe", "M": M, "K": K, "N": N,
                      **res, "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
