"""Probe: native jnp.int4 KV cache on this TPU — speed + lowering sanity.

If XLA streams s4 operands packed (2 nibbles/byte) and fuses the convert
into the attention einsum, an int4 cross-KV halves the decode loop's
dominant HBM stream vs int8. This measures the same 224-step cross-attn
scan as scripts/profile_attn_micro.py with an int4 cache, plus a CPU-side
exactness check of the scale-folded attention algebra.

Run: python scripts/probe_int4_kv.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_mlx_tpu.runtime.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from whisper_mlx_tpu.ops.kv_quant import attention_int8_auto  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "56"))
H, HD, L, TK = 20, 64, 8, 1500  # 8L scaled x4 (full int8+int4 operand sets OOM)
STEPS = int(os.environ.get("BENCH_SAMPLE_LEN", "224"))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    kr = jax.random.PRNGKey(0)
    xk8 = jnp.stack([jax.random.randint(jax.random.fold_in(kr, i), (B, H, HD, TK), -7, 8, jnp.int8) for i in range(L)])
    xks = jnp.full((L, B, H, TK, 1), 0.01, jnp.float32)
    q0 = jnp.ones((B, H, 1, HD), jnp.bfloat16)
    gb4 = 2 * L * B * H * HD * TK / 2 / 1e9  # packed nibbles

    # NOTE: an s4 device array cannot CROSS a jit boundary on this backend
    # (device_put recursion bug) — convert int8→int4 INSIDE the jit, which
    # is also where the real pipeline creates it (cross_kv runs inside the
    # greedy_decode jit). XLA materializes the packed s4 buffer once before
    # the scan.

    @jax.jit
    def cross4_scan(q0, xk8, xks):
        xk = xk8.astype(jnp.int4)
        def step(q, _):
            acc = q
            for i in range(L):
                acc = acc + attention_int8_auto(q, xk[i], xks[i], xk[i], xks[i],
                                                valid_len=TK)
            return acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0), None
        out, _ = jax.lax.scan(step, q0, None, length=STEPS)
        return out

    t0 = time.perf_counter()
    np.asarray(cross4_scan(q0, xk8, xks)[0, 0, 0, :1])
    print(f"# compile+warm {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(cross4_scan(q0, xk8, xks)[0, 0, 0, :1])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"# cross_int4_scan {best:.4f}s -> {gb4 * STEPS / best:.0f} GB/s "
          f"(packed-int4 bytes)", file=sys.stderr)

    # exactness: int4 attention == attention over dequantized values
    qs = jax.random.normal(jax.random.fold_in(kr, 9), (2, 4, 1, 64), jnp.float32)
    k4 = jax.random.randint(kr, (2, 4, 64, 128), -7, 8, jnp.int8)
    ks = jax.random.uniform(kr, (2, 4, 128, 1), jnp.float32, 0.01, 0.1)

    @jax.jit
    def both(qs, k4, ks):
        o4 = attention_int8_auto(qs, k4.astype(jnp.int4), ks, k4.astype(jnp.int4),
                                 ks, valid_len=128)
        o8 = attention_int8_auto(qs, k4, ks, k4, ks, valid_len=128)
        return o4, o8

    out4, out8 = both(qs, k4, ks)
    err = float(jnp.max(jnp.abs(out4.astype(jnp.float32) - out8.astype(jnp.float32))))
    print(f"# int4-vs-int8 exactness max|delta| = {err:.2e}", file=sys.stderr)
    assert err < 1e-5, err
    print('{"probe": "int4_kv", "seconds": %.4f, "gbps_packed": %.0f}'
          % (best, gb4 * STEPS / best))


if __name__ == "__main__":
    main()
