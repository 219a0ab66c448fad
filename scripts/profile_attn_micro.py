"""Micro-profile: decode attention streams with RUNTIME arguments.

profile_decode.py's scan isolates captured the KV caches as jit constants;
the cross-attn isolate then reported an impossible 13 TB/s — XLA treats
huge captured constants differently from runtime buffers. Here every
operand is a runtime argument and each measurement is a 224-iteration
``lax.scan`` with serial feedback, fetch-synced.

Measures (B=56 serving shapes):
  cross_attn_32L : int8 cross-attention, Tk=1500, all 32 layers/step
  self_attn_32L  : int8 self-attention + cache update, Talloc=256
  cross_bf16_32L : same stream but bf16 K/V (is int8 conversion the wall?)
  one_call       : single 32-layer cross pass, 20 dispatches (scan sanity)

Run: python scripts/profile_attn_micro.py
"""

from __future__ import annotations

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

from whisper_mlx_tpu.ops.kv_quant import attention_int8_auto  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "56"))
H, HD, L = 20, 64, 32
# cross tests run CL layers and scale: the full 32-layer int8+bf16 operand
# set (6.9 + 13.8 GB) exceeds HBM alongside the compiled buffers
CL = int(os.environ.get("PROF_CROSS_LAYERS", "8"))
TK = 1500
T_SELF = 256
STEPS = int(os.environ.get("BENCH_SAMPLE_LEN", "224"))
REPS = int(os.environ.get("PROF_REPS", "3"))
ONLY = os.environ.get("PROF_ONLY", "")  # comma-separated test filter

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

results = []


def timeit(name, fn, fetch, note=""):
    t0 = time.perf_counter()
    np.asarray(fetch(fn()))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fetch(fn()))
        times.append(time.perf_counter() - t0)
    best = min(times)
    results.append({"name": name, "seconds": round(best, 4), "note": note})
    print(f"# {name:22s} {best:8.4f}s (compile {compile_s:5.1f}s) {note}",
          file=sys.stderr, flush=True)
    return best


def want(name: str) -> bool:
    return not ONLY or name in ONLY.split(",")


def main():
    kr = jax.random.PRNGKey(0)
    q0 = jnp.ones((B, H, 1, HD), jnp.bfloat16)
    # per-layer generation (randint materializes an int32 intermediate 4x
    # the int8 result — generating the full stack at once OOMs)
    xk = [jax.random.randint(jax.random.fold_in(kr, i), (B, H, HD, TK),
                             -127, 127, jnp.int8) for i in range(CL)]
    xks = [jnp.full((B, H, TK, 1), 0.01, jnp.float32) for _ in range(CL)]

    gb_cross = 2 * CL * B * H * HD * TK / 1e9  # K is reused as V (read 2x)

    @jax.jit
    def cross_scan(q0, xk, xks):
        def step(q, _):
            acc = q
            for i in range(CL):
                acc = acc + attention_int8_auto(q, xk[i], xks[i], xk[i], xks[i],
                                                valid_len=TK)
            return acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0), None
        out, _ = jax.lax.scan(step, q0, None, length=STEPS)
        return out

    if want("cross_int8"):
        t = timeit("cross_int8_scan", lambda: cross_scan(q0, xk, xks),
                   lambda o: o[0, 0, 0, :1],
                   note=f"{gb_cross:.1f} GB/step x {STEPS} ({CL}L; x{L // CL} for 32L)")
        print(f"#   -> {gb_cross * STEPS / t:.0f} GB/s effective; 32L-equiv "
              f"{t * L / CL:.2f}s", file=sys.stderr)

    if want("cross_bf16"):
        xkb = [k.astype(jnp.bfloat16) for k in xk]

        @jax.jit
        def cross_bf16_scan(q0, xkb):
            def step(q, _):
                acc = q
                for i in range(CL):
                    s = jnp.einsum("bhqd,bhdk->bhqk", q.astype(jnp.float32),
                                   xkb[i].astype(jnp.float32))
                    w = jax.nn.softmax(s, axis=-1)
                    o = jnp.einsum("bhqk,bhdk->bhqd", w, xkb[i].astype(jnp.float32))
                    acc = acc + o.astype(q.dtype)
                return acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0), None
            out, _ = jax.lax.scan(step, q0, None, length=STEPS)
            return out

        t = timeit("cross_bf16_scan", lambda: cross_bf16_scan(q0, xkb),
                   lambda o: o[0, 0, 0, :1],
                   note=f"{2 * gb_cross:.1f} GB/step x {STEPS} ({CL}L)")
        print(f"#   -> {2 * gb_cross * STEPS / t:.0f} GB/s effective; 32L-equiv "
              f"{t * L / CL:.2f}s", file=sys.stderr)
        del xkb

    if not want("self_int8"):
        print(json.dumps({"micro": results, "batch": B}))
        return

    # self-attention with per-step cache update (runtime args, full 32L)
    sk = jax.random.randint(jax.random.fold_in(kr, 99), (L, B, H, HD, T_SELF),
                            -127, 127, jnp.int8)
    sks = jnp.full((L, B, H, T_SELF, 1), 0.01, jnp.float32)
    gb_self = 2 * L * B * H * HD * T_SELF / 1e9

    @jax.jit
    def self_scan(q0, caches, sks):
        # carry per-layer cache entries as a LIST pytree (mirrors the real
        # decode_step cache threading; stacking them would copy the whole
        # cache every step and inflate the measurement)
        from whisper_mlx_tpu.ops.kv_quant import quantize_kv

        def step(carry, _):
            q, cache, pos = carry
            k8n, _ = quantize_kv(q)
            k8nt = jnp.swapaxes(k8n, 2, 3)
            acc = q
            new_cache = []
            for i, (ke, ve) in enumerate(cache):
                ke = jax.lax.dynamic_update_slice_in_dim(ke, k8nt, pos, axis=3)
                ve = jax.lax.dynamic_update_slice_in_dim(ve, k8nt, pos, axis=3)
                new_cache.append((ke, ve))
                acc = acc + attention_int8_auto(q, ke, sks[i], ve, sks[i],
                                                pos=pos, causal=True)
            return (acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0),
                    new_cache, pos + 1), None
        out, _ = jax.lax.scan(step, (q0, caches, jnp.int32(3)), None, length=STEPS)
        return out[0]

    caches = [(sk[i], sk[i]) for i in range(L)]
    t = timeit("self_int8_scan", lambda: self_scan(q0, caches, sks),
               lambda o: o[0, 0, 0, :1],
               note=f"{gb_self:.1f} GB/step x {STEPS}")
    print(f"#   -> {gb_self * STEPS / t:.0f} GB/s effective", file=sys.stderr)

    print(json.dumps({"micro": results, "batch": B}))


if __name__ == "__main__":
    main()
