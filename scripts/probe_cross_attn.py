"""Probe: decode CROSS-attention layout/dtype variants at serving shapes.

The cross-KV stream dominates the decode loop (6.9 GB/step int8 at B=56,
read 224×). The einsum over the time-minor (b, h, d, T) cache measured
531 GB/s (int8) / ~350 GB/s-packed (native int4). This probes whether a
TIME-MAJOR (T, b, h·d) cache read as ONE elementwise broadcast-multiply
stream (the layout that won for the self cache candidate) lifts the
effective rate — and how the s4 convert behaves in that form.

Variants (CL=8 layers to fit HBM; scale ×4 for 32L):
  base8     einsum "bhqd,bhdk->bhqk" int8 (time-minor) — 531 GB/s ref
  tmajor8   elementwise (T,b,h,d) int8 stream
  base4     einsum, native s4 (converted IN-JIT: s4 jit args RecursionError
            on this backend — CLAUDE.md)
  tmajor4   elementwise s4 stream
  tmajor8_bf16  products in bf16 (VPU halves? rate check)

All operands runtime args; 224-step lax.scan; fetch-synced.
Run: python scripts/probe_cross_attn.py  (PROF_ONLY/PROF_REPS knobs)
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

B = int(os.environ.get("BENCH_BATCH", "56"))
H, HD = 20, 64
L = 32
CL = int(os.environ.get("PROF_CROSS_LAYERS", "8"))
TK = 1500
STEPS = int(os.environ.get("BENCH_SAMPLE_LEN", "224"))
REPS = int(os.environ.get("PROF_REPS", "3"))
ONLY = os.environ.get("PROF_ONLY", "")

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
    print(f"# {name:14s} {best:8.4f}s (compile {compile_s:5.1f}s) {note}",
          file=sys.stderr, flush=True)
    return best


def want(name):
    return not ONLY or name in ONLY.split(",")


def scan_n(step, init):
    def body(c, _):
        return step(c), None
    out, _ = jax.lax.scan(body, init, None, length=STEPS)
    return out


def main():
    kr = jax.random.PRNGKey(0)
    q0 = jnp.ones((B, H, 1, HD), jnp.bfloat16)
    # K reused as V (read twice) — full int8 K stack for CL layers
    gb8 = 2 * CL * B * H * HD * TK / 1e9

    # time-minor (b, h, d, T)
    xk = [jax.random.randint(jax.random.fold_in(kr, i), (B, H, HD, TK),
                             -127, 127, jnp.int8) for i in range(CL)]
    ks = [jnp.full((B, H, TK), 0.01, jnp.bfloat16) for _ in range(CL)]

    if want("base8"):
        @jax.jit
        def base8(q0, xk, ks):
            def step(q):
                acc = q
                for i in range(CL):
                    s = jnp.einsum("bhqd,bhdk->bhqk", q.astype(jnp.float32),
                                   xk[i].astype(jnp.float32))
                    s = s * ks[i][:, :, None, :]
                    w = jax.nn.softmax(s, axis=-1) * ks[i][:, :, None, :]
                    o = jnp.einsum("bhqk,bhdk->bhqd", w, xk[i].astype(jnp.float32))
                    acc = acc + o.astype(q.dtype)
                return acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0)
            return scan_n(step, q0)
        t = timeit("base8", lambda: base8(q0, xk, ks), lambda o: o[0, 0, 0, :1],
                   note=f"{gb8:.1f} GB/step ({CL}L)")
        print(f"#   -> {gb8 * STEPS / t:.0f} GB/s; 32L-equiv {t * L / CL:.2f}s",
              file=sys.stderr)

    if want("base4"):
        @jax.jit
        def base4(q0, xk, ks):
            x4 = [k.astype(jnp.int4) for k in xk]  # in-jit convert (one-time)
            def step(q):
                acc = q
                for i in range(CL):
                    s = jnp.einsum("bhqd,bhdk->bhqk", q.astype(jnp.float32),
                                   x4[i].astype(jnp.float32))
                    s = s * ks[i][:, :, None, :]
                    w = jax.nn.softmax(s, axis=-1) * ks[i][:, :, None, :]
                    o = jnp.einsum("bhqk,bhdk->bhqd", w, x4[i].astype(jnp.float32))
                    acc = acc + o.astype(q.dtype)
                return acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0)
            return scan_n(step, q0)
        t = timeit("base4", lambda: base4(q0, xk, ks), lambda o: o[0, 0, 0, :1],
                   note=f"{gb8 / 2:.1f} GB/step packed ({CL}L)")
        print(f"#   -> {gb8 / 2 * STEPS / t:.0f} GB/s packed; "
              f"32L-equiv {t * L / CL:.2f}s", file=sys.stderr)

    # time-major (T, b, h*d)
    xkT = [jax.random.randint(jax.random.fold_in(kr, 100 + i),
                              (TK, B, H * HD), -127, 127, jnp.int8)
           for i in range(CL)]
    ksT = [jnp.full((TK, B, H), 0.01, jnp.bfloat16) for _ in range(CL)]

    def tmajor_step(q, kT, sT, cdt):
        kv = kT.reshape(TK, B, H, HD)
        p = q[None, :, :, 0, :].astype(cdt) * kv.astype(cdt)
        s = jnp.sum(p, axis=-1, dtype=jnp.float32) * sT.astype(jnp.float32)
        w = jax.nn.softmax(s, axis=0) * sT.astype(jnp.float32)
        o = jnp.sum(w.astype(cdt)[..., None] * kv.astype(cdt), axis=0,
                    dtype=jnp.float32)
        return o[:, :, None, :].astype(q.dtype)

    if want("tmajor8"):
        @jax.jit
        def tmajor8(q0, xkT, ksT):
            def step(q):
                acc = q
                for i in range(CL):
                    acc = acc + tmajor_step(q, xkT[i], ksT[i], jnp.float32)
                return acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0)
            return scan_n(step, q0)
        t = timeit("tmajor8", lambda: tmajor8(q0, xkT, ksT),
                   lambda o: o[0, 0, 0, :1], note=f"{gb8:.1f} GB/step ({CL}L)")
        print(f"#   -> {gb8 * STEPS / t:.0f} GB/s; 32L-equiv {t * L / CL:.2f}s",
              file=sys.stderr)

    if want("tmajor8_bf16"):
        @jax.jit
        def tmajor8b(q0, xkT, ksT):
            def step(q):
                acc = q
                for i in range(CL):
                    acc = acc + tmajor_step(q, xkT[i], ksT[i], jnp.bfloat16)
                return acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0)
            return scan_n(step, q0)
        t = timeit("tmajor8_bf16", lambda: tmajor8b(q0, xkT, ksT),
                   lambda o: o[0, 0, 0, :1])
        print(f"#   -> {gb8 * STEPS / t:.0f} GB/s; 32L-equiv {t * L / CL:.2f}s",
              file=sys.stderr)

    if want("tmajor4"):
        @jax.jit
        def tmajor4(q0, xkT, ksT):
            x4 = [k.astype(jnp.int4) for k in xkT]
            def step(q):
                acc = q
                for i in range(CL):
                    acc = acc + tmajor_step(q, x4[i], ksT[i], jnp.float32)
                return acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0)
            return scan_n(step, q0)
        t = timeit("tmajor4", lambda: tmajor4(q0, xkT, ksT),
                   lambda o: o[0, 0, 0, :1],
                   note=f"{gb8 / 2:.1f} GB/step packed ({CL}L)")
        print(f"#   -> {gb8 / 2 * STEPS / t:.0f} GB/s packed; "
              f"32L-equiv {t * L / CL:.2f}s", file=sys.stderr)

    print(json.dumps({"probe": results, "batch": B, "TK": TK, "CL": CL}))


if __name__ == "__main__":
    main()
