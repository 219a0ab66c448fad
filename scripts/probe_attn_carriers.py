"""Rank KV-cache CARRIER dtypes for the decode-attention streams.

The r5 integer-MXU attention experiment (attention_int8_mxu) measured
NEGATIVE e2e (kv4: 320.6 → 293.3; kv8: → 242.9), so the "convert-bound"
theory needs direct evidence. This probe times the exact score+out einsum
chain of attention_int8_auto at the real large-v3 decode shapes for each
carrier dtype of K/V:

    bf16   — no convert, 2 B/value        (the dense reference rate)
    int8   — 1 convert,  1 B/value        (kv_bits=8)
    int4   — unpack+convert, 0.5 B/value  (kv_bits=4, serving default)
    f8e4m3 / f8e5m2 — hw(?) convert, 1 B/value
    int8 → s8×s8 MXU dot (no convert)     (the r5 negative, for scale)

Probe discipline (CLAUDE.md): scan-chained N≥1000 iterations, ONE
device→host fetch to sync, TOTAL time reported alongside per-iter (the
~30 ms dispatch round-trip otherwise masquerades as work). K/V are scan
CARRIES that receive a one-column write per step — exactly the real
loop's cache behavior — so XLA cannot hoist the dtype convert out of the
loop (with loop-invariant operands it hoists a full f32 copy and every
carrier times like bf16). s4 buffers are created INSIDE the jit (s4
across the jit boundary hits the device_put RecursionError on this
backend).

Shapes: cross (B=56, h=20, d=64, T=1536) and self (T=256), both tq=1.
Run: python scripts/probe_attn_carriers.py   (knobs: PROBE_N, PROBE_B)
"""

from __future__ import annotations

import functools
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/wtpu_xla_cache"))

N = int(os.environ.get("PROBE_N", "1000"))
B = int(os.environ.get("PROBE_B", "56"))
H, D = 20, 64


def make_run(T, dtype, mxu=False):
    @jax.jit
    def run(q0, k0, v0, ks, vs):
        # carrier buffers materialize INSIDE the jit (s4 jit-boundary rule)
        k0 = k0.astype(dtype)
        v0 = v0.astype(dtype)

        def step(carry, i):
            q, k, v = carry
            if mxu:
                from whisper_mlx_tpu.ops.kv_quant import _quantize_rows

                q8, qs = _quantize_rows(q.astype(jnp.float32))
                s32 = jnp.einsum("bhqd,bhdk->bhqk", q8, k,
                                 preferred_element_type=jnp.int32)
                s = s32.astype(jnp.float32) * qs * ks
                w = jax.nn.softmax(s, axis=-1)
                w8, ws = _quantize_rows(w * vs)
                o32 = jnp.einsum("bhqk,bhdk->bhqd", w8, v,
                                 preferred_element_type=jnp.int32)
                o = o32.astype(jnp.float32) * ws
            else:
                s = jnp.einsum("bhqd,bhdk->bhqk", q.astype(jnp.float32),
                               k.astype(jnp.float32))
                s = s * ks
                w = jax.nn.softmax(s, axis=-1)
                w = w * vs
                o = jnp.einsum("bhqk,bhdk->bhqd", w, v.astype(jnp.float32))
            # per-step one-column cache write (the real loop's RMW) — keeps
            # the carrier live through the loop so converts stay in-loop
            col = (o * 1e-3).astype(dtype).reshape(B, H, D, 1)
            pos = jax.lax.rem(i, jnp.int32(T))
            k = jax.lax.dynamic_update_slice(k, col, (0, 0, 0, pos))
            v = jax.lax.dynamic_update_slice(v, col, (0, 0, 0, pos))
            q = (o * 1e-3 + 0.1).astype(q.dtype)
            return (q, k, v), None

        (q, k, v), _ = jax.lax.scan(step, (q0, k0, v0),
                                    jnp.arange(N, dtype=jnp.int32))
        return q[0, 0, 0, :4]

    return run


def probe(name, T, dtype, mxu=False):
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.bfloat16)
    k0 = jnp.asarray(np.clip(np.round(
        rng.standard_normal((B, H, D, T)) * 3), -7, 7), jnp.bfloat16)
    v0 = jnp.asarray(np.clip(np.round(
        rng.standard_normal((B, H, D, T)) * 3), -7, 7), jnp.bfloat16)
    ks = jnp.asarray(np.abs(rng.standard_normal((B, H, 1, T))) * 0.05 + 0.01,
                     jnp.float32)
    vs = jnp.asarray(ks, jnp.float32)
    run = make_run(T, dtype, mxu=mxu)
    out = np.asarray(run(q0, k0, v0, ks, vs))  # compile+warm (fetch syncs)
    assert np.all(np.isfinite(out)), out
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(q0, k0, v0, ks, vs))
        best = min(best, time.perf_counter() - t0)
    itemsize = {jnp.int4: 0.5, jnp.int8: 1, jnp.float8_e4m3fn: 1,
                jnp.float8_e5m2: 1, jnp.bfloat16: 2}[dtype]
    bytes_per_iter = 2 * B * H * D * T * itemsize  # K + V read per step
    rate = bytes_per_iter * N / best / 1e9
    line = {"probe": name, "T": T, "dtype": str(jnp.dtype(dtype)),
            "mxu": mxu, "iters": N, "total_s": round(best, 3),
            "us_per_iter": round(best / N * 1e6, 1),
            "stream_GBps": round(rate, 1)}
    print(json.dumps(line), flush=True)
    return line


def main():
    for T, tag in ((1536, "cross"), (256, "self")):
        for dt in (jnp.bfloat16, jnp.int8, jnp.int4,
                   jnp.float8_e4m3fn, jnp.float8_e5m2):
            try:
                probe(tag, T, dt)
            except Exception as exc:  # noqa: BLE001 — carrier unsupported
                print(json.dumps({"probe": tag, "T": T,
                                  "dtype": str(jnp.dtype(dt)),
                                  "error": str(exc)[:160]}), flush=True)
        try:
            probe(tag, T, jnp.int8, mxu=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"probe": tag, "T": T, "dtype": "int8-mxu",
                              "error": str(exc)[:160]}), flush=True)


if __name__ == "__main__":
    main()
