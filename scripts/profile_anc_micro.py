"""Micro-profile the beam ancestry self-attention op in isolation.

profile_beam.py showed decode-with-ancestry costs 3.56 s/batch more than
the plain self-attention path at identical shapes (60 lanes, T=256) —
nearly all of the beam5 RTF gap. This isolates attention_int8_ancestry
against attention_int8_auto on runtime-arg caches (fetch-synced scans,
see profile_attn_micro.py) and times candidate reformulations.

Run: python scripts/profile_anc_micro.py  (PROF_ONLY filter)
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

from whisper_mlx_tpu.ops.kv_quant import (  # noqa: E402
    attention_int8_ancestry,
    attention_int8_auto,
)

N = int(os.environ.get("PROF_N", "12"))
G = int(os.environ.get("PROF_BEAM", "5"))
H, HD, L = 20, 64, 32
T = int(os.environ.get("PROF_T", "256"))
STEPS = int(os.environ.get("BENCH_SAMPLE_LEN", "224"))
ONLY = os.environ.get("PROF_ONLY", "")
NB = N * G

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

results = []


def timeit(name, fn, fetch, note=""):
    t0 = time.perf_counter()
    np.asarray(fetch(fn()))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fetch(fn()))
        times.append(time.perf_counter() - t0)
    best = min(times)
    gb = 2 * L * NB * H * HD * T / 1e9  # K+V int8 bytes per step
    results.append({"name": name, "seconds": round(best, 4), "note": note})
    print(f"# {name:14s} {best:8.4f}s  {gb * STEPS / best:6.0f} GB/s  "
          f"(compile {compile_s:5.1f}s) {note}", file=sys.stderr, flush=True)
    return best


def want(name):
    return not ONLY or name in ONLY.split(",")


def main():
    kr = jax.random.PRNGKey(0)
    q0 = jnp.ones((NB, H, 1, HD), jnp.bfloat16)
    caches = [(jax.random.randint(jax.random.fold_in(kr, i), (NB, H, HD, T),
                                  -127, 127, jnp.int8),
               jax.random.randint(jax.random.fold_in(kr, 1000 + i),
                                  (NB, H, HD, T), -127, 127, jnp.int8))
              for i in range(L)]
    scales = jnp.full((NB, H, T, 1), 0.01, jnp.bfloat16)
    anc0 = jax.random.randint(jax.random.fold_in(kr, 7), (NB, T), 0, G,
                              jnp.int32)

    def scan_over(attn_step):
        @jax.jit
        def run(q0, caches, scales, anc):
            def step(carry, _):
                q, pos = carry
                acc = q
                for i in range(L):
                    acc = acc + attn_step(q, caches[i], scales, anc, pos)
                return (acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0), pos + 1), None
            (out, _), _ = jax.lax.scan(step, (q0, jnp.int32(3)), None,
                                       length=STEPS)
            return out[0, 0, 0, :1]
        return run

    if want("plain"):
        run = scan_over(lambda q, kv, s, anc, pos: attention_int8_auto(
            q, kv[0], s, kv[1], s, pos=pos, causal=True))
        timeit("plain", lambda: run(q0, caches, scales, anc0), lambda o: o,
               note="attention_int8_auto")

    if want("ancestry"):
        run = scan_over(lambda q, kv, s, anc, pos: attention_int8_ancestry(
            q, kv[0], s, kv[1], s, anc, pos, G))
        timeit("ancestry", lambda: run(q0, caches, scales, anc0), lambda o: o,
               note="attention_int8_ancestry (current)")

    if want("anc_bf16"):
        # variant: bf16 einsum operands instead of f32
        def attn(q, kv, s, anc, pos):
            k8t, v8t = kv
            q4 = q.reshape(N, G, H, HD)
            k5 = k8t.reshape(N, G, H, HD, T)
            v5 = v8t.reshape(N, G, H, HD, T)
            ss = s[..., 0].reshape(N, G, H, T)
            a = anc.reshape(N, G, T)
            s_all = jnp.einsum("nbhd,nkhdt->nkbht", q4.astype(jnp.bfloat16),
                               k5.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
            s_all = s_all * ss[:, :, None].astype(jnp.float32)
            selm = (a[:, None, :, None, :]
                    == jnp.arange(G, dtype=a.dtype)[None, :, None, None, None])
            sc = jnp.sum(jnp.where(selm, s_all, 0.0), axis=1)
            valid = jnp.arange(T)[None, None, None, :] <= pos
            sc = jnp.where(valid, sc, -jnp.inf)
            w = jax.nn.softmax(sc, axis=-1)
            wv = w[:, None] * ss[:, :, None].astype(jnp.float32)
            wv = jnp.where(selm, wv, 0.0)
            out = jnp.einsum("nkbht,nkhdt->nbhd", wv.astype(jnp.bfloat16),
                             v5.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            return out.reshape(NB, H, 1, HD).astype(q.dtype)
        run = scan_over(attn)
        timeit("anc_bf16", lambda: run(q0, caches, scales, anc0), lambda o: o,
               note="bf16 operand variant")

    if want("anc_flat"):
        # variant: flatten (k,h) into one batched-matmul dim per window
        def attn(q, kv, s, anc, pos):
            k8t, v8t = kv
            q4 = q.reshape(N, G, H, HD)
            kf = k8t.reshape(N, G * H, HD, T)
            vf = v8t.reshape(N, G * H, HD, T)
            ss = s[..., 0].reshape(N, G, H, T)
            a = anc.reshape(N, G, T)
            # (n, b, h, d) x (n, (kh), d, t) -> (n, b, kh, t): batch n only
            s_all = jax.lax.dot_general(
                q4.astype(jnp.float32).reshape(N, G * H, HD),
                kf.astype(jnp.float32),
                (((2,), (2,)), ((0,), (0,))))  # (n, bh, kh, t) -- bh x kh full
            s_all = s_all.reshape(N, G, H, G, H, T)
            idx = jnp.arange(H)
            s_all = s_all[:, :, idx, :, idx]  # (h, n, b, k, t) diag over h
            s_all = jnp.moveaxis(s_all, 0, 3)  # (n, b, k, h, t)
            s_all = s_all * ss[:, None].astype(jnp.float32)
            selm = (a[:, :, None, None, :]
                    == jnp.arange(G, dtype=a.dtype)[None, None, :, None, None])
            sc = jnp.sum(jnp.where(selm, s_all, 0.0), axis=2)
            valid = jnp.arange(T)[None, None, None, :] <= pos
            sc = jnp.where(valid, sc, -jnp.inf)
            w = jax.nn.softmax(sc, axis=-1)  # (n, b, h, t)
            wv = w[:, :, None] * ss[:, None].astype(jnp.float32)
            wv = jnp.where(selm, wv, 0.0)  # (n, b, k, h, t)
            out = jnp.einsum("nbkht,nkhdt->nbhd", wv, vf.reshape(N, G, H, HD, T).astype(jnp.float32))
            return out.reshape(NB, H, 1, HD).astype(q.dtype)
        run = scan_over(attn)
        timeit("anc_flat", lambda: run(q0, caches, scales, anc0), lambda o: o,
               note="single dot_general variant")

    print(json.dumps({"anc_micro": results, "n": N, "g": G, "t": T}))




def upd_main():
    """PROF_UPD=1: same isolates but with the per-step cache update in the
    scan carry — reproduces the full decode loop's aliasing/layout
    interaction (the HLO shows whole-cache VMEM staging + copy-back per
    step when the ancestry einsum consumes the updated buffer)."""
    global results
    results = []
    kr = jax.random.PRNGKey(0)
    q0 = jnp.ones((NB, H, 1, HD), jnp.bfloat16)
    caches = [(jax.random.randint(jax.random.fold_in(kr, i), (NB, H, HD, T),
                                  -127, 127, jnp.int8),
               jax.random.randint(jax.random.fold_in(kr, 1000 + i),
                                  (NB, H, HD, T), -127, 127, jnp.int8))
              for i in range(L)]
    scales = jnp.full((NB, H, T, 1), 0.01, jnp.bfloat16)
    anc0 = jax.random.randint(jax.random.fold_in(kr, 7), (NB, T), 0, G,
                              jnp.int32)

    def scan_upd(attn_step):
        @jax.jit
        def run(q0, caches, scales, anc):
            def step(carry, _):
                q, cache, pos = carry
                k8n = jnp.full((NB, H, HD, 1), 3, jnp.int8)
                acc = q
                new_cache = []
                for i, (ke, ve) in enumerate(cache):
                    ke = jax.lax.dynamic_update_slice_in_dim(ke, k8n, pos, axis=3)
                    ve = jax.lax.dynamic_update_slice_in_dim(ve, k8n, pos, axis=3)
                    new_cache.append((ke, ve))
                    acc = acc + attn_step(q, (ke, ve), scales, anc, pos)
                return (acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0),
                        new_cache, pos + 1), None
            (out, _, _), _ = jax.lax.scan(step, (q0, caches, jnp.int32(3)),
                                          None, length=STEPS)
            return out[0, 0, 0, :1]
        return run

    if want("upd_plain"):
        run = scan_upd(lambda q, kv, s, anc, pos: attention_int8_auto(
            q, kv[0], s, kv[1], s, pos=pos, causal=True))
        timeit("upd_plain", lambda: run(q0, caches, scales, anc0), lambda o: o,
               note="update + plain")

    if want("upd_anc"):
        run = scan_upd(lambda q, kv, s, anc, pos: attention_int8_ancestry(
            q, kv[0], s, kv[1], s, anc, pos, G))
        timeit("upd_anc", lambda: run(q0, caches, scales, anc0), lambda o: o,
               note="update + ancestry (current)")

    if want("upd_unroll"):
        # per-lane unrolled: g standard decode-attn einsums, select by mask
        def attn(q, kv, s, anc, pos):
            k8t, v8t = kv
            ss = s[..., 0].reshape(N, G, H, T)
            a = anc.reshape(N, G, T)
            q4 = q.reshape(N, G, H, HD)
            sc = None
            for k in range(G):
                kk = k8t.reshape(N, G, H, HD, T)[:, k]
                s_k = jnp.einsum("nbhd,nhdt->nbht", q4.astype(jnp.float32),
                                 kk.astype(jnp.float32))
                s_k = s_k * ss[:, k, None].astype(jnp.float32)
                sel_k = (a == k)[:, :, None, :]  # (n, b, 1, t)
                s_k = jnp.where(sel_k, s_k, 0.0)
                sc = s_k if sc is None else sc + s_k
            valid = jnp.arange(T)[None, None, None, :] <= pos
            sc = jnp.where(valid, sc, -jnp.inf)
            w = jax.nn.softmax(sc, axis=-1)  # (n, b, h, t)
            out = None
            for k in range(G):
                vv = v8t.reshape(N, G, H, HD, T)[:, k]
                sel_k = (a == k)[:, :, None, :]
                wv_k = jnp.where(sel_k, w * ss[:, k, None].astype(jnp.float32), 0.0)
                o_k = jnp.einsum("nbht,nhdt->nbhd", wv_k, vv.astype(jnp.float32))
                out = o_k if out is None else out + o_k
            return out.reshape(NB, H, 1, HD).astype(q.dtype)
        run = scan_upd(attn)
        timeit("upd_unroll", lambda: run(q0, caches, scales, anc0), lambda o: o,
               note="update + unrolled per-lane")

    print(json.dumps({"anc_upd": results}))


if os.environ.get("PROF_UPD"):
    _orig_main = main
    main = upd_main

if __name__ == "__main__":
    main()
