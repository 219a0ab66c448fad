"""Probe: decode SELF-attention lowering variants at serving shapes.

The r3 profile shows the self-attention stream running at ~200 GB/s while
the *same einsum* over the cross cache (Tk=1500) reaches 531 GB/s — and
the decode loop carries ~0.45 s of unaccounted overhead. Two suspects:

1. **Small per-(b,h) tiles**: at T=256 each batched-matvec element reads a
   (64, 256) int8 block = 16 KB; XLA's per-element overhead dominates.
2. **Column-write RMW**: `dynamic_update_slice` of one time column into
   the (B, H, d, T) cache touches every (32, 128) int8 tile spanning
   (B·H·d) sublanes — ⌈56·20·64/32⌉ tiles × 4 KB ≈ 9.2 MB read+write per
   array per layer per step ≈ 264 GB of RMW traffic over a 224-step loop,
   *independent of T*.

Variants (all operands runtime jit arguments; fetch-synced; 224-step
lax.scan with serial feedback — CLAUDE.md measurement gotchas apply):

  read_rate   pure q·K reduction (no softmax/PV) — achievable read ceiling
  read_rate_T same, T sweep 128/256/512/1024 — rate vs tile size
  base_ro     attention_int8_auto read-only (static cache)
  flat_ro     cache carried (B·H, d, T) — one batch dim
  vpu_ro      broadcast multiply+reduce form (no dot_general)
  hmerge_ro   cache (B, d, H, T): "bhd,bdht->bht" diagonal-h form
  upd_only    dus column writes only (k+v, 32L) — the RMW cost
  upd_td      dus into (B, H, T, d) layout (writes span 4× fewer tiles)
  base_rw     read+write per layer (the real decode pattern)
  tmajor_ro   TIME-MAJOR cache (T, B, H·d): attention as one elementwise
              stream (broadcast mul + reduce; no batched matvec at all)
  upd_tmajor  dus of one (1, B, H·d) plane — contiguous whole-tile write
  tmajor_rw   time-major read+write (the candidate redesign)

Run: python scripts/probe_self_attn.py   (knobs: PROF_ONLY, PROF_REPS,
BENCH_BATCH, BENCH_SAMPLE_LEN)
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
T = 256
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
    print(f"# {name:16s} {best:8.4f}s (compile {compile_s:5.1f}s) {note}",
          file=sys.stderr, flush=True)
    return best


def want(name: str) -> bool:
    return not ONLY or name in ONLY.split(",")


def scan_n(step, init):
    def body(c, _):
        return step(c), None
    out, _ = jax.lax.scan(body, init, None, length=STEPS)
    return out


def make_cache(t, key, layout="bhdt"):
    shape = {"bhdt": (L, B, H, HD, t), "bhtd": (L, B, H, t, HD),
             "bdht": (L, B, HD, H, t)}[layout]
    return jax.random.randint(key, shape, -127, 127, jnp.int8)


def gbs(t):
    # k+v, all layers, read once per step
    return 2 * L * B * H * HD * t / 1e9


def main():
    kr = jax.random.PRNGKey(0)
    q0 = jnp.ones((B, H, 1, HD), jnp.bfloat16)
    sk = make_cache(T, kr)
    sks = jnp.full((L, B, H, T, 1), 0.01, jnp.bfloat16)

    # ---- read ceiling: q·K reduction only, no softmax / PV -----------------
    if want("read_rate"):
        @jax.jit
        def rr(q0, sk):
            def step(q):
                s = sum(jnp.einsum("bhqd,bhdk->bhq", q.astype(jnp.bfloat16),
                                   sk[i].astype(jnp.bfloat16))
                        for i in range(L))
                return q * jnp.bfloat16(1e-3) + s[..., None] * jnp.bfloat16(1e-6)
            return scan_n(step, q0)
        t = timeit("read_rate", lambda: rr(q0, sk), lambda o: o[0, 0, 0, :1],
                   note=f"{gbs(T) / 2:.2f} GB/step (k only, no V)")
        print(f"#   -> {gbs(T) / 2 * STEPS / t:.0f} GB/s", file=sys.stderr)

    if want("read_rate_T"):
        for t_try in (128, 512, 1024):
            ck = make_cache(t_try, jax.random.fold_in(kr, t_try))

            @jax.jit
            def rrt(q0, ck):
                def step(q):
                    s = sum(jnp.einsum("bhqd,bhdk->bhq", q.astype(jnp.bfloat16),
                                       ck[i].astype(jnp.bfloat16))
                            for i in range(L))
                    return q * jnp.bfloat16(1e-3) + s[..., None] * jnp.bfloat16(1e-6)
                return scan_n(step, q0)
            t = timeit(f"read_rate_T{t_try}", lambda: rrt(q0, ck),
                       lambda o: o[0, 0, 0, :1])
            print(f"#   -> {gbs(t_try) / 2 * STEPS / t:.0f} GB/s", file=sys.stderr)
            del ck

    # ---- full attention, read-only (static cache) --------------------------
    if want("base_ro"):
        @jax.jit
        def base_ro(q0, sk, sks):
            def step(carry):
                q, pos = carry
                acc = q
                for i in range(L):
                    acc = acc + attention_int8_auto(q, sk[i], sks[i], sk[i],
                                                    sks[i], pos=pos, causal=True)
                return (acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0), pos + 1)
            return scan_n(step, (q0, jnp.int32(3)))[0]
        t = timeit("base_ro", lambda: base_ro(q0, sk, sks),
                   lambda o: o[0, 0, 0, :1], note=f"{gbs(T):.2f} GB/step")
        print(f"#   -> {gbs(T) * STEPS / t:.0f} GB/s", file=sys.stderr)

    if want("flat_ro"):
        skf = sk.reshape(L, B * H, HD, T)
        sksf = sks.reshape(L, B * H, T, 1)

        @jax.jit
        def flat_ro(q0, skf, sksf):
            def step(carry):
                q, pos = carry
                qf = q.reshape(B * H, 1, HD)
                k_idx = jnp.arange(T)[None, None, :]
                mask = jnp.where(k_idx <= pos, 0.0, -jnp.inf)
                acc = q
                for i in range(L):
                    s = jnp.einsum("bqd,bdk->bqk", qf.astype(jnp.float32),
                                   skf[i].astype(jnp.float32))
                    s = s * sksf[i][..., 0][:, None, :] + mask
                    w = jax.nn.softmax(s, axis=-1)
                    w = w * sksf[i][..., 0][:, None, :]
                    o = jnp.einsum("bqk,bdk->bqd", w, skf[i].astype(jnp.float32))
                    acc = acc + o.reshape(B, H, 1, HD).astype(q.dtype)
                return (acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0), pos + 1)
            return scan_n(step, (q0, jnp.int32(3)))[0]
        t = timeit("flat_ro", lambda: flat_ro(q0, skf, sksf),
                   lambda o: o[0, 0, 0, :1])
        print(f"#   -> {gbs(T) * STEPS / t:.0f} GB/s", file=sys.stderr)
        del skf, sksf

    if want("vpu_ro"):
        @jax.jit
        def vpu_ro(q0, sk, sks):
            def step(carry):
                q, pos = carry
                k_idx = jnp.arange(T)[None, None, None, :]
                mask = jnp.where(k_idx <= pos, 0.0, -jnp.inf)
                acc = q
                for i in range(L):
                    kf = sk[i].astype(jnp.bfloat16)
                    # scores[b,h,1,t] = sum_d q[b,h,1,d] * k[b,h,d,t]
                    s = jnp.sum(q[:, :, 0, :, None] * kf, axis=2,
                                dtype=jnp.float32)[:, :, None, :]
                    s = s * sks[i][..., 0][:, :, None, :] + mask
                    w = jax.nn.softmax(s, axis=-1)
                    w = (w * sks[i][..., 0][:, :, None, :]).astype(jnp.bfloat16)
                    o = jnp.sum(w[:, :, 0, None, :] * kf, axis=3,
                                dtype=jnp.float32)[:, :, None, :]
                    acc = acc + o.astype(q.dtype)
                return (acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0), pos + 1)
            return scan_n(step, (q0, jnp.int32(3)))[0]
        t = timeit("vpu_ro", lambda: vpu_ro(q0, sk, sks),
                   lambda o: o[0, 0, 0, :1])
        print(f"#   -> {gbs(T) * STEPS / t:.0f} GB/s", file=sys.stderr)

    if want("hmerge_ro"):
        skh = make_cache(T, jax.random.fold_in(kr, 7), layout="bdht")
        sksh = jnp.full((L, B, H, T), 0.01, jnp.bfloat16)

        @jax.jit
        def hmerge_ro(q0, skh, sksh):
            def step(carry):
                q, pos = carry
                k_idx = jnp.arange(T)[None, None, :]
                mask = jnp.where(k_idx <= pos, 0.0, -jnp.inf)
                acc = q
                for i in range(L):
                    s = jnp.einsum("bhd,bdht->bht", q[:, :, 0].astype(jnp.float32),
                                   skh[i].astype(jnp.float32))
                    s = s * sksh[i] + mask
                    w = jax.nn.softmax(s, axis=-1)
                    w = w * sksh[i]
                    o = jnp.einsum("bht,bdht->bhd", w, skh[i].astype(jnp.float32))
                    acc = acc + o[:, :, None, :].astype(q.dtype)
                return (acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0), pos + 1)
            return scan_n(step, (q0, jnp.int32(3)))[0]
        t = timeit("hmerge_ro", lambda: hmerge_ro(q0, skh, sksh),
                   lambda o: o[0, 0, 0, :1])
        print(f"#   -> {gbs(T) * STEPS / t:.0f} GB/s", file=sys.stderr)
        del skh, sksh

    # ---- update-only: the column-write RMW cost -----------------------------
    rmw_gb = 2 * 2 * L * (B * H * HD + 31) // 32 * 32 * 128 / 1e9  # r+w, k+v

    if want("upd_only"):
        @jax.jit
        def upd_only(carry0):
            def step(carry):
                q, cache, pos = carry
                kq = jnp.clip(jnp.round(q * 100), -127, 127).astype(jnp.int8)
                kqt = jnp.swapaxes(kq, 2, 3)
                new = []
                for ke, ve in cache:
                    ke = jax.lax.dynamic_update_slice_in_dim(ke, kqt, pos, axis=3)
                    ve = jax.lax.dynamic_update_slice_in_dim(ve, kqt, pos, axis=3)
                    new.append((ke, ve))
                probe = sum(e[0][0, 0, 0, :1].astype(jnp.bfloat16) for e in new)
                return (q * jnp.bfloat16(1.0) + probe * jnp.bfloat16(1e-6),
                        new, (pos + 1) % T)
            return scan_n(step, carry0)[0]
        caches = [(sk[i], sk[i]) for i in range(L)]
        t = timeit("upd_only", lambda: upd_only((q0, caches, jnp.int32(3))),
                   lambda o: o[0, 0, 0, :1],
                   note=f"tile-RMW model {rmw_gb:.2f} GB/step")
        print(f"#   -> model rate {rmw_gb * STEPS / t:.0f} GB/s",
              file=sys.stderr)

    if want("upd_td"):
        skd = make_cache(T, jax.random.fold_in(kr, 9), layout="bhtd")

        @jax.jit
        def upd_td(carry0):
            def step(carry):
                q, cache, pos = carry
                kq = jnp.clip(jnp.round(q * 100), -127, 127).astype(jnp.int8)
                new = []
                for ke, ve in cache:
                    ke = jax.lax.dynamic_update_slice_in_dim(ke, kq, pos, axis=2)
                    ve = jax.lax.dynamic_update_slice_in_dim(ve, kq, pos, axis=2)
                    new.append((ke, ve))
                probe = sum(e[0][0, 0, 0, :1].astype(jnp.bfloat16) for e in new)
                return (q * jnp.bfloat16(1.0) + probe * jnp.bfloat16(1e-6),
                        new, (pos + 1) % T)
            return scan_n(step, carry0)[0]
        caches = [(skd[i], skd[i]) for i in range(L)]
        t = timeit("upd_td", lambda: upd_td((q0, caches, jnp.int32(3))),
                   lambda o: o[0, 0, 0, :1], note="(B,H,T,d) layout")
        del skd, caches

    # ---- read + write, the real decode pattern ------------------------------
    if want("base_rw"):
        from whisper_mlx_tpu.ops.kv_quant import quantize_kv

        @jax.jit
        def base_rw(carry0, sks):
            def step(carry):
                q, cache, pos = carry
                k8n, _ = quantize_kv(q)
                k8nt = jnp.swapaxes(k8n, 2, 3)
                acc = q
                new = []
                for i, (ke, ve) in enumerate(cache):
                    ke = jax.lax.dynamic_update_slice_in_dim(ke, k8nt, pos, axis=3)
                    ve = jax.lax.dynamic_update_slice_in_dim(ve, k8nt, pos, axis=3)
                    new.append((ke, ve))
                    acc = acc + attention_int8_auto(q, ke, sks[i], ve, sks[i],
                                                    pos=pos, causal=True)
                return (acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0),
                        new, (pos + 1) % T)
            return scan_n(step, carry0)[0]
        caches = [(sk[i], sk[i]) for i in range(L)]
        t = timeit("base_rw", lambda: base_rw((q0, caches, jnp.int32(3)), sks),
                   lambda o: o[0, 0, 0, :1],
                   note=f"{gbs(T):.2f} GB/step read + RMW writes")
        print(f"#   -> {gbs(T) * STEPS / t:.0f} GB/s (reads only counted)",
              file=sys.stderr)

    # ---- TIME-MAJOR cache: (T, B, H*d) — elementwise-stream attention -------
    def tmajor_attn(q, kT, ksT, vT, vsT, pos):
        """q (B,H,1,d); kT/vT (T, B, H*d) int8; ksT/vsT (T, B, H) bf16.

        scores[t,b,h] = ks[t,b,h] * sum_d q[b,h,d] * k[t,b,h,d] — one
        broadcast multiply over the cache in ITS OWN layout order plus a
        minor-axis reduce; no batched matvec. out[b,h,d] =
        sum_t w[t,b,h] * vs[t,b,h] * v[t,b,h,d] — major-axis reduce."""
        kTv = kT.reshape(T, B, H, HD)
        p = q[None, :, :, 0, :].astype(jnp.bfloat16) * kTv.astype(jnp.bfloat16)
        s = jnp.sum(p, axis=-1, dtype=jnp.float32)  # (T, B, H)
        s = s * ksT.astype(jnp.float32)
        t_idx = jnp.arange(T)[:, None, None]
        s = jnp.where(t_idx <= pos, s, -jnp.inf)
        w = jax.nn.softmax(s, axis=0)  # over T
        wv = (w * vsT.astype(jnp.float32)).astype(jnp.bfloat16)
        vTv = vT.reshape(T, B, H, HD)
        o = jnp.sum(wv[..., None] * vTv.astype(jnp.bfloat16), axis=0,
                    dtype=jnp.float32)  # (B, H, d)
        return o[:, :, None, :].astype(q.dtype)

    if want("tmajor_ro"):
        kT = jax.random.randint(jax.random.fold_in(kr, 11), (L, T, B, H * HD),
                                -127, 127, jnp.int8)
        ksT = jnp.full((L, T, B, H), 0.01, jnp.bfloat16)

        @jax.jit
        def tmajor_ro(q0, kT, ksT):
            def step(carry):
                q, pos = carry
                acc = q
                for i in range(L):
                    acc = acc + tmajor_attn(q, kT[i], ksT[i], kT[i], ksT[i], pos)
                return (acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0), pos + 1)
            return scan_n(step, (q0, jnp.int32(3)))[0]
        t = timeit("tmajor_ro", lambda: tmajor_ro(q0, kT, ksT),
                   lambda o: o[0, 0, 0, :1], note=f"{gbs(T):.2f} GB/step")
        print(f"#   -> {gbs(T) * STEPS / t:.0f} GB/s", file=sys.stderr)
        del kT, ksT

    if want("upd_tmajor"):
        kT0 = jax.random.randint(jax.random.fold_in(kr, 12), (L, T, B, H * HD),
                                 -127, 127, jnp.int8)

        @jax.jit
        def upd_tmajor(carry0):
            def step(carry):
                q, cache, pos = carry
                kq = jnp.clip(jnp.round(q * 100), -127, 127).astype(jnp.int8)
                plane = kq.reshape(1, B, H * HD)
                new = []
                for ke, ve in cache:
                    ke = jax.lax.dynamic_update_slice_in_dim(ke, plane, pos, axis=0)
                    ve = jax.lax.dynamic_update_slice_in_dim(ve, plane, pos, axis=0)
                    new.append((ke, ve))
                probe = sum(e[0][0, 0, :1].astype(jnp.bfloat16) for e in new)
                return (q * jnp.bfloat16(1.0)
                        + probe[None, None] * jnp.bfloat16(1e-6),
                        new, (pos + 1) % T)
            return scan_n(step, carry0)[0]
        caches = [(kT0[i], kT0[i]) for i in range(L)]
        t = timeit("upd_tmajor", lambda: upd_tmajor((q0, caches, jnp.int32(3))),
                   lambda o: o[0, 0, 0, :1], note="contiguous plane writes")
        del kT0, caches

    if want("tmajor_rw"):
        kT0 = jax.random.randint(jax.random.fold_in(kr, 13), (L, T, B, H * HD),
                                 -127, 127, jnp.int8)
        ksT0 = jnp.full((L, T, B, H), 0.01, jnp.bfloat16)

        @jax.jit
        def tmajor_rw(carry0):
            def step(carry):
                q, cache, pos = carry
                kq = jnp.clip(jnp.round(q * 100), -127, 127).astype(jnp.int8)
                plane = kq.reshape(1, B, H * HD)
                splane = jnp.full((1, B, H), 0.01, jnp.bfloat16)
                acc = q
                new = []
                for ke, ks, ve, vs in cache:
                    ke = jax.lax.dynamic_update_slice_in_dim(ke, plane, pos, axis=0)
                    ks = jax.lax.dynamic_update_slice_in_dim(ks, splane, pos, axis=0)
                    ve = jax.lax.dynamic_update_slice_in_dim(ve, plane, pos, axis=0)
                    vs = jax.lax.dynamic_update_slice_in_dim(vs, splane, pos, axis=0)
                    new.append((ke, ks, ve, vs))
                    acc = acc + tmajor_attn(q, ke, ks, ve, vs, pos)
                return (acc * jnp.bfloat16(1e-3) + jnp.bfloat16(1.0),
                        new, (pos + 1) % T)
            return scan_n(step, carry0)[0]
        caches = [(kT0[i], ksT0[i], kT0[i], ksT0[i]) for i in range(L)]
        t = timeit("tmajor_rw", lambda: tmajor_rw((q0, caches, jnp.int32(3))),
                   lambda o: o[0, 0, 0, :1],
                   note=f"{gbs(T):.2f} GB/step + plane writes")
        print(f"#   -> {gbs(T) * STEPS / t:.0f} GB/s (reads only counted)",
              file=sys.stderr)

    print(json.dumps({"probe": results, "batch": B, "T": T, "steps": STEPS}))


if __name__ == "__main__":
    main()
