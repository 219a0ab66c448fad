"""Probe: pure-XLA grouped-einsum dequant matmul vs the Pallas kernel.

VERDICT r2 item 2: the 4-bit-resident decode loses ~20% to bf16. Diagnosis
update (r3 micro-profiles): XLA streams NATIVE int8 operands at 531 GB/s
and int4 at 350 GB/s (packed bytes) with the convert fused into einsums —
while each opaque pallas_call (~193 of them per decode step) blocks XLA
from overlapping weight streams with attention. So try the dequant matmul
in PURE XLA over natively-stored codes:

    partial[m, n, g] = sum_s x[m, g, s] * q[n, g, s]     (int convert fused)
    y[m, n]          = sum_g partial * scales[n, g]  +  xg[m, g] @ biases.T

Exact same affine-dequant algebra as ops/quant_pallas.py (bias fold via
group sums of x), zero packed-word unpacking, zero kernel launches.

Measures a 224-step scan over a realistic per-step matmul chain
(qkv/o/xq/xo/fc1/fc2 of large-v3) for each backend:
  bf16      — dense reference
  pallas    — current fused kernel (ops/quant_pallas.py)
  xla_i8    — grouped einsum over int8 codes (1 byte/elt resident)
  xla_i4    — grouped einsum over native int4 codes (packed s4 resident)

Run: python scripts/probe_quant_xla.py
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
D = 1280
STEPS = int(os.environ.get("BENCH_SAMPLE_LEN", "224"))
GS = 64
L = int(os.environ.get("PROF_QL", "8"))  # layers modeled (scale x4 for 32)

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# the decode step's per-layer matmul chain (fused qkv)
SHAPES = [(D, 3 * D), (D, D), (D, D), (D, D), (D, 4 * D), (4 * D, D)]


def timeit(name, fn, note=""):
    t0 = time.perf_counter()
    np.asarray(fn()[0, :1])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn()[0, :1])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"# {name:10s} {best:8.4f}s (compile {compile_s:5.1f}s) {note}",
          file=sys.stderr, flush=True)
    return best


def main():
    kr = jax.random.PRNGKey(0)
    layers_codes = []   # int8 codes in [0, 15]
    layers_meta = []    # (scales, biases) per matmul
    layers_bf16 = []
    for li in range(L):
        codes, metas, dense = [], [], []
        for si, (k, n) in enumerate(SHAPES):
            key = jax.random.fold_in(kr, li * 16 + si)
            q = jax.random.randint(key, (n, k), 0, 16, jnp.int8)
            s = jax.random.uniform(jax.random.fold_in(key, 1), (n, k // GS),
                                   jnp.float32, 0.001, 0.02)
            bmin = jax.random.uniform(jax.random.fold_in(key, 2), (n, k // GS),
                                      jnp.float32, -0.1, 0.0)
            codes.append(q)
            metas.append((s, bmin))
            dense.append((q.astype(jnp.bfloat16) * 0.01).T)  # (k, n)
        layers_codes.append(codes)
        layers_meta.append(metas)
        layers_bf16.append(dense)

    x0 = jnp.ones((B, D), jnp.bfloat16)

    def chain_bf16(x, dense):
        h = x
        qkv = h @ dense[0]
        h = (qkv[:, :D] + qkv[:, D:2 * D] + qkv[:, 2 * D:]) @ dense[1]
        h = h + (h @ dense[2]) @ dense[3]
        h = h + jax.nn.gelu(h @ dense[4], approximate=False) @ dense[5]
        return h

    def xla_group_mm(x, q, s, bmin):
        """x (M, K) bf16 · codes (N, K) → (M, N); exact affine dequant."""
        M, K = x.shape
        N = q.shape[0]
        G = K // GS
        xg = x.astype(jnp.float32).reshape(M, G, GS).sum(-1)      # (M, G)
        xr = x.reshape(M, G, GS)
        qr = q.reshape(N, G, GS)
        partial = jnp.einsum("mgs,ngs->mng", xr.astype(jnp.bfloat16),
                             qr.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)  # (M, N, G)
        y = jnp.einsum("mng,ng->mn", partial, s)
        y = y + xg @ bmin.T
        return y.astype(x.dtype)

    def chain_xla(x, codes, metas):
        h = x
        qkv = xla_group_mm(h, codes[0], *metas[0])
        h = xla_group_mm(qkv[:, :D] + qkv[:, D:2 * D] + qkv[:, 2 * D:],
                         codes[1], *metas[1])
        h = h + xla_group_mm(xla_group_mm(h, codes[2], *metas[2]),
                             codes[3], *metas[3])
        h = h + xla_group_mm(
            jax.nn.gelu(xla_group_mm(h, codes[4], *metas[4]), approximate=False),
            codes[5], *metas[5])
        return h

    def chain_pallas(x, qts):
        from whisper_mlx_tpu.ops.quant import quant_matmul

        h = x
        qkv = quant_matmul(h, qts[0], backend="pallas")
        h = quant_matmul(qkv[:, :D] + qkv[:, D:2 * D] + qkv[:, 2 * D:],
                         qts[1], backend="pallas")
        h = h + quant_matmul(quant_matmul(h, qts[2], backend="pallas"),
                             qts[3], backend="pallas")
        h = h + quant_matmul(
            jax.nn.gelu(quant_matmul(h, qts[4], backend="pallas"),
                        approximate=False),
            qts[5], backend="pallas")
        return h

    def scan_over(chain_fn, per_layer):
        def step(h, _):
            for layer in per_layer:
                h = chain_fn(h, *layer) * jnp.bfloat16(1e-2)
            return h, None
        out, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return out

    gb_w4 = sum(k * n for k, n in SHAPES) * L / 2 / 1e9
    gb_w8 = 2 * gb_w4
    gb_w16 = 4 * gb_w4

    # bf16 reference — weights are RUNTIME ARGS (captured constants both
    # blow the remote-compile relay's request-size limit and time
    # impossibly fast on this backend; see CLAUDE.md gotchas)
    f_bf16 = jax.jit(lambda x, dense: scan_over(
        lambda h, d: chain_bf16(h, d), [(d,) for d in dense]))
    t = timeit("bf16", lambda: f_bf16(x0, layers_bf16),
               note=f"{gb_w16:.2f} GB/step")
    print(f"#   -> {gb_w16 * STEPS / t:.0f} GB/s; 32L-equiv {t * 32 / L:.2f}s",
          file=sys.stderr)

    # xla grouped-einsum int8 codes
    f_i8 = jax.jit(lambda x, codes, meta: scan_over(
        lambda h, c, m: chain_xla(h, c, m),
        [(codes[i], meta[i]) for i in range(L)]))
    t = timeit("xla_i8", lambda: f_i8(x0, layers_codes, layers_meta),
               note=f"{gb_w8:.2f} GB/step codes")
    print(f"#   -> {gb_w8 * STEPS / t:.0f} GB/s; 32L-equiv {t * 32 / L:.2f}s",
          file=sys.stderr)

    # xla grouped-einsum native int4 codes (converted inside jit: 4-bit
    # dtypes cannot cross the jit boundary on this backend).
    # PROBE_I4_DTYPE=int4|uint4 — the model path uses uint4 (codes 0..15);
    # s4 would need recentering.
    i4_dtype = getattr(jnp, os.environ.get("PROBE_I4_DTYPE", "int4"))

    def f_i4_build(x, all_codes, all_meta):
        codes4 = [[q.astype(i4_dtype) for q in layer] for layer in all_codes]
        return scan_over(lambda h, c, m: chain_xla(h, c, m),
                         [(codes4[i], all_meta[i]) for i in range(L)])

    f_i4 = jax.jit(f_i4_build)
    t = timeit("xla_i4", lambda: f_i4(x0, layers_codes, layers_meta),
               note=f"{gb_w4:.2f} GB/step packed")
    print(f"#   -> {gb_w4 * STEPS / t:.0f} GB/s; 32L-equiv {t * 32 / L:.2f}s",
          file=sys.stderr)

    # pallas fused kernel (current)
    from whisper_mlx_tpu.ops.quant import QuantTensor

    def pack4(q):  # (N, K) int8 codes → packed uint32
        N, K = q.shape
        qq = q.astype(jnp.uint32).reshape(N, K // 8, 8)
        packed = jnp.zeros((N, K // 8), jnp.uint32)
        for i in range(8):
            packed = packed | (qq[..., i] << jnp.uint32(i * 4))
        return packed

    layers_qt = [
        [QuantTensor(pack4(q), s, bmin, 4, GS)
         for q, (s, bmin) in zip(layers_codes[i], layers_meta[i])]
        for i in range(L)
    ]
    f_pl = jax.jit(lambda x, qts: scan_over(
        lambda h, q: chain_pallas(h, q), [(qts[i],) for i in range(L)]))
    t = timeit("pallas", lambda: f_pl(x0, layers_qt),
               note=f"{gb_w4:.2f} GB/step packed")
    print(f"#   -> {gb_w4 * STEPS / t:.0f} GB/s; 32L-equiv {t * 32 / L:.2f}s",
          file=sys.stderr)

    # exactness: xla grouped path == dequantized reference (small shapes)
    x = jax.random.normal(jax.random.fold_in(kr, 77), (4, 128), jnp.float32)
    q = jax.random.randint(jax.random.fold_in(kr, 78), (32, 128), 0, 16, jnp.int8)
    s = jax.random.uniform(jax.random.fold_in(kr, 79), (32, 2), jnp.float32, 0.01, 0.1)
    bm = jax.random.uniform(jax.random.fold_in(kr, 80), (32, 2), jnp.float32, -1, 0)
    w = (q.astype(jnp.float32).reshape(32, 2, 64) * s[..., None] + bm[..., None]).reshape(32, 128)
    ref = x @ w.T
    got = xla_group_mm(x, q, s, bm)
    err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    print(f"# xla_group_mm rel err vs dequant reference: {err:.2e} "
          f"(bf16-dot rounding class)", file=sys.stderr)
    print(json.dumps({"probe": "quant_xla", "ok": True}))


if __name__ == "__main__":
    main()
