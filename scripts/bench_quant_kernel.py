"""Microbenchmark: fused dequant-matmul kernel variants vs bf16 dense.

Per-op dispatch on this box has a ~400 µs floor (CLAUDE.md), so each
variant runs ITERS times inside ONE jitted lax.scan with a data dependency
between iterations (output folded back into x) — the measured time is
device-side per-call cost, not dispatch.

Shapes are the large-v3 decode-step matmuls at the default batch.
Prints one line per (shape, variant): µs/call and the ratio vs bf16 dense.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_mlx_tpu.ops.quant import QuantTensor, quantize
from whisper_mlx_tpu.ops.quant_pallas import (
    _planar_perm,
    _round_up,
    quant_matmul_pallas,
)

ITERS = int(os.environ.get("QB_ITERS", "100"))
BATCH = int(os.environ.get("QB_BATCH", "24"))
BITS = 4
GROUP = 64


def _accum_kernel(x_ref, wq_ref, scales_ref, biases_ref, out_ref,
                  *, bits: int, group_size: int, out_dtype):
    """Variant: per-plane accumulated dots — no concatenated w built."""
    compute = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:]
    wq = wq_ref[:]
    scales = scales_ref[:]
    biases = biases_ref[:]
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    tile_n, kp = wq.shape
    g = scales.shape[1]
    words_per_group = group_size // per_word

    g_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kp), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kp), 1)
    expand = (c_ids // words_per_group == g_ids).astype(jnp.float32)
    prec = jax.lax.Precision.HIGHEST
    scale_w = jax.lax.dot(scales.astype(jnp.float32), expand,
                          precision=prec).astype(compute)
    bias_w = jax.lax.dot(biases.astype(jnp.float32), expand,
                         precision=prec).astype(compute)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(per_word):
        v = (wq >> jnp.uint32(i * bits)) & mask
        v = pltpu.bitcast(v, jnp.int32).astype(compute)
        w_i = v * scale_w + bias_w  # (TILE_N, Kp)
        acc = acc + jax.lax.dot_general(
            x[:, i * kp:(i + 1) * kp].astype(compute), w_i,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "kernel"))
def quant_matmul_variant(x, q: QuantTensor, tile_n: int = 256, kernel=_accum_kernel):
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    N = q.shape[0]
    bits, group_size = q.bits, q.group_size
    per_word = 32 // bits

    TILE_N = tile_n if N % tile_n == 0 else (256 if N % 256 == 0 else 128)
    Mp = _round_up(max(M, 8), 8)
    Np = _round_up(N, TILE_N)

    x_planar = x2[:, jnp.asarray(_planar_perm(K, per_word))]
    x_pad = jnp.zeros((Mp, K), x2.dtype).at[:M].set(x_planar)
    wq, scales, biases = q.w_q, q.scales, q.biases
    if Np != N:
        wq = jnp.zeros((Np, wq.shape[1]), wq.dtype).at[:N].set(wq)
        scales = jnp.zeros((Np, scales.shape[1]), scales.dtype).at[:N].set(scales)
        biases = jnp.zeros((Np, biases.shape[1]), biases.dtype).at[:N].set(biases)

    grid = (Np // TILE_N,)
    out = pl.pallas_call(
        functools.partial(kernel, bits=bits, group_size=group_size, out_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, K // per_word), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, K // group_size), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, K // group_size), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=Mp * K * 4 + Np * K * bits // 8 + Mp * Np * 4,
            transcendentals=0,
        ),
    )(x_pad, wq, scales, biases)
    return out[:M, :N].reshape(*lead, N)


def _e1_kernel(x_ref, wq_ref, scales_ref, biases_ref, out_ref,
               *, bits: int, group_size: int, out_dtype):
    """E1: expansion dots at default (bf16) MXU precision.

    The 0/1 expansion matrix makes the dot a pure selection — casting the
    scales to bf16 BEFORE the select equals casting after (identical
    rounding), so this is bit-identical to the current kernel's output
    while running the two expansion dots ~8x faster.
    """
    compute = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:]
    wq = wq_ref[:]
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    tile_n, kp = wq.shape
    g = scales_ref.shape[1]
    words_per_group = group_size // per_word

    g_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kp), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kp), 1)
    expand = (c_ids // words_per_group == g_ids).astype(compute)
    scale_w = jax.lax.dot(scales_ref[:].astype(compute), expand,
                          preferred_element_type=jnp.float32).astype(compute)
    bias_w = jax.lax.dot(biases_ref[:].astype(compute), expand,
                         preferred_element_type=jnp.float32).astype(compute)

    planes = []
    for i in range(per_word):
        v = (wq >> jnp.uint32(i * bits)) & mask
        v = pltpu.bitcast(v, jnp.int32).astype(compute)
        planes.append(v * scale_w + bias_w)
    w_planar = jnp.concatenate(planes, axis=1)
    out_ref[:] = jax.lax.dot_general(
        x.astype(compute), w_planar,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _e2_kernel(x_ref, wq_ref, scale_w_ref, bias_w_ref, out_ref,
               *, bits: int, group_size: int, out_dtype):
    """E2: per-word scale/bias precomputed OUTSIDE (HBM (N, Kp) bf16 each).

    Kernel does only shift/mask/cast/FMA + one dot. Trades 0.5 B/elem extra
    HBM for zero in-kernel expansion work.
    """
    compute = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:]
    wq = wq_ref[:]
    scale_w = scale_w_ref[:].astype(compute)
    bias_w = bias_w_ref[:].astype(compute)
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)

    planes = []
    for i in range(per_word):
        v = (wq >> jnp.uint32(i * bits)) & mask
        v = pltpu.bitcast(v, jnp.int32).astype(compute)
        planes.append(v * scale_w + bias_w)
    w_planar = jnp.concatenate(planes, axis=1)
    out_ref[:] = jax.lax.dot_general(
        x.astype(compute), w_planar,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _e3_kernel(x_ref, xg_ref, wq_ref, scale_w_ref, biases_ref, out_ref,
               *, bits: int, group_size: int, out_dtype):
    """E3: bias folded out via group-sums — kernel multiplies only.

    out = sum_k x*s*v + sum_g bias[n,g]*xg[m,g]; xg precomputed outside.
    In-kernel per element: shift, mask, cast, mul (no add).
    """
    compute = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:]
    xg = xg_ref[:].astype(compute)  # (M, G)
    wq = wq_ref[:]
    scale_w = scale_w_ref[:].astype(compute)  # (TILE_N, Kp)
    biases = biases_ref[:].astype(compute)  # (TILE_N, G)
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)

    planes = []
    for i in range(per_word):
        v = (wq >> jnp.uint32(i * bits)) & mask
        v = pltpu.bitcast(v, jnp.int32).astype(compute)
        planes.append(v * scale_w)
    w_planar = jnp.concatenate(planes, axis=1)
    acc = jax.lax.dot_general(
        x.astype(compute), w_planar,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(
        xg, biases,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc.astype(out_dtype)


def _prep_common(x, q):
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    N = q.shape[0]
    per_word = 32 // q.bits
    x_planar = x2[:, jnp.asarray(_planar_perm(K, per_word))]
    return x2, x_planar, M, N, K, per_word


@functools.partial(jax.jit, static_argnames=("tile_n",))
def quant_matmul_e1(x, q: QuantTensor, tile_n: int = 256):
    return quant_matmul_variant(x, q, tile_n, _e1_kernel)


def make_scale_words(q: QuantTensor):
    """(N, Kp) bf16 per-word scale/bias tables (host-precomputed for E2/E3)."""
    per_word = 32 // q.bits
    wpg = q.group_size // per_word
    kp = q.w_q.shape[1]
    idx = np.arange(kp) // wpg
    return (jnp.asarray(np.asarray(q.scales)[:, idx], jnp.bfloat16),
            jnp.asarray(np.asarray(q.biases)[:, idx], jnp.bfloat16))


@functools.partial(jax.jit, static_argnames=("tile_n",))
def quant_matmul_e2(x, q: QuantTensor, scale_w, bias_w, tile_n: int = 256):
    x2, x_planar, M, N, K, per_word = _prep_common(x, q)
    Mp = _round_up(max(M, 8), 8)
    TILE_N = tile_n if N % tile_n == 0 else (256 if N % 256 == 0 else 128)
    Np = _round_up(N, TILE_N)
    x_pad = jnp.zeros((Mp, K), x2.dtype).at[:M].set(x_planar)
    wq, sw, bw = q.w_q, scale_w, bias_w
    if Np != N:
        wq = jnp.zeros((Np, wq.shape[1]), wq.dtype).at[:N].set(wq)
        sw = jnp.zeros((Np, sw.shape[1]), sw.dtype).at[:N].set(sw)
        bw = jnp.zeros((Np, bw.shape[1]), bw.dtype).at[:N].set(bw)
    kp = K // per_word
    out = pl.pallas_call(
        functools.partial(_e2_kernel, bits=q.bits, group_size=q.group_size,
                          out_dtype=x.dtype),
        grid=(Np // TILE_N,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=Mp * K * 4 + Np * K * q.bits // 8 + Np * kp * 4 + Mp * Np * 4,
            transcendentals=0,
        ),
    )(x_pad, wq, sw, bw)
    return out[:M, :N].reshape(*x.shape[:-1], N)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def quant_matmul_e3(x, q: QuantTensor, scale_w, tile_n: int = 256):
    x2, x_planar, M, N, K, per_word = _prep_common(x, q)
    G = K // q.group_size
    xg = x2.reshape(M, G, q.group_size).sum(-1)  # group sums, outside kernel
    Mp = _round_up(max(M, 8), 8)
    TILE_N = tile_n if N % tile_n == 0 else (256 if N % 256 == 0 else 128)
    Np = _round_up(N, TILE_N)
    x_pad = jnp.zeros((Mp, K), x2.dtype).at[:M].set(x_planar)
    xg_pad = jnp.zeros((Mp, G), x2.dtype).at[:M].set(xg.astype(x2.dtype))
    wq, sw, b = q.w_q, scale_w, q.biases
    if Np != N:
        wq = jnp.zeros((Np, wq.shape[1]), wq.dtype).at[:N].set(wq)
        sw = jnp.zeros((Np, sw.shape[1]), sw.dtype).at[:N].set(sw)
        b = jnp.zeros((Np, b.shape[1]), b.dtype).at[:N].set(b)
    kp = K // per_word
    out = pl.pallas_call(
        functools.partial(_e3_kernel, bits=q.bits, group_size=q.group_size,
                          out_dtype=x.dtype),
        grid=(Np // TILE_N,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=Mp * K * 4 + Np * K * q.bits // 8 + Np * kp * 2 + Mp * Np * 4,
            transcendentals=0,
        ),
    )(x_pad, xg_pad, wq, sw, b)
    return out[:M, :N].reshape(*x.shape[:-1], N)


def repack_strided(q: QuantTensor) -> QuantTensor:
    """Re-pack so word c holds original columns {c + i*Kp}: the kernel's
    plane-major concat then reproduces ORIGINAL column order — no activation
    permutation needed at all (numerics identical; host-side, once)."""
    per_word = 32 // q.bits
    w_q = np.asarray(q.w_q)
    n, kp = w_q.shape
    k = kp * per_word
    vals = np.zeros((n, k), np.uint32)
    for i in range(per_word):
        vals[:, i::per_word] = (w_q >> np.uint32(i * q.bits)) & ((1 << q.bits) - 1)
    # vals[:, j] = original col j. word c now packs cols {c + i*Kp}
    packed = np.zeros((n, kp), np.uint32)
    for i in range(per_word):
        packed |= vals[:, i * kp:(i + 1) * kp] << np.uint32(i * q.bits)
    return QuantTensor(jnp.asarray(packed), q.scales, q.biases, q.bits, q.group_size)


def _e5_kernel(x_ref, wq_ref, scales_ref, biases_ref, out_ref,
               *, bits: int, group_size: int, out_dtype):
    """E5: strided-repacked weights — x in natural order, full-width bf16
    expansion of scales/biases to (TILE_N, K), single dot."""
    compute = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:]
    wq = wq_ref[:]
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    tile_n, kp = wq.shape
    k = kp * per_word
    g = scales_ref.shape[1]

    g_ids = jax.lax.broadcasted_iota(jnp.int32, (g, k), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (g, k), 1)
    expand = (c_ids // group_size == g_ids).astype(compute)  # (G, K)
    scale_k = jax.lax.dot(scales_ref[:].astype(compute), expand,
                          preferred_element_type=jnp.float32).astype(compute)  # (TILE_N, K)
    bias_k = jax.lax.dot(biases_ref[:].astype(compute), expand,
                         preferred_element_type=jnp.float32).astype(compute)

    planes = []
    for i in range(per_word):
        v = (wq >> jnp.uint32(i * bits)) & mask
        planes.append(pltpu.bitcast(v, jnp.int32).astype(compute))
    w = jnp.concatenate(planes, axis=1) * scale_k + bias_k  # original order
    out_ref[:] = jax.lax.dot_general(
        x.astype(compute), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def quant_matmul_e5(x, q: QuantTensor, tile_n: int = 256):
    """Strided-packed kernel: NO x permutation, natural column order."""
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    N = q.shape[0]
    per_word = 32 // q.bits
    TILE_N = tile_n if N % tile_n == 0 else (256 if N % 256 == 0 else 128)
    Mp = _round_up(max(M, 8), 8)
    Np = _round_up(N, TILE_N)
    x_pad = x2 if Mp == M else jnp.zeros((Mp, K), x2.dtype).at[:M].set(x2)
    wq, scales, biases = q.w_q, q.scales, q.biases
    if Np != N:
        wq = jnp.zeros((Np, wq.shape[1]), wq.dtype).at[:N].set(wq)
        scales = jnp.zeros((Np, scales.shape[1]), scales.dtype).at[:N].set(scales)
        biases = jnp.zeros((Np, biases.shape[1]), biases.dtype).at[:N].set(biases)
    out = pl.pallas_call(
        functools.partial(_e5_kernel, bits=q.bits, group_size=q.group_size,
                          out_dtype=x.dtype),
        grid=(Np // TILE_N,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, K // per_word), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, K // q.group_size), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, K // q.group_size), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=Mp * K * 4 + Np * K * q.bits // 8 + Mp * Np * 4,
            transcendentals=0,
        ),
    )(x_pad, wq, scales, biases)
    return out[:M, :N].reshape(*lead, N)


def _e6_kernel(x_ref, xg_ref, wq_ref, scales_ref, biases_ref, out_ref,
               *, bits: int, group_size: int, out_dtype):
    """E6 = E1 + E3: in-kernel bf16 scale expansion from raw (N, G) scales,
    bias folded out via x group-sums. Per element: shift, and, cast, mul."""
    compute = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:]
    xg = xg_ref[:].astype(compute)  # (Mp, G)
    wq = wq_ref[:]
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    tile_n, kp = wq.shape
    g = scales_ref.shape[1]
    words_per_group = group_size // per_word

    g_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kp), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kp), 1)
    expand = (c_ids // words_per_group == g_ids).astype(compute)
    scale_w = jax.lax.dot(scales_ref[:].astype(compute), expand,
                          preferred_element_type=jnp.float32).astype(compute)

    planes = []
    for i in range(per_word):
        v = (wq >> jnp.uint32(i * bits)) & mask
        planes.append(pltpu.bitcast(v, jnp.int32).astype(compute) * scale_w)
    w_planar = jnp.concatenate(planes, axis=1)
    acc = jax.lax.dot_general(
        x.astype(compute), w_planar,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(
        xg, biases_ref[:].astype(compute),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def quant_matmul_e6(x, q: QuantTensor, tile_n: int = 256):
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    N = q.shape[0]
    per_word = 32 // q.bits
    G = K // q.group_size
    TILE_N = tile_n
    Mp = _round_up(max(M, 8), 8)
    Np = _round_up(N, TILE_N)
    xg = x2.astype(jnp.float32).reshape(M, G, q.group_size).sum(-1)
    x_planar = x2[:, jnp.asarray(_planar_perm(K, per_word))]
    x_pad = jnp.zeros((Mp, K), x2.dtype).at[:M].set(x_planar)
    xg_pad = jnp.zeros((Mp, G), x2.dtype).at[:M].set(xg.astype(x2.dtype))
    wq, scales, biases = q.w_q, q.scales, q.biases
    if Np != N:
        wq = jnp.zeros((Np, wq.shape[1]), wq.dtype).at[:N].set(wq)
        scales = jnp.zeros((Np, scales.shape[1]), scales.dtype).at[:N].set(scales)
        biases = jnp.zeros((Np, biases.shape[1]), biases.dtype).at[:N].set(biases)
    kp = K // per_word
    out = pl.pallas_call(
        functools.partial(_e6_kernel, bits=q.bits, group_size=q.group_size,
                          out_dtype=x.dtype),
        grid=(Np // TILE_N,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=Mp * K * 4 + Np * K * q.bits // 8 + Np * G * 8 + Mp * Np * 4,
            transcendentals=0,
        ),
    )(x_pad, xg_pad, wq, scales, biases)
    return out[:M, :N].reshape(*lead, N)


@functools.lru_cache(maxsize=32)
def _planar_perm_pair(k: int, per_word: int):
    """perm for the e7 pair-plane order: block i holds word-pairs
    (plane i, plane i+per_word/2) interleaved by the 32→16 bitcast:
    position p = i·2Kp + 2c + r ↔ original column c·per_word + i + r·per_word/2."""
    kp = k // per_word
    half = per_word // 2
    p = np.arange(k)
    i = p // (2 * kp)
    w = p % (2 * kp)
    c = w // 2
    r = w % 2
    return np.asarray(c * per_word + i + r * half, np.int32)


def _e7_kernel(x_ref, xg_ref, wqt_ref, scales_ref, biases_ref, out_ref,
               *, bits: int, group_size: int, out_dtype):
    """E7 (PARKED — numerically unsound in bf16): transposed packed weights
    + bf16 bit-trick dequant. The 128-offset amplifies bf16 product
    rounding 8x (products ~128*s instead of ~8*s) and the error does not
    cancel against the bias-fold correction — measured ~11% rel err at
    model shapes (fine in the f32 interpret path). Perf was also within
    noise of E6: all variants sit on the ~330 GB/s single-stream DMA wall
    for the packed-weight fetch. Kept for reference.

    wqt (Kp, TILE_N) u32. Each pair of 4-bit fields (plane i, i+4) is
    masked into the low 4 bits of both 16-bit halves and OR'd with the
    bf16 exponent pattern 0x4300 → bitcast yields EXACT bf16 values
    128+v; the −128·scale is folded into the bias term (xg fold).
    Per element: ~1.5 u32 ops + 1 bf16 mul — no int→float converts.
    """
    compute = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:]
    xg = xg_ref[:].astype(compute)
    wqt = wqt_ref[:]  # (Kp, TILE_N) u32
    kp, tile_n = wqt.shape
    g = scales_ref.shape[1]
    per_word = 32 // bits
    words_per_group = group_size // per_word
    scales = scales_ref[:].astype(compute)
    biases = biases_ref[:].astype(compute)

    p_ids = jax.lax.broadcasted_iota(jnp.int32, (2 * kp, g), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (2 * kp, g), 1)
    expand = (p_ids // (2 * words_per_group) == g_ids).astype(compute)
    scale_slab = jax.lax.dot_general(  # (2Kp, TILE_N)
        expand, scales, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(compute)

    mask32 = jnp.uint32(((1 << bits) - 1) | (((1 << bits) - 1) << 16))
    magic = jnp.uint32(0x43004300)
    bias2 = biases - jnp.asarray(128.0, compute) * scales  # (TILE_N, G)
    acc = jax.lax.dot_general(
        xg, bias2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for i in range(per_word // 2):
        t = ((wqt >> jnp.uint32(bits * i)) & mask32) | magic
        pair = pltpu.bitcast(t, jnp.bfloat16)  # (2Kp, TILE_N): 128+v exact
        w_slab = pair.astype(compute) * scale_slab
        acc = acc + jax.lax.dot_general(
            x[:, i * 2 * kp:(i + 1) * 2 * kp].astype(compute), w_slab,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "tile_n"))
def quant_matmul_e7(x, wqt, scales, biases, bits, group_size, tile_n: int = 256):
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    N = scales.shape[0]
    per_word = 32 // bits
    G = K // group_size
    TILE_N = tile_n
    Mp = _round_up(max(M, 8), 8)
    Np = _round_up(N, TILE_N)
    xg = x2.astype(jnp.float32).reshape(M, G, group_size).sum(-1)
    x_planar = x2[:, jnp.asarray(_planar_perm_pair(K, per_word))]
    x_pad = jnp.zeros((Mp, K), x2.dtype).at[:M].set(x_planar)
    xg_pad = jnp.zeros((Mp, G), x2.dtype).at[:M].set(xg.astype(x2.dtype))
    if Np != N:
        wqt = jnp.zeros((wqt.shape[0], Np), wqt.dtype).at[:, :N].set(wqt)
        scales = jnp.zeros((Np, G), scales.dtype).at[:N].set(scales)
        biases = jnp.zeros((Np, G), biases.dtype).at[:N].set(biases)
    kp = K // per_word
    out = pl.pallas_call(
        functools.partial(_e7_kernel, bits=bits, group_size=group_size,
                          out_dtype=x.dtype),
        grid=(Np // TILE_N,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=Mp * K * 4 + Np * K * bits // 8 + Np * G * 8 + Mp * Np * 4,
            transcendentals=0,
        ),
    )(x_pad, xg_pad, wqt, scales, biases)
    return out[:M, :N].reshape(*lead, N)


def timed_loop(fn, x0, n=ITERS):
    """Scan fn ITERS times with a feedback dependency; returns µs/call.

    Feedback is a single-column broadcast add (no cross-lane reduction —
    a full mean costs ~300 µs/iter on this backend and swamps the matmul).
    Subtracts the empty-body scan baseline measured on the same x.
    """

    def make_loop(f):
        @jax.jit
        def loop(x):
            def body(x, _):
                return f(x), ()
            x, _ = jax.lax.scan(body, x, None, length=n)
            return x
        return loop

    def consume(x):
        # |y| @ ones forces the full matmul to be computed (abs blocks the
        # x@(W@ones) algebraic rewrite that let XLA DCE a sliced feedback)
        y = fn(x)
        ones = jnp.ones((y.shape[-1], 1), y.dtype)
        return (x + (jnp.abs(y) @ ones) * jnp.asarray(1e-9, x.dtype)).astype(x.dtype)

    loop = make_loop(consume)
    base = make_loop(lambda x: (x + x[..., :1] * 1e-6).astype(x.dtype))

    def best_of(l):
        # np.asarray fetch = the only true sync on the axon relay backend
        # (block_until_ready acks at dispatch, not completion)
        np.asarray(l(x0)[:1, :1])  # compile + warm
        b = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(l(x0)[:1, :1])
            b = min(b, time.perf_counter() - t0)
        return b

    return (best_of(loop) - best_of(base)) / n * 1e6


def main():
    rng = np.random.default_rng(0)
    shapes = [  # (K, N, label) — large-v3 decode-step matmuls
        (1280, 3840, "qkv-fused"),
        (1280, 1280, "o-proj"),
        (1280, 5120, "fc1"),
        (5120, 1280, "fc2"),
        (1280, 51968, "logits"),
    ]
    print(f"# batch={BATCH} iters={ITERS} backend={jax.default_backend()}")
    for K, N, label in shapes:
        w = rng.standard_normal((N, K)).astype(np.float32) * 0.02
        w_q, scales, biases = quantize(w, BITS, GROUP)
        q = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales),
                        jnp.asarray(biases), BITS, GROUP)
        w_bf = jnp.asarray(w.T, jnp.bfloat16)  # (K, N)
        x0 = jnp.asarray(rng.standard_normal((BATCH, K)), jnp.bfloat16)

        us_dense = timed_loop(lambda x: x @ w_bf, x0)
        sw, bw = make_scale_words(q)
        q_str = repack_strided(q)
        # correctness: every variant vs the current kernel's output
        x_chk = jnp.asarray(rng.standard_normal((BATCH, K)), jnp.bfloat16)
        ref = np.asarray(quant_matmul_pallas(x_chk, q), np.float32)
        wqt = jnp.asarray(np.ascontiguousarray(np.asarray(q.w_q).T))
        variants = {
            "e6-t256": lambda x: quant_matmul_e6(x, q, 256),
            "e6-t512": lambda x: quant_matmul_e6(x, q, 512),
            "e7-t256": lambda x: quant_matmul_e7(
                x, wqt, q.scales, q.biases, BITS, GROUP, 256),
            "e7-t512": lambda x: quant_matmul_e7(
                x, wqt, q.scales, q.biases, BITS, GROUP, 512),
        }
        for name, fn in variants.items():
            got = np.asarray(fn(x_chk), np.float32)
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            if err > 2e-2:
                print(f"  !! {label}/{name}: rel err {err:.3g}")
        line = [f"{label:>10} K={K:<5} N={N:<6} dense={us_dense:7.1f}us"]
        for name, fn in variants.items():
            try:
                us = timed_loop(fn, x0)
                line.append(f"{name}={us:7.1f}us ({us / us_dense:4.2f}x)")
            except Exception as e:  # keep sweeping other variants
                line.append(f"{name}=FAIL({type(e).__name__})")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
