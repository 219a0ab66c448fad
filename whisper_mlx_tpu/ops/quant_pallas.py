"""Pallas TPU kernel: fused dequantize + matmul (weight-only int4/int8).

The decode loop is HBM-bandwidth-bound: every step streams all decoder
weights. MLX wins this on Metal with fused dequant-matmul kernels
(SURVEY.md §2.3); this is the TPU equivalent. Reading packed uint32 weights
moves 8× (int4) less HBM traffic than fp32 — the dequant happens in VMEM
right before the MXU dot, never materializing the fp matrix in HBM.

Mosaic-friendly construction (no minor-dim reshapes, which Mosaic rejects):
the packed word matrix (N, K/per_word) is expanded into ``per_word`` 2-D
bit-planes ``(wq >> i·bits) & mask`` concatenated along lanes — a *planar*
column order. The matching permutation is applied to ``x``'s K axis outside
the kernel (cheap XLA gather), keeping the contraction exact.

Hardware-tuned structure (measured on v5e, scripts/bench_quant_kernel.py):

- **Scale expansion on the MXU at compute precision.** Per-group scales are
  spread to per-word columns by a 0/1 selection matmul built from iotas.
  Selecting then casting equals casting then selecting, so running this dot
  in bf16 is bit-identical to the old fp32-HIGHEST version and ~8× faster.
- **Bias folded out of the per-element path.** Affine dequant obeys
  ``x @ (s·v + b)ᵀ = x @ (s·v)ᵀ + xg @ bᵀ`` where ``xg`` holds per-group
  sums of x (computed once outside, O(M·K)). The kernel's per-element work
  drops to shift/mask/cast/mul — no add — and the bias term becomes one
  tiny (M, G) × (G, TILE_N) MXU dot.
- **Wide N tiles (512) for large N** amortize per-tile overhead; measured
  fastest for the fc1/logits shapes (N ≥ 3840).

Layout: x (M, K) fp · w_q (N, K·bits/32) uint32 (MLX (out,in) layout)
→ out (M, N). Grid tiles N; K streams whole per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_mlx_tpu.ops.quant import QuantTensor


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _quant_matmul_kernel(x_ref, xg_ref, wq_ref, scales_ref, biases_ref, out_ref,
                         *, bits: int, group_size: int, out_dtype):
    """One (M, TILE_N) output tile; x is pre-permuted to planar K order.

    Compute dtype follows the activations: bf16 x → bf16 dequant arithmetic
    (2× VPU throughput) and a bf16×bf16 MXU dot with fp32 accumulation —
    the serving path. fp32 x keeps everything fp32 (exactness oracle path;
    4-bit codes ≤ 15 and fp16-ish scales are exactly representable either
    way, so bf16 costs only the scale/bias rounding ~0.4%).
    """
    compute = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:]  # (M, K) planar
    xg = xg_ref[:]  # (M, G) group sums of x — kept fp32 (tiny buffer); the
    # bias dot below runs fp32 so the fp32 accumulation is never discarded
    wq = wq_ref[:]  # (TILE_N, Kp) uint32, Kp = K/per_word
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    tile_n, kp = wq.shape
    g = scales_ref.shape[1]
    words_per_group = group_size // per_word

    # expand per-group scales to per-word via a 0/1 selection matmul
    # (iota-built) at compute precision — select-then-cast == cast-then-
    # select, so bf16 here is exact relative to the fp32 expansion
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kp), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kp), 1)
    expand = (c_ids // words_per_group == g_ids).astype(compute)  # (G, Kp)
    scale_w = jax.lax.dot(scales_ref[:].astype(compute), expand,
                          preferred_element_type=jnp.float32).astype(compute)

    planes = []
    for i in range(per_word):
        v = (wq >> jnp.uint32(i * bits)) & mask
        v = pltpu.bitcast(v, jnp.int32).astype(compute)  # values < 2^bits
        planes.append(v * scale_w)
    w_planar = jnp.concatenate(planes, axis=1)  # (TILE_N, per_word*Kp = K)

    acc = jax.lax.dot_general(
        x.astype(compute), w_planar,
        dimension_numbers=(((1,), (1,)), ((), ())),  # x @ w.T
        preferred_element_type=jnp.float32,
    )
    acc = acc + jax.lax.dot_general(  # bias term: xg @ biases.T, all fp32
        xg, biases_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc.astype(out_dtype)


@functools.lru_cache(maxsize=32)
def _planar_perm(k: int, per_word: int):
    """perm[q] = original column of planar position q (q = plane*Kp + word).

    Cached as NumPy — caching a jnp array would capture the tracer of
    whichever jit first built it (UnexpectedTracerError downstream).
    """
    import numpy as np

    kp = k // per_word
    q = np.arange(k)
    return np.asarray((q % kp) * per_word + q // kp, np.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_matmul_pallas(x: jnp.ndarray, q: QuantTensor, interpret: bool = False) -> jnp.ndarray:
    """``x @ dequant(q).T`` with fused in-kernel dequantization.

    x: (..., K) → (..., N). M padded to the fp32 sublane tile, N to the
    lane tile; K must be a multiple of group_size (all transformer dims).
    """
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    N = q.shape[0]
    bits, group_size = q.bits, q.group_size
    per_word = 32 // bits
    G = K // group_size

    TILE_N = 512 if N >= 3840 else (256 if N % 256 == 0 else 128)
    Mp = _round_up(max(M, 8), 8)
    Np = _round_up(N, TILE_N)

    # group sums of x for the bias fold (f32 accumulation, one pass over x)
    xg = x2.astype(jnp.float32).reshape(M, G, group_size).sum(-1)
    x_planar = x2[:, jnp.asarray(_planar_perm(K, per_word))]
    x_pad = jnp.zeros((Mp, K), x2.dtype).at[:M].set(x_planar)
    xg_pad = jnp.zeros((Mp, G), jnp.float32).at[:M].set(xg)
    wq, scales, biases = q.w_q, q.scales, q.biases
    if Np != N:
        wq = jnp.zeros((Np, wq.shape[1]), wq.dtype).at[:N].set(wq)
        scales = jnp.zeros((Np, scales.shape[1]), scales.dtype).at[:N].set(scales)
        biases = jnp.zeros((Np, biases.shape[1]), biases.dtype).at[:N].set(biases)

    grid = (Np // TILE_N,)
    out = pl.pallas_call(
        functools.partial(
            _quant_matmul_kernel, bits=bits, group_size=group_size, out_dtype=x.dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, K // per_word), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=Mp * K * 4 + Np * K * bits // 8 + Np * G * 8 + Mp * Np * 4,
            transcendentals=0,
        ),
    )(x_pad, xg_pad, wq, scales, biases)
    return out[:M, :N].reshape(*lead, N)
