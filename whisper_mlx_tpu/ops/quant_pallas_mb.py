"""Multi-buffered fused dequant-matmul: DEPTH weight-block DMAs in flight.

The production kernel (ops/quant_pallas.py) lets Mosaic's BlockSpec
pipeline fetch weight tiles — one prefetch in flight — and sustains only
~330 GB/s on v5e (scripts/bench_quant_kernel.py), half the ~700 GB/s the
XLA dense matmul reaches. At LLM B=1 the decode step is almost entirely
this weight stream (VERDICT r2 "weak" #2: the single-DMA wall was measured
but never attacked). This variant drives the weight stream BY HAND:

- ``w_q``/``scales``/``biases`` stay in HBM (``memory_space=ANY``);
- the kernel manually issues ``make_async_copy`` for the next ``DEPTH``
  (TILE_N, Kp) weight slabs into a VMEM ring, so several DMA streams are
  in flight at once while the current tile dequantizes + MXU-dots;
- per-tile compute is IDENTICAL to the production kernel (planar
  bit-plane expansion, MXU scale spread, bias fold) — bit-exact results.

Bench: scripts/bench_quant_mb.py sweeps DEPTH × TILE_N against the
production kernel on the real chip. Reference workload: mlx-lm 4-bit
``quantized_matmul`` (SURVEY.md §2.3); this path serves LLM few-row decode
(M ≤ 16) where weights must stay int4-resident (Qwen3-32B: 17.2 GiB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_mlx_tpu.ops.quant import QuantTensor
from whisper_mlx_tpu.ops.quant_pallas import _planar_perm


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mb_kernel(x_ref, xg_ref, wq_hbm, scales_hbm, biases_hbm, out_ref,
               wq_buf, sc_buf, bi_buf, sem, sc_sem,
               *, bits: int, group_size: int, tile_n: int, depth: int,
               n_tiles: int, out_dtype):
    """Single-program kernel; loops N tiles with a DEPTH-deep DMA ring.

    wq_buf: (depth, TILE_N, Kp) VMEM ring; sem: (depth,) DMA semaphores.
    scales/biases ride their own small ring (sc_buf/bi_buf, sc_sem holds
    2*depth semaphores: [0:depth]=scales, [depth:2*depth]=biases).
    """
    compute = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    kp = wq_buf.shape[2]
    g = sc_buf.shape[2]
    words_per_group = group_size // per_word

    def start(t, slot):
        pltpu.make_async_copy(
            wq_hbm.at[pl.ds(t * tile_n, tile_n), :], wq_buf.at[slot],
            sem.at[slot]).start()
        pltpu.make_async_copy(
            scales_hbm.at[pl.ds(t * tile_n, tile_n), :], sc_buf.at[slot],
            sc_sem.at[slot]).start()
        pltpu.make_async_copy(
            biases_hbm.at[pl.ds(t * tile_n, tile_n), :], bi_buf.at[slot],
            sc_sem.at[depth + slot]).start()

    def wait(t, slot):
        pltpu.make_async_copy(
            wq_hbm.at[pl.ds(t * tile_n, tile_n), :], wq_buf.at[slot],
            sem.at[slot]).wait()
        pltpu.make_async_copy(
            scales_hbm.at[pl.ds(t * tile_n, tile_n), :], sc_buf.at[slot],
            sc_sem.at[slot]).wait()
        pltpu.make_async_copy(
            biases_hbm.at[pl.ds(t * tile_n, tile_n), :], bi_buf.at[slot],
            sc_sem.at[depth + slot]).wait()

    # warm the ring (static unroll; n_tiles >= depth enforced by caller)
    for d in range(depth):
        start(d, d)

    # per-word scale-spread selection matrix: loop-invariant, built once
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kp), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kp), 1)
    expand = (c_ids // words_per_group == g_ids).astype(compute)  # (G, Kp)

    x = x_ref[:]
    xg = xg_ref[:]

    def body(t, carry):
        slot = jax.lax.rem(t, depth)
        wait(t, slot)
        wq = wq_buf[slot]  # (TILE_N, Kp)
        scale_w = jax.lax.dot(sc_buf[slot].astype(compute), expand,
                              preferred_element_type=jnp.float32).astype(compute)
        planes = []
        for i in range(per_word):
            v = (wq >> jnp.uint32(i * bits)) & mask
            v = pltpu.bitcast(v, jnp.int32).astype(compute)
            planes.append(v * scale_w)
        w_planar = jnp.concatenate(planes, axis=1)  # (TILE_N, K)
        acc = jax.lax.dot_general(
            x.astype(compute), w_planar,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            xg, bi_buf[slot].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        nxt = t + depth

        @pl.when(nxt < n_tiles)
        def _():
            start(nxt, slot)

        out_ref[:, pl.ds(t * tile_n, tile_n)] = acc.astype(out_dtype)
        return carry

    jax.lax.fori_loop(0, n_tiles, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "depth", "interpret"))
def quant_matmul_mb(x: jnp.ndarray, q: QuantTensor, tile_n: int = 512,
                    depth: int = 4, interpret: bool = False) -> jnp.ndarray:
    """``x @ dequant(q).T`` with a DEPTH-deep manually-DMA'd weight ring.

    Bit-exact vs :func:`quant_matmul_pallas` (same per-tile arithmetic).
    """
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    N = q.shape[0]
    bits, group_size = q.bits, q.group_size
    per_word = 32 // bits
    G = K // group_size

    Np = _round_up(N, tile_n)
    n_tiles = Np // tile_n
    depth = min(depth, n_tiles)
    Mp = _round_up(max(M, 8), 8)

    xg = x2.astype(jnp.float32).reshape(M, G, group_size).sum(-1)
    x_planar = x2[:, jnp.asarray(_planar_perm(K, per_word))]
    x_pad = jnp.zeros((Mp, K), x2.dtype).at[:M].set(x_planar)
    xg_pad = jnp.zeros((Mp, G), jnp.float32).at[:M].set(xg)
    wq, scales, biases = q.w_q, q.scales, q.biases
    if Np != N:
        wq = jnp.zeros((Np, wq.shape[1]), wq.dtype).at[:N].set(wq)
        scales = jnp.zeros((Np, scales.shape[1]), scales.dtype).at[:N].set(scales)
        biases = jnp.zeros((Np, biases.shape[1]), biases.dtype).at[:N].set(biases)

    kp = K // per_word
    out = pl.pallas_call(
        functools.partial(
            _mb_kernel, bits=bits, group_size=group_size, tile_n=tile_n,
            depth=depth, n_tiles=n_tiles, out_dtype=x.dtype,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xg
            pl.BlockSpec(memory_space=pl.ANY),   # wq (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # scales (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # biases (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((depth, tile_n, kp), wq.dtype),
            pltpu.VMEM((depth, tile_n, G), scales.dtype),
            pltpu.VMEM((depth, tile_n, G), biases.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((2 * depth,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_pad, xg_pad, wq, scales, biases)
    return out[:M, :N].reshape(*lead, N)
