"""Pallas TPU decode attention over int8 KV caches (Tq small).

The whisper decode loop is bound by attention KV traffic, not weights: at
batch 24 each step re-reads ~2.9 GB of cross-attention K/V plus ~0.9 GB of
self-attention cache (int8). The XLA einsum path (ops/kv_quant.py
attention_int8_kv) measured ~290 GB/s on v5e — far below HBM speed —
because the batched matvec shapes defeat its fusion heuristics.

Design (converged via scripts/bench_decode_attention.py ablations, following
the canonical TPU paged-decode kernel shape):

- **K and V cached TRANSPOSED** as (B, H, hd, Tk) int8: the minor dim is
  Tk, so every (hd, Tk) slice is a contiguous lane-aligned stream (hd=64 in
  the minor dim forces strided 64-byte transfers — half-tile waste).
  Callers pad Tk to a multiple of 128 at cache *creation* (models/whisper.py
  cross_kv / init_kv_cache) so no per-step padding copies exist;
  ``valid_len`` masks the tail.
- **Manual double-buffered DMA.** BlockSpec grid pipelining issues ONE
  input DMA stream at a time (~333 GB/s measured) — waiting K[i] then V[i]
  serializes the streams. This kernel keeps K/V in HBM (memory_space ANY),
  starts the K and V copies for block i+1 CONCURRENTLY while computing
  block i, and double-buffers both in VMEM scratch (guide: paged attention
  §9–11).
- Per (batch·head) pair, fused in VMEM:

      s   = (q · k8T) * ks         (bf16 MXU dot, f32 accumulate)
      w   = softmax(s + mask)      (f32 — real query rows only; padding
                                    query rows to the sublane tile made
                                    exp() 8× more expensive and dominant)
      out = (w * vs) · v8T          (bf16 MXU dot, rhs-transposed contract)

Numerics match the XLA path's accuracy class: scores accumulate in f32,
softmax in f32, and the probability-weighted sum rounds the weights to
bf16 — the same rounding the default-precision f32 einsum on TPU applies
to its operands (CLAUDE.md: TPU matmuls default to bf16 passes).

Reference behavior: mlx_whisper's decoder attention over cached K/V
(SURVEY.md §2.1 "Decoder"); the int8 cache format is ours (kv_quant.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attend_one(q, kt, vt, ks, vs, valid):
    """One (batch·head) pair: q (Tq, hd) bf16 · kt/vt (hd, Tk) bf16 ·
    ks/vs (Tk,) bf16/f32 · valid (Tq, Tk) bool → (Tq, hd)."""
    s = jax.lax.dot_general(
        q, kt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tq, Tk)
    s = s * ks[None, :]
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    w = (w * vs[None, :]).astype(jnp.bfloat16)
    return jax.lax.dot_general(  # contract Tk (lanes of vt): (Tq, hd)
        w, vt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _decode_dma_kernel(pos_ref, q_ref, ks_ref, vs_ref, kt_hbm, vt_hbm,
                       out_ref, kt_buf, vt_buf, k_sem, v_sem,
                       *, bh_tile: int, hd: int, n_steps: int,
                       valid_len: int, causal: bool):
    """Tq=1 hot path. Blocks: q/out (bh_tile, hd) VMEM · ks/vs
    (bh_tile, Tk) VMEM · kt/vt (BH·hd, Tk) int8 HBM, hand-copied into
    (2, bh_tile·hd, Tk) double buffers with K and V DMAs in flight together.
    """
    i = pl.program_id(0)
    tk = kt_buf.shape[2]
    rows = bh_tile * hd

    def start(block, slot):
        r0 = block * rows
        pltpu.make_async_copy(
            kt_hbm.at[pl.ds(r0, rows), :], kt_buf.at[slot], k_sem.at[slot]
        ).start()
        pltpu.make_async_copy(
            vt_hbm.at[pl.ds(r0, rows), :], vt_buf.at[slot], v_sem.at[slot]
        ).start()

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _first():
        start(i, slot)

    @pl.when(i + 1 < n_steps)
    def _prefetch():
        start(i + 1, jax.lax.rem(i + 1, 2))

    pltpu.make_async_copy(
        kt_hbm.at[pl.ds(i * rows, rows), :], kt_buf.at[slot], k_sem.at[slot]
    ).wait()
    pltpu.make_async_copy(
        vt_hbm.at[pl.ds(i * rows, rows), :], vt_buf.at[slot], v_sem.at[slot]
    ).wait()

    pos = pos_ref[0]
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
    valid = k_idx < valid_len
    if causal:
        valid = valid & (k_idx <= pos)

    for j in range(bh_tile):
        q = q_ref[j : j + 1, :]  # (1, hd) bf16
        kt = kt_buf[slot, j * hd : (j + 1) * hd, :].astype(jnp.bfloat16)
        vt = vt_buf[slot, j * hd : (j + 1) * hd, :].astype(jnp.bfloat16)
        ks = ks_ref[j, :].astype(jnp.float32)
        vs = vs_ref[j, :].astype(jnp.float32)
        out_ref[j : j + 1, :] = _attend_one(q, kt, vt, ks, vs, valid).astype(
            out_ref.dtype
        )


def _decode_attn_kernel(pos_ref, q_ref, kt_ref, ks_ref, vt_ref, vs_ref,
                        out_ref, *, bh_tile: int, hd: int, valid_len: int,
                        causal: bool):
    """General Tq (prefill) path — BlockSpec-pipelined, per-head dots."""
    tq = q_ref.shape[1]
    tk = kt_ref.shape[2]
    pos = pos_ref[0]
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    valid = k_idx < valid_len
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0) + pos
        valid = valid & (k_idx <= q_idx)

    for j in range(bh_tile):
        q = q_ref[j]  # (Tq, hd) bf16
        kt = kt_ref[j].astype(jnp.bfloat16)  # (hd, Tk)
        vt = vt_ref[j].astype(jnp.bfloat16)
        ks = ks_ref[j, :].astype(jnp.float32)
        vs = vs_ref[j, :].astype(jnp.float32)
        out_ref[j] = _attend_one(q, kt, vt, ks, vs, valid).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "valid_len", "bh_tile", "interpret")
)
def decode_attention_int8(
    q: jnp.ndarray,        # (B, H, Tq, hd) — pre-scaled by head_dim**-0.25
    k8t: jnp.ndarray,      # (B, H, hd, Tk) int8 (keys pre-scaled, TRANSPOSED)
    k_scale: jnp.ndarray,  # (B, H, Tk, 1) bf16/f32
    v8t: jnp.ndarray,      # (B, H, hd, Tk) int8 (TRANSPOSED)
    v_scale: jnp.ndarray,  # (B, H, Tk, 1) bf16/f32
    pos: jnp.ndarray | int = 0,  # scalar: first query position (causal only)
    causal: bool = False,
    valid_len: int | None = None,  # real key count (≤ Tk); None → Tk
    bh_tile: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention over an int8 KV cache; exact dequant fold.

    Equivalent to kv_quant.attention_int8_kv with the whisper decode masks:
    causal=False attends keys [0, valid_len) (cross-attention over a
    Tk-padded cache); causal=True additionally masks keys after
    ``pos + q_index`` (self-attention over a preallocated cache).
    """
    B, H, Tq, hd = q.shape
    Tk = k8t.shape[3]
    if valid_len is None:
        valid_len = Tk
    BH = B * H
    BHp = _round_up(BH, bh_tile)

    qf = q.astype(jnp.bfloat16).reshape(BH, Tq, hd)
    ktf = k8t.reshape(BH, hd, Tk)
    vtf = v8t.reshape(BH, hd, Tk)
    ksf = k_scale.reshape(BH, Tk)
    vsf = v_scale.reshape(BH, Tk)
    if BHp != BH:
        qf = jnp.pad(qf, ((0, BHp - BH), (0, 0), (0, 0)))
        ktf = jnp.pad(ktf, ((0, BHp - BH), (0, 0), (0, 0)))
        vtf = jnp.pad(vtf, ((0, BHp - BH), (0, 0), (0, 0)))
        ksf = jnp.pad(ksf, ((0, BHp - BH), (0, 0)))
        vsf = jnp.pad(vsf, ((0, BHp - BH), (0, 0)))

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    n_steps = BHp // bh_tile

    if Tq == 1:  # hot decode step: manual concurrent K/V DMA double-buffer
        out = pl.pallas_call(
            functools.partial(
                _decode_dma_kernel, bh_tile=bh_tile, hd=hd, n_steps=n_steps,
                valid_len=valid_len, causal=causal,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_steps,),
                in_specs=[
                    pl.BlockSpec((bh_tile, hd), lambda i, *_: (i, 0)),
                    pl.BlockSpec((bh_tile, Tk), lambda i, *_: (i, 0)),
                    pl.BlockSpec((bh_tile, Tk), lambda i, *_: (i, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),  # kt (BH·hd, Tk)
                    pl.BlockSpec(memory_space=pl.ANY),  # vt
                ],
                out_specs=pl.BlockSpec((bh_tile, hd), lambda i, *_: (i, 0)),
                scratch_shapes=[
                    pltpu.VMEM((2, bh_tile * hd, Tk), jnp.int8),
                    pltpu.VMEM((2, bh_tile * hd, Tk), jnp.int8),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((BHp, hd), q.dtype),
            interpret=interpret,
        )(pos_arr, qf.reshape(BHp, hd), ksf, vsf,
          ktf.reshape(BHp * hd, Tk), vtf.reshape(BHp * hd, Tk))
        return out[:BH].reshape(B, H, 1, hd)

    out = pl.pallas_call(
        functools.partial(
            _decode_attn_kernel, bh_tile=bh_tile, hd=hd, valid_len=valid_len,
            causal=causal,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((bh_tile, Tq, hd), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((bh_tile, hd, Tk), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((bh_tile, Tk), lambda i, *_: (i, 0)),
                pl.BlockSpec((bh_tile, hd, Tk), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((bh_tile, Tk), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((bh_tile, Tq, hd), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((BHp, Tq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pos_arr, qf, ktf, ksf, vtf, vsf)
    return out[:BH].reshape(B, H, Tq, hd)
