"""Pallas TPU attention for moderate sequence lengths (whole-Tk in VMEM).

The whisper encoder runs self-attention at Tq=Tk=1500, hd=64. The flash
kernel (ops/flash_attention.py) is built for long context: it streams K/V
block-wise with the online-softmax recurrence over a (B·H, Tq-tiles) grid
— at encoder shapes that is 5,760 small programs per layer whose per-
program overhead dominates (profiled ~0.86 s of a 1.1 s encoder forward
at batch 48 on v5e).

At Tk ≈ 1500 the whole score row fits VMEM, so this kernel drops the
recurrence entirely and amortizes program overhead over ``bh_tile``
(batch·head) pairs per program (~120 programs per layer):

    s   = q · kT        (bf16 MXU dot, f32 accumulate; no in-VMEM
                         transpose — K arrives time-minor (hd, Tk))
    w   = softmax(s)     (f32, full rows)
    out = w · v          (bf16 MXU dot, Tk over sublanes)

Padding masks ride ``valid_len`` (Tk padded to the lane tile outside).
No causal option — LLM prefill keeps the flash kernel; this one serves
the encoder (mask-free) hot path.

Reference behavior: mlx_whisper encoder self-attention (SURVEY.md §2.1).
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


def _dense_attn_kernel(q_ref, kt_ref, v_ref, out_ref, *, bh_tile: int,
                       valid_len: int, fast_softmax: bool = False):
    # compute dtype follows the activations: bf16 serving path rounds the
    # softmax weights to bf16 for the PV dot (the accuracy class of the
    # default-precision TPU einsum); the fp32 oracle path stays fp32.
    compute = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    tq = q_ref.shape[1]
    tk = kt_ref.shape[2]
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    valid = k_idx < valid_len
    fast = fast_softmax and compute == jnp.bfloat16
    if fast:
        # the attention wall is the elementwise softmax over T² scores
        # (encoder ablation: 0.60 s ≈ the VPU elementwise floor at f32,
        # docs/performance.md). bf16 packs 2 lanes/elt for every
        # elementwise op, and the denominator reduction rides the MXU
        # (p @ 1 with f32 accumulation) instead of a lane reduce. The
        # row max is computed in bf16 — softmax is shift-invariant, so
        # an ulp-off max only rescales both numerator and denominator.
        ones = jnp.ones((tk, 1), jnp.bfloat16)
    for j in range(bh_tile):
        q = q_ref[j]  # (Tq_tile, hd) pre-scaled
        kt = kt_ref[j]  # (hd, Tk) pre-scaled
        s = jax.lax.dot_general(
            q, kt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tq_tile, Tk)
        if fast:
            sb = jnp.where(valid, s.astype(jnp.bfloat16),
                           jnp.bfloat16(NEG_INF))
            m = jnp.max(sb, axis=-1, keepdims=True)
            p = jnp.exp(sb - m)  # bf16 exp: 2 lanes/elt
            denom = jax.lax.dot(p, ones,
                                preferred_element_type=jnp.float32)
            w = p * (1.0 / denom).astype(jnp.bfloat16)
        else:
            s = jnp.where(valid, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(compute)
        out_ref[j] = jax.lax.dot_general(
            w, v_ref[j].astype(compute),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh_tile", "tq_tile",
                                              "fast_softmax", "interpret"))
def dense_attention(
    q: jnp.ndarray,  # (B, H, Tq, hd) — pre-scaled by hd**-0.25
    k: jnp.ndarray,  # (B, H, Tk, hd) — pre-scaled
    v: jnp.ndarray,  # (B, H, Tk, hd)
    bh_tile: int = 4,
    tq_tile: int = 512,
    fast_softmax: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full (non-causal) attention with whole-Tk rows in VMEM.

    Tq is additionally tiled so the f32 score block stays inside the 16 MB
    scoped-VMEM budget: (tq_tile, Tkp) f32 ≈ 3 MB at the encoder shapes.
    """
    if fast_softmax is None:
        import os

        fast_softmax = os.environ.get("WTPU_DENSE_SOFTMAX", "f32") == "bf16"
    B, H, Tq, hd = q.shape
    Tk = k.shape[2]
    BH = B * H
    BHp = _round_up(BH, bh_tile)
    tq_tile = min(tq_tile, _round_up(Tq, 8))
    Tqp = _round_up(Tq, tq_tile)
    Tkp = _round_up(Tk, 128)

    qf = q.reshape(BH, Tq, hd)
    ktf = jnp.swapaxes(k, 2, 3).reshape(BH, hd, Tk)
    vf = v.reshape(BH, Tk, hd)
    if Tqp != Tq:
        qf = jnp.pad(qf, ((0, 0), (0, Tqp - Tq), (0, 0)))
    if Tkp != Tk:
        ktf = jnp.pad(ktf, ((0, 0), (0, 0), (0, Tkp - Tk)))
        vf = jnp.pad(vf, ((0, 0), (0, Tkp - Tk), (0, 0)))
    if BHp != BH:
        qf = jnp.pad(qf, ((0, BHp - BH), (0, 0), (0, 0)))
        ktf = jnp.pad(ktf, ((0, BHp - BH), (0, 0), (0, 0)))
        vf = jnp.pad(vf, ((0, BHp - BH), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_dense_attn_kernel, bh_tile=bh_tile, valid_len=Tk,
                          fast_softmax=fast_softmax),
        grid=(BHp // bh_tile, Tqp // tq_tile),
        in_specs=[
            pl.BlockSpec((bh_tile, tq_tile, hd), lambda i, t: (i, t, 0)),
            pl.BlockSpec((bh_tile, hd, Tkp), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((bh_tile, Tkp, hd), lambda i, t: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bh_tile, tq_tile, hd), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((BHp, Tqp, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, ktf, vf)
    return out[:BH, :Tq].reshape(B, H, Tq, hd)
