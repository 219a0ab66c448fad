"""Pallas TPU flash attention (online-softmax, never materializes T×T).

The XLA attention in models/whisper.py materializes (B, H, T, T) scores —
1.4 GB transient per encoder layer for large-v3 at batch 8. This kernel
streams K/V blocks with the online-softmax recurrence so VMEM holds only
(TILE_Q, TILE_K) tiles; it is the encoder hot-path kernel and the LLM
prefill kernel (causal mask option).

Scaling matches the model: q and k are each pre-scaled by head_dim**-0.25
by the caller (whisper convention), so the kernel applies no extra scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, *, tile_k: int, seq_k_pad: int,
                  seq_k_real: int, causal: bool):
    q = q_ref[:].astype(jnp.float32)  # (TILE_Q, hd)
    tile_q, hd = q.shape
    num_kb = seq_k_pad // tile_k
    q_block = pl.program_id(1)  # read outside fori_loop (interpret-mode safe)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(kb * tile_k, tile_k), :].astype(jnp.float32)  # (TILE_K, hd)
        v = v_ref[pl.ds(kb * tile_k, tile_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE_Q, TILE_K)
        k_pos = kb * tile_k + jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_k), 1)
        valid = k_pos < seq_k_real
        if causal:
            q_pos = q_block * tile_q + jax.lax.broadcasted_iota(
                jnp.int32, (tile_q, tile_k), 0
            )
            valid = valid & (k_pos <= q_pos)
        s = jnp.where(valid, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (TILE_Q, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (TILE_Q, TILE_K)
        alpha = jnp.exp(m_prev - m_new)  # (TILE_Q, 1)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((tile_q, hd), jnp.float32)
    m0 = jnp.full((tile_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tile_q, 1), jnp.float32)
    acc, _m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    out_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("causal", "tile_q", "tile_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,  # (B, H, Tq, hd) — pre-scaled
    k: jnp.ndarray,  # (B, H, Tk, hd) — pre-scaled
    v: jnp.ndarray,  # (B, H, Tk, hd)
    causal: bool = False,
    tile_q: int = 256,
    tile_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, Tq, hd = q.shape
    Tk = k.shape[2]
    tile_q = min(tile_q, _round_up(Tq, 8))
    tile_k = min(tile_k, _round_up(Tk, 128))
    Tqp = _round_up(Tq, tile_q)
    Tkp = _round_up(Tk, tile_k)

    qf = q.reshape(B * H, Tq, hd)
    kf = k.reshape(B * H, Tk, hd)
    vf = v.reshape(B * H, Tk, hd)
    if Tqp != Tq:
        qf = jnp.pad(qf, ((0, 0), (0, Tqp - Tq), (0, 0)))
    if Tkp != Tk:
        kf = jnp.pad(kf, ((0, 0), (0, Tkp - Tk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, Tkp - Tk), (0, 0)))

    grid = (B * H, Tqp // tile_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, tile_k=tile_k, seq_k_pad=Tkp, seq_k_real=Tk,
            causal=causal,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tile_q, hd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tkp, hd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Tkp, hd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tile_q, hd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Tqp, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :Tq].reshape(B, H, Tq, hd)
