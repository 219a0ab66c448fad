"""Fused Pallas beam self-attention over the lane-interleaved FLAT cache.

The XLA lowering of :func:`whisper_mlx_tpu.ops.kv_quant.attention_int8_beamflat`
materializes the (n, g→8, h, J) f32 score/weight chain in HBM every
step — ~6 multi-pass sweeps over ~20 MB/layer at beam5/N=24, measured
~17 ms/step of the beam loop's 33 ms (scripts/profile_beam.py, r4). This
kernel computes the whole chain per (window, head) grid cell in VMEM:

    s(g,J) = q(g,d) · k(d,J)      one MXU dot, f32 accumulate
    s      = where(mask, s·ks, -inf);  softmax rows; w ·= vs
    out    = w(g,J) · v(d,J)^T    one MXU dot

HBM traffic = the K/V codes once per step (the unavoidable stream) plus
tiny q/out/mask blocks. The ancestry+causal mask arrives PRECOMPUTED
(ops/kv_quant.py _beamflat_mask — built once per step, CSE'd across
layers), so the kernel has no integer div/mod on the hot path.

Read-only consumer: unlike the in-loop cache-permute kernels (which
measured a ~15 ms/step coexistence penalty regardless of lowering —
r4 probes), this kernel only READS the carried cache, the same shape as
ops/decode_attention.py which measured within 9% of XLA e2e in r2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_ref, o_ref):
    # blocks (Mosaic requires the last-two block dims divisible by (8, 128)
    # or EQUAL to the array dims — hence q is pre-transposed to (n, h, g, d)
    # so its trailing (g, d) block covers the whole array dims):
    #   q (1, 1, g, d) · k (1, 1, d, J) · scales (1, 1, 1, J) · m (1, g, J)
    q = q_ref[0, 0].astype(jnp.float32)                # (g, d)
    k = k_ref[0, 0].astype(jnp.float32)                # (d, J)
    s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (g, J)
    s = s * ks_ref[0, 0, 0].astype(jnp.float32)[None, :]
    s = jnp.where(m_ref[0] != 0, s, NEG_INF)
    mx = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    w = w * vs_ref[0, 0, 0].astype(jnp.float32)[None, :]
    v = v_ref[0, 0].astype(jnp.float32)                # (d, J)
    o = jax.lax.dot_general(w, v, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (g, d)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "interpret"))
def beamflat_attention_kernel(
    q: jnp.ndarray,       # (NB, h, 1, d) — pre-scaled queries
    k8f: jnp.ndarray,     # (n, h, d, J) int8 — lane-interleaved flat keys
    ks_f: jnp.ndarray,    # (n, h, J, 1) scales
    v8f: jnp.ndarray,     # (n, h, d, J) int8
    vs_f: jnp.ndarray,    # (n, h, J, 1)
    mask: jnp.ndarray,    # (n, g, J) bool — ancestry & causal, precomputed
    groups: int,
    interpret: bool = False,
) -> jnp.ndarray:
    NB, h, tq, d = q.shape
    g = groups
    n = NB // g
    J = k8f.shape[3]
    # (n, h, g, d): the trailing (g, d) block equals the array dims, which
    # satisfies Mosaic's last-two-dims tiling rule for any g (g=5 is not
    # divisible by 8). The transpose is ~300 KB at beam5/N=24 — negligible.
    q4 = q.reshape(n, g, h, d).transpose(0, 2, 1, 3)
    out = pl.pallas_call(
        _kernel,
        grid=(n, h),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, d, J), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, J), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, d, J), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, J), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, g, J), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, g, d), q.dtype),
        interpret=interpret,
    )(q4, k8f, ks_f.transpose(0, 1, 3, 2), v8f, vs_f.transpose(0, 1, 3, 2),
      mask.astype(jnp.int8))
    return out.transpose(0, 2, 1, 3).reshape(NB, h, tq, d)
