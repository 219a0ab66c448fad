"""int8 cross-attention KV cache: quantization + exact-fold attention.

Profiling shows whisper's decode loop is bound by CROSS-attention K/V
traffic: every step re-reads (layers × 2 × heads × 1500 × hd) from HBM —
~4 GB/step at batch 8 bf16, dwarfing the weights. Because cross K/V are
computed ONCE per window and then read 224×, quantizing them to int8 halves
the dominant traffic AND the cache footprint (→ 2× window batch capacity).

The dequantization folds exactly into the attention algebra with
per-(head, position) scales — no dequantized K/V are ever materialized:

    scores_t = (q · k8_t) * sk_t          (scale folds into the score)
    w        = softmax(scores + mask)
    out      = Σ_t (w_t · sv_t) · v8_t    (scale folds into the weight)

So attention over int8 KV is EXACT attention over the dequantized values —
the only error is the int8 rounding of K/V themselves (absmax/127 per
position). Enabled via ``WhisperConfig.kv_bits=8`` for the cross cache;
off by default pending WER validation on real checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(b, h, t, d) float → int8 values + per-(b,h,t) fp32 scales."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)  # (b, h, t, 1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def attention_int8_kv(
    q: jnp.ndarray,  # (b, h, tq, d) fp — pre-scaled by head_dim**-0.25
    k8: jnp.ndarray,  # (b, h, tk, d) int8 — quantized pre-scaled keys
    k_scale: jnp.ndarray,  # (b, h, tk, 1) fp32
    v8: jnp.ndarray,  # (b, h, tk, d) int8
    v_scale: jnp.ndarray,  # (b, h, tk, 1) fp32
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact attention over dequantized K/V without materializing them."""
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k8.astype(jnp.float32)
    )
    scores = scores * k_scale[..., 0][:, :, None, :]  # fold key scales
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1)
    w = w * v_scale[..., 0][:, :, None, :]  # fold value scales
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v8.astype(jnp.float32))
    return out.astype(q.dtype)
