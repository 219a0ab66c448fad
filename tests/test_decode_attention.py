"""Parity tests: Pallas decode attention vs the XLA int8-KV reference.

The kernel (ops/decode_attention.py) is the opt-in TPU decode-attention
path (WTPU_DECODE_ATTN_KERNEL=1); these interpret-mode tests pin its
numerics to the einsum path for both the manual-DMA Tq=1 kernel and the
general (prefill) kernel, including Tk padding masks and causal offsets.

Reference behavior: mlx_whisper decoder attention over cached K/V
(SURVEY.md §2.1); XLA path in ops/kv_quant.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from whisper_mlx_tpu.ops.decode_attention import decode_attention_int8
from whisper_mlx_tpu.ops.kv_quant import (
    attention_int8_auto,
    attention_int8_kv,
    quantize_kv,
)


def _mk(rng, b, h, tk_real, tk, hd=64):
    k = np.zeros((b, h, tk, hd), np.float32)
    v = np.zeros((b, h, tk, hd), np.float32)
    k[:, :, :tk_real] = rng.standard_normal((b, h, tk_real, hd))
    v[:, :, :tk_real] = rng.standard_normal((b, h, tk_real, hd))
    k8, ks = quantize_kv(jnp.asarray(k))
    v8, vs = quantize_kv(jnp.asarray(v))
    return jnp.swapaxes(k8, 2, 3), ks, jnp.swapaxes(v8, 2, 3), vs, k8, v8


def _ref(q, k8, ks, v8, vs, tk_real, causal, pos):
    tq = q.shape[2]
    if causal:
        qi = np.arange(tq)[:, None] + pos
        ki = np.arange(tk_real)[None, :]
        mask = jnp.asarray(np.where(ki <= qi, 0.0, -np.inf), jnp.float32)
    else:
        mask = None
    return attention_int8_kv(
        q, k8[:, :, :tk_real], ks[:, :, :tk_real],
        v8[:, :, :tk_real], vs[:, :, :tk_real], mask,
    )


@pytest.mark.parametrize(
    "tq,causal,pos,tk_real,tk",
    [
        (1, False, 0, 333, 384),   # cross-attention, padded Tk
        (1, True, 17, 448, 512),   # self-attention mid-decode
        (1, True, 0, 448, 512),    # first step
        (7, True, 4, 448, 512),    # prefill chunk
        (12, False, 0, 120, 128),  # prefill-sized cross
    ],
)
def test_kernel_matches_xla(tq, causal, pos, tk_real, tk):
    rng = np.random.default_rng(0)
    b, h = 2, 3
    k8t, ks, v8t, vs, k8, v8 = _mk(rng, b, h, tk_real, tk)
    q = jnp.asarray(rng.standard_normal((b, h, tq, 64)) * 0.3, jnp.float32)
    ref = np.asarray(_ref(q, k8, ks, v8, vs, tk_real, causal, pos), np.float32)
    got = np.asarray(
        decode_attention_int8(q, k8t, ks, v8t, vs, pos=pos, causal=causal,
                              valid_len=tk_real, bh_tile=2, interpret=True),
        np.float32,
    )
    # kernel rounds softmax weights to bf16 before the PV dot (same
    # accuracy class as the TPU default-precision einsum)
    tol = 2e-2 * max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got, ref, atol=tol)


def test_bh_padding():
    """B·H not a multiple of bh_tile pads and slices correctly."""
    rng = np.random.default_rng(1)
    b, h, tk = 1, 3, 128  # BH=3, bh_tile=4 → padded
    k8t, ks, v8t, vs, k8, v8 = _mk(rng, b, h, tk, tk)
    q = jnp.asarray(rng.standard_normal((b, h, 1, 64)) * 0.3, jnp.float32)
    ref = np.asarray(_ref(q, k8, ks, v8, vs, tk, False, 0), np.float32)
    got = np.asarray(
        decode_attention_int8(q, k8t, ks, v8t, vs, bh_tile=4, interpret=True),
        np.float32,
    )
    tol = 2e-2 * max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got, ref, atol=tol)


def test_auto_fallback_matches_kernel():
    """attention_int8_auto's XLA fallback (CPU) == kernel (interpret)."""
    rng = np.random.default_rng(2)
    b, h, tk_real, tk = 2, 2, 200, 256
    k8t, ks, v8t, vs, _, _ = _mk(rng, b, h, tk_real, tk)
    q = jnp.asarray(rng.standard_normal((b, h, 1, 64)) * 0.3, jnp.float32)
    auto = np.asarray(
        attention_int8_auto(q, k8t, ks, v8t, vs, pos=0, causal=False,
                            valid_len=tk_real), np.float32)
    kern = np.asarray(
        decode_attention_int8(q, k8t, ks, v8t, vs, valid_len=tk_real,
                              bh_tile=2, interpret=True), np.float32)
    tol = 2e-2 * max(1.0, np.abs(auto).max())
    np.testing.assert_allclose(kern, auto, atol=tol)
