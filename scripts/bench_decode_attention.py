"""Microbenchmark: Pallas decode attention vs XLA einsum over int8 KV.

Shapes are the large-v3 decode-step attention calls at the default batch:
cross (Tk=1500→1536 padded, no mask) and self (Tk=448→512, causal). Keys
are cached transposed (time-minor) per ops/decode_attention.py. Same
scan-amortized harness as scripts/bench_quant_kernel.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from whisper_mlx_tpu.ops.kv_quant import quantize_kv
from whisper_mlx_tpu.ops.decode_attention import decode_attention_int8

ITERS = int(os.environ.get("DB_ITERS", "200"))
B = int(os.environ.get("DB_BATCH", "24"))
H, HD = 20, 64


def timed_loop(fn, q0, n=ITERS):
    @jax.jit
    def loop(q):
        def body(q, _):
            y = fn(q)
            ones = jnp.ones((y.shape[-1], 1), jnp.float32)
            fb = jnp.abs(y.astype(jnp.float32)) @ ones  # (B,H,Tq,1)
            return (q + fb.astype(q.dtype) * jnp.asarray(1e-9, q.dtype)), ()
        q, _ = jax.lax.scan(body, q, None, length=n)
        return q

    # np.asarray fetch = the only true sync on the axon relay backend
    np.asarray(loop(q0)[:1, :1, :1, :1])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(q0)[:1, :1, :1, :1])
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e6


def _batched_kernel(pos_ref, q_ref, kt_ref, ks_ref, v_ref, vs_ref, out_ref,
                    *, valid_len: int, causal: bool):
    """Variant: ONE batched MXU dot over all bh pairs (no per-head loop)."""
    bh, tq, _ = q_ref.shape
    tk = kt_ref.shape[2]
    pos = pos_ref[0]
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (bh, tq, tk), 2)
    valid = k_idx < valid_len
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (bh, tq, tk), 1) + pos
        valid = valid & (k_idx <= q_idx)

    q = q_ref[:]  # (bh, tq, hd) bf16
    kt = kt_ref[:].astype(jnp.bfloat16)  # (bh, hd, tk)
    v = v_ref[:].astype(jnp.bfloat16)  # (bh, tk, hd)
    s = jax.lax.dot_general(
        q, kt, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bh, tq, tk)
    s = s * ks_ref[:].astype(jnp.float32)[:, None, :]
    s = jnp.where(valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    w = (w * vs_ref[:].astype(jnp.float32)[:, None, :]).astype(jnp.bfloat16)
    out_ref[:] = jax.lax.dot_general(
        w, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


import functools as _ft
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@_ft.partial(jax.jit, static_argnames=("causal", "valid_len", "bh_tile"))
def batched_attention(q, k8t, ks, v8, vs, pos=0, causal=False,
                      valid_len=None, bh_tile=16):
    B, H, Tq, hd = q.shape
    Tk = k8t.shape[3]
    if valid_len is None:
        valid_len = Tk
    BH = B * H
    qf = q.astype(jnp.bfloat16).reshape(BH, Tq, hd)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    out = pl.pallas_call(
        _ft.partial(_batched_kernel, valid_len=valid_len, causal=causal),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH // bh_tile,),
            in_specs=[
                pl.BlockSpec((bh_tile, Tq, hd), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((bh_tile, hd, Tk), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((bh_tile, Tk), lambda i, *_: (i, 0)),
                pl.BlockSpec((bh_tile, Tk, hd), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((bh_tile, Tk), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((bh_tile, Tq, hd), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, Tq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(pos_arr, qf, k8t.reshape(BH, hd, Tk), ks.reshape(BH, Tk),
      v8.reshape(BH, Tk, hd), vs.reshape(BH, Tk))
    return out.reshape(B, H, Tq, hd)


def xla_attention(q, k8t, ks, v8t, vs, mask):
    scores = jnp.einsum("bhqd,bhdk->bhqk", q.astype(jnp.float32),
                        k8t.astype(jnp.float32))
    scores = scores * ks[..., 0][:, :, None, :] + mask
    w = jax.nn.softmax(scores, axis=-1)
    w = w * vs[..., 0][:, :, None, :]
    return jnp.einsum("bhqk,bhdk->bhqd", w, v8t.astype(jnp.float32)).astype(q.dtype)


def main():
    rng = np.random.default_rng(0)
    print(f"# B={B} H={H} hd={HD} iters={ITERS} backend={jax.default_backend()}")
    for label, tk_real, causal, pos in [("cross", 1500, False, 0),
                                        ("self", 448, True, 200)]:
        tk = -(-tk_real // 128) * 128
        k = jnp.asarray(rng.standard_normal((B, H, tk, HD)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, tk, HD)), jnp.float32)
        k8, ks = quantize_kv(k)
        v8, vs = quantize_kv(v)
        k8t = jnp.swapaxes(k8, 2, 3)
        v8t = jnp.swapaxes(v8, 2, 3)
        q0 = jnp.asarray(rng.standard_normal((B, H, 1, HD)) * 0.2, jnp.bfloat16)
        ki = np.arange(tk)[None, :]
        if causal:
            qi = np.arange(1)[:, None] + pos
            mask = jnp.asarray(np.where(ki <= qi, 0.0, -np.inf), jnp.float32)
        else:
            mask = jnp.asarray(np.where(ki < tk_real, 0.0, -np.inf),
                               jnp.float32)[None]

        gb = (B * H * tk * HD * 2 + B * H * tk * 8) / 1e9  # int8 K+V + scales
        us_xla = timed_loop(lambda q: xla_attention(q, k8t, ks, v8t, vs, mask), q0)
        line = [f"{label:>6} Tk={tk:<5} {gb*1e3:.0f}MB  "
                f"xla={us_xla:7.1f}us ({gb / (us_xla / 1e6):.0f}GB/s)"]
        for name, fn in [
            ("dma8", lambda q: decode_attention_int8(
                q, k8t, ks, v8t, vs, pos=pos, causal=causal,
                valid_len=tk_real, bh_tile=8)),
            ("dma16", lambda q: decode_attention_int8(
                q, k8t, ks, v8t, vs, pos=pos, causal=causal,
                valid_len=tk_real, bh_tile=16)),
            ("dma32", lambda q: decode_attention_int8(
                q, k8t, ks, v8t, vs, pos=pos, causal=causal,
                valid_len=tk_real, bh_tile=32)),
        ]:
            try:
                us = timed_loop(fn, q0)
                line.append(f"{name}={us:7.1f}us "
                            f"({gb / (us / 1e6):.0f}GB/s, {us / us_xla:4.2f}x)")
            except Exception as e:
                line.append(f"{name}=FAIL({type(e).__name__}: {str(e)[:90]})")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
