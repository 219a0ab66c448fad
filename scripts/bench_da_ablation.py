"""Ablation: where does the decode-attention kernel spend time?

Per-program stages at the cross shape (B=24, H=20, Tk=1536, hd=64, bh=16):
  dma   — load K/V int8 blocks, consume one row (no cast, no math)
  cast  — + full int8→bf16 casts of both blocks, consume via max
  dots  — + the two batched MXU dots (no softmax)
  full  — complete kernel (softmax + scale folds)
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

B, H, HD, TK = 24, 20, 64, 1536
BH_TILE = int(os.environ.get("AB_BH", "16"))
ITERS = 200


def make(stage):
    # BOTH K and V stored (bh, hd, Tk): minor dim Tk streams contiguous
    def kernel(q_ref, kt_ref, vt_ref, out_ref):
        q = q_ref[:]  # (bh, 1, hd) bf16
        if stage == "dma":
            out_ref[:] = q + kt_ref[:, 0:1, 0:1].astype(jnp.bfloat16) \
                + vt_ref[:, 0:1, 0:1].astype(jnp.bfloat16)
            return
        if stage == "dmak":
            out_ref[:] = q + kt_ref[:, 0:1, 0:1].astype(jnp.bfloat16)
            return
        kt = kt_ref[:].astype(jnp.bfloat16)  # (bh, hd, tk)
        vt = vt_ref[:].astype(jnp.bfloat16)  # (bh, hd, tk)
        if stage == "cast":
            out_ref[:] = q + jnp.max(kt, axis=2)[:, None, :] \
                + jnp.max(vt, axis=2)[:, None, :]
            return
        s = jax.lax.dot_general(
            q, kt, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bh, 1, tk)
        if stage == "dots":
            w = (s * 1e-4).astype(jnp.bfloat16)
        else:  # full
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            w, vt, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("stage",))
def run(q, kt, v, stage):
    BHt = B * H
    return pl.pallas_call(
        make(stage),
        grid=(BHt // BH_TILE,),
        in_specs=[
            pl.BlockSpec((BH_TILE, 1, HD), lambda i: (i, 0, 0)),
            pl.BlockSpec((BH_TILE, HD, TK), lambda i: (i, 0, 0)),
            pl.BlockSpec((BH_TILE, HD, TK), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BH_TILE, 1, HD), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BHt, 1, HD), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(q, kt, v)


def timed(stage, q0, kt, v):
    @jax.jit
    def loop(q):
        def body(q, _):
            y = run(q, kt, v, stage)
            return (q + y * jnp.asarray(1e-9, q.dtype)).astype(q.dtype), ()
        q, _ = jax.lax.scan(body, q, None, length=ITERS)
        return q
    loop(q0).block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        loop(q0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e6


def main():
    rng = np.random.default_rng(0)
    kt = jnp.asarray(rng.integers(-127, 128, (B * H, HD, TK)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (B * H, HD, TK)), jnp.int8)
    q0 = jnp.asarray(rng.standard_normal((B * H, 1, HD)) * 0.1, jnp.bfloat16)
    gb = (B * H * TK * HD * 2) / 1e9
    print(f"# bh_tile={BH_TILE} {gb*1e3:.0f}MB/step backend={jax.default_backend()}")
    for stage in ("dmak", "dma", "cast", "dots", "full"):
        us = timed(stage, q0, kt, v)
        print(f"{stage:>5}: {us:7.1f}us  ({gb / (us / 1e6):.0f}GB/s)", flush=True)


if __name__ == "__main__":
    main()
