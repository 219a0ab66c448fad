"""In-loop per-matmul timing at qwen decode shapes (M=1): prod vs mbt vs dense.

Per-op dispatch on this box has a ~400 µs floor, so each variant runs
inside ONE jitted lax.scan with a feedback dependency (the pattern from
scripts/bench_quant_kernel.py) — the number is device-side per-call time.
This separates the two candidate walls for LLM B=1 decode (qwen2.5-7b,
52.2 tok/s = 19.2 ms/step): per-kernel overhead vs DMA rate.

Env: QB_ITERS (default 50).
Reference workload: mlx-lm 4-bit quantized_matmul (SURVEY.md §2.3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_mlx_tpu.runtime.platform import ensure_platform

ensure_platform()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from whisper_mlx_tpu.ops.quant import QuantTensor, quantize  # noqa: E402
from whisper_mlx_tpu.ops.quant_pallas import quant_matmul_pallas  # noqa: E402
from whisper_mlx_tpu.ops.quant_pallas_mb import (  # noqa: E402
    quant_matmul_mbt, transpose_quant)

ITERS = int(os.environ.get("QB_ITERS", "50"))
BITS = 4
GROUP = 64


def timed_loop(fn, x0, n=ITERS):
    """Scan fn n times with feedback; µs/call net of the empty-scan base."""

    def make_loop(f):
        @jax.jit
        def loop(x):
            def body(x, _):
                return f(x), ()
            x, _ = jax.lax.scan(body, x, None, length=n)
            return x
        return loop

    def consume(x):
        y = fn(x)
        ones = jnp.ones((y.shape[-1], 1), y.dtype)
        return (x + (jnp.abs(y) @ ones) * jnp.asarray(1e-9, x.dtype)).astype(x.dtype)

    loop = make_loop(consume)
    base = make_loop(lambda x: (x + x[..., :1] * 1e-6).astype(x.dtype))

    def best_of(l):
        np.asarray(l(x0)[:1, :1])  # compile + warm; fetch = true sync
        b = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(l(x0)[:1, :1])
            b = min(b, time.perf_counter() - t0)
        return b

    return (best_of(loop) - best_of(base)) / n * 1e6


def main():
    rng = np.random.default_rng(0)
    if os.environ.get("QB_SET", "qwen") == "whisper":
        shapes = [  # large-v3 decoder matmuls (M = few-row beam/best_of)
            (1280, 3840, "qkv"),
            (1280, 1280, "o"),
            (1280, 5120, "fc1"),
            (5120, 1280, "fc2"),
        ]
    else:
        shapes = [  # (K, N, label) — qwen2.5-7b fused decode matmuls
            (3584, 5632, "qkv"),
            (4096, 3584, "o"),
            (3584, 37888, "gate_up"),
            (18944, 3584, "down"),
        ]
        if os.environ.get("QB_HEAD", "0") == "1":
            # vocab head — NOT in the per-layer total (once per step, not
            # per layer); QB_SHAPES=head to isolate it
            shapes.append((3584, 152064, "head"))
    only = os.environ.get("QB_SHAPES", "")
    if only:
        keep = set(only.split(","))
        shapes = [s for s in shapes if s[2] in keep]
    print(f"# M=1 iters={ITERS} backend={jax.default_backend()}")
    totals: dict[str, float] = {}
    for K, N, label in shapes:
        w = rng.standard_normal((N, K)).astype(np.float32) * 0.02
        w_q, scales, biases = quantize(w, BITS, GROUP)
        q = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales),
                        jnp.asarray(biases), BITS, GROUP)
        qt = transpose_quant(q)
        w_bf = jnp.asarray(w.T, jnp.bfloat16)  # (K, N)
        x0 = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
        stream_mb = N * K * BITS / 8 / 1e6  # packed-code bytes

        from whisper_mlx_tpu.ops.quant import (NativeQuantTensor,
                                               native_group_matmul, unpack)

        # u8 codes (s4 can't cross the jit boundary on this backend);
        # matches the promote_resident_native per-step serving path
        nq = NativeQuantTensor(
            jax.jit(lambda w: unpack(w, 4, xp=jnp).astype(jnp.uint8))(q.w_q),
            q.scales, q.biases, 4, 64)
        from whisper_mlx_tpu.ops.quant_a8 import a8_matmul, requant_a8

        a8t = requant_a8(jnp.asarray(w, jnp.float32))  # (N, K) fp
        variants = {
            "dense": lambda x: x @ w_bf,
            "prod": lambda x: quant_matmul_pallas(x, q),
            "mbt": lambda x: quant_matmul_mbt(x, qt),
            "native": lambda x: native_group_matmul(x, nq),
            # W8A8 MXU path (2× the packed bytes; eff uses that stream)
            "a8": lambda x: a8_matmul(x, a8t),
        }
        vfilter = os.environ.get("QB_VARIANTS", "")
        if vfilter:
            keep_v = set(vfilter.split(","))
            variants = {k: v for k, v in variants.items() if k in keep_v}
        line = [f"{label:>8} K={K:<5} N={N:<6} {stream_mb:6.1f}MB"]
        for name, fn in variants.items():
            try:
                us = timed_loop(fn, x0)
                eff = (stream_mb * (2 if name in ("dense", "a8") else 1)
                       / us * 1e3)
                line.append(f"{name}={us:7.1f}us {eff:5.0f}GB/s")
                if label != "head":  # head is per-step, not per-layer
                    totals[name] = totals.get(name, 0.0) + us
            except Exception as e:
                line.append(f"{name}=FAIL({type(e).__name__})")
        print("  ".join(line), flush=True)
    print("# --- per-layer totals (4 matmuls; 28 layers -> ms/step) ---")
    for name, us in totals.items():
        print(f"#   {name:>6} {us:8.1f} us/layer -> {us * 28 / 1e3:6.2f} ms/step")


if __name__ == "__main__":
    main()
