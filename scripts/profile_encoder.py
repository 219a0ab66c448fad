"""Per-component profile of the large-v3 encoder (B=56: 1.42 s, ~45% MFU).

Splits the 126-TFLOP encoder forward into ablations, all runtime-arg +
fetch-synced (see profile_decode.py for why):

  full        — encode() as served (dense-attention Pallas kernel)
  xla_attn    — flash_attention=False (XLA SDPA)
  no_attn     — attention replaced by identity (pure matmul/MLP chain):
                the matmul-only MFU ceiling
  conv_only   — the conv stem + positional add alone

Run: python scripts/profile_encoder.py   (knob: BENCH_BATCH)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_mlx_tpu.runtime.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _zeros_params  # noqa: E402
from whisper_mlx_tpu.models.whisper import (  # noqa: E402
    WHISPER_CONFIGS,
    conv1d_nwc,
    encode,
    layer_norm,
    linear,
    mlp,
)

B = int(os.environ.get("BENCH_BATCH", "56"))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

results = []


def timeit(name, fn, fetch, note=""):
    t0 = time.perf_counter()
    np.asarray(fetch(fn()))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fetch(fn()))
        times.append(time.perf_counter() - t0)
    best = min(times)
    results.append({"name": name, "seconds": round(best, 4), "note": note})
    print(f"# {name:10s} {best:8.4f}s (compile {compile_s:5.1f}s) {note}",
          file=sys.stderr, flush=True)
    return best


def main():
    cfg = dataclasses.replace(WHISPER_CONFIGS["large-v3"], dtype=jnp.bfloat16,
                              flash_attention=True)
    cfg_xla = dataclasses.replace(cfg, flash_attention=False)
    params = _zeros_params(cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 3000, cfg.n_mels)).astype(np.float32) * 0.3)

    timeit("full", lambda: encode(params, mel, cfg), lambda s: s[0, 0, :1],
           note="dense-attention kernel (served)")
    timeit("xla_attn", lambda: encode(params, mel, cfg_xla), lambda s: s[0, 0, :1],
           note="XLA SDPA")

    @jax.jit
    def no_attn(params, mel):
        p = params["encoder"]
        x = mel.astype(cfg.dtype)
        x = jax.nn.gelu(conv1d_nwc(x, p["conv1"], stride=1), approximate=False)
        x = jax.nn.gelu(conv1d_nwc(x, p["conv2"], stride=2), approximate=False)
        x = x + p["pos_emb"].astype(x.dtype)
        for blk in p["blocks"]:
            h = layer_norm(x, blk["attn_ln"])
            # q/k/v/o projections kept (matmul cost), attention math removed
            qkv = linear(h, blk["attn"]["q"]) + linear(h, blk["attn"]["k"]) \
                + linear(h, blk["attn"]["v"])
            x = x + linear(qkv, blk["attn"]["o"])
            x = x + mlp(layer_norm(x, blk["mlp_ln"]), blk["mlp"])
        return layer_norm(x, p["ln_post"])

    timeit("no_attn", lambda: no_attn(params, mel), lambda s: s[0, 0, :1],
           note="projections+MLP only (matmul MFU ceiling)")

    @jax.jit
    def conv_only(params, mel):
        p = params["encoder"]
        x = mel.astype(cfg.dtype)
        x = jax.nn.gelu(conv1d_nwc(x, p["conv1"], stride=1), approximate=False)
        x = jax.nn.gelu(conv1d_nwc(x, p["conv2"], stride=2), approximate=False)
        return x + p["pos_emb"].astype(x.dtype)

    timeit("conv_only", lambda: conv_only(params, mel), lambda s: s[0, 0, :1])

    print(json.dumps({"encoder_profile": results, "batch": B}))


if __name__ == "__main__":
    main()
