"""Continuous-batching serving throughput on the local accelerator.

Drives the real ContinuousBatchEngine (worker thread, mid-flight admission,
per-step host dispatch — exactly what `--batch-slots` serving runs) with N
concurrent requests on a random-weight 4-bit model and reports aggregate
decode tok/s plus the single-request baseline.

Knobs: BE_MODEL, BE_SLOTS, BE_REQS, BE_PROMPT, BE_TOKENS, BE_MAXLEN.

Reference contrast: the reference serializes all generation behind one
asyncio lock (reference daemon/server.py:273-355) — aggregate == B=1.
"""

from __future__ import annotations

import os
import sys
import time
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _IdTokenizer:
    """Token-id passthrough (no vocab files in this image)."""

    eos_token_id = -2  # never emitted

    def encode(self, s):
        raise NotImplementedError("submit token lists directly")

    def decode(self, ids):
        return " ".join(map(str, ids))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/wtpu_xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from whisper_mlx_tpu.inference.batch_engine import ContinuousBatchEngine
    from whisper_mlx_tpu.models import qwen

    model = os.environ.get("BE_MODEL", "qwen2.5-7b")
    slots = int(os.environ.get("BE_SLOTS", "4"))
    n_reqs = int(os.environ.get("BE_REQS", str(slots)))
    prompt_len = int(os.environ.get("BE_PROMPT", "100"))
    max_tokens = int(os.environ.get("BE_TOKENS", "96"))
    max_len = int(os.environ.get("BE_MAXLEN", "512"))

    config = dataclasses.replace(
        qwen.QWEN_CONFIGS[model], dtype=jnp.bfloat16, flash_attention=False
    )

    # 4-bit zeros params with fused projections (shapes only; RTF-style)
    from whisper_mlx_tpu.ops.quant import QuantTensor, fuse_qwen_projections

    D, I = config.hidden_size, config.intermediate_size
    H, KV, hd = (config.num_attention_heads, config.num_key_value_heads,
                 config.hd)

    def q_of(n_in, n_out):
        return QuantTensor(
            jnp.zeros((n_out, n_in // 8), jnp.uint32),
            jnp.ones((n_out, n_in // 64), jnp.float32),
            jnp.zeros((n_out, n_in // 64), jnp.float32), 4, 64)

    def dense(n_in, n_out, bias=False):
        p = {"w": q_of(n_in, n_out)}
        if bias:
            p["b"] = jnp.zeros((n_out,), jnp.bfloat16)
        return p

    ab = config.attention_bias
    layers = []
    for _i in range(config.num_hidden_layers):
        blk = {
            "input_ln": jnp.ones(D, jnp.bfloat16),
            "attn": {"q": dense(D, H * hd, ab), "k": dense(D, KV * hd, ab),
                     "v": dense(D, KV * hd, ab), "o": dense(H * hd, D)},
            "post_ln": jnp.ones(D, jnp.bfloat16),
            "mlp": {"gate": dense(D, I), "up": dense(D, I), "down": dense(I, D)},
        }
        if config.qk_norm:
            blk["attn"]["q_norm"] = jnp.ones(hd, jnp.bfloat16)
            blk["attn"]["k_norm"] = jnp.ones(hd, jnp.bfloat16)
        layers.append(blk)
    params = {"embed": q_of(D, config.vocab_size), "layers": layers,
              "final_ln": jnp.ones(D, jnp.bfloat16)}
    if not config.tie_word_embeddings:
        params["lm_head"] = dense(D, config.vocab_size)
    params = fuse_qwen_projections(params)

    engine = ContinuousBatchEngine(
        params, config, _IdTokenizer(), slots=slots, max_len=max_len,
        stop_ids={-2},
    )
    prompt = list(range(1, prompt_len + 1))

    # warmup: one request end-to-end (compiles prefill bucket + step)
    t0 = time.perf_counter()
    engine.submit(prompt, max_tokens=8, temperature=0.0).result_text()
    compile_s = time.perf_counter() - t0

    # single-request baseline
    t0 = time.perf_counter()
    engine.submit(prompt, max_tokens=max_tokens, temperature=0.0).result_text()
    single_s = time.perf_counter() - t0
    single_tok_s = max_tokens / single_s

    # concurrent
    t0 = time.perf_counter()
    handles = [engine.submit(prompt, max_tokens=max_tokens, temperature=0.0)
               for _i in range(n_reqs)]
    for h in handles:
        h.result_text()
    concurrent_s = time.perf_counter() - t0
    agg_tok_s = n_reqs * max_tokens / concurrent_s

    engine.close()
    line = {
        "metric": f"batch_engine_agg_tok_s_{model}",
        "value": round(agg_tok_s, 1),
        "unit": "tok/s/chip",
        "slots": slots, "requests": n_reqs,
        "single_tok_s": round(single_tok_s, 1),
        "speedup_vs_serial": round(agg_tok_s / single_tok_s, 2),
    }
    print(json.dumps(line))
    print(f"# model={model} slots={slots} reqs={n_reqs} prompt={prompt_len} "
          f"tokens={max_tokens} single={single_s:.2f}s concurrent={concurrent_s:.2f}s "
          f"compile={compile_s:.1f}s backend={jax.default_backend()}",
          file=sys.stderr)
    try:
        with open(os.path.join(os.path.dirname(__file__), "..",
                               "bench_history.jsonl"), "a") as f:
            f.write(json.dumps(line) + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
