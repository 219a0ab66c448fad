"""Qwen decode throughput on the local accelerator (tokens/sec/chip).

Measures the jitted incremental decode loop (scan of single-token
decode_step calls over a resident KV cache) plus prefill throughput for a
random-weight model — RTF-style timing only depends on shapes, matching
bench.py's approach. Knobs: QB_MODEL (qwen2.5-7b | qwen2.5-14b | ... from
models/qwen.py QWEN_CONFIGS), QB_BATCH, QB_QUANT (0|4|8), QB_STEPS,
QB_PROMPT, QB_MAXLEN.

Reference workload: the daemon serves mlx-community 4-bit Qwen checkpoints
(SURVEY.md §2.1/§2.2, reference daemon/chat.py:142-147).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from whisper_mlx_tpu.models import qwen

    model = os.environ.get("QB_MODEL", "qwen2.5-7b")
    batch = int(os.environ.get("QB_BATCH", "1"))
    quant = int(os.environ.get("QB_QUANT", "4"))
    steps = int(os.environ.get("QB_STEPS", "128"))
    prompt = int(os.environ.get("QB_PROMPT", "128"))
    max_len = int(os.environ.get("QB_MAXLEN", "1024"))
    reps = int(os.environ.get("QB_REPS", "3"))

    config = dataclasses.replace(
        qwen.QWEN_CONFIGS[model], dtype=jnp.bfloat16,
        flash_attention=os.environ.get("QB_FLASH", "1") == "1",
        kv_bits=int(os.environ.get("QB_KV", "0")),
    )

    def zeros_params():
        D, I = config.hidden_size, config.intermediate_size
        H, KV, hd = (config.num_attention_heads, config.num_key_value_heads,
                     config.hd)

        def dense(n_in, n_out, bias=False):
            # build quantized weights DIRECTLY when quant is on — a full
            # bf16 zeros tree for 7B+ is 15 GB and OOMs the chip before
            # the quantize walk replaces it
            if quant and n_in % 64 == 0:
                from whisper_mlx_tpu.ops.quant import QuantTensor

                per_word = 32 // quant
                p = {"w": QuantTensor(
                    jnp.zeros((n_out, n_in // per_word), jnp.uint32),
                    jnp.ones((n_out, n_in // 64), jnp.float32),
                    jnp.zeros((n_out, n_in // 64), jnp.float32),
                    quant, 64)}
            else:
                p = {"w": jnp.zeros((n_in, n_out), jnp.bfloat16)}
            if bias:
                p["b"] = jnp.zeros((n_out,), jnp.bfloat16)
            return p

        ab = config.attention_bias
        layers = []
        for _ in range(config.num_hidden_layers):
            blk = {
                "input_ln": jnp.ones(D, jnp.bfloat16),
                "attn": {
                    "q": dense(D, H * hd, ab), "k": dense(D, KV * hd, ab),
                    "v": dense(D, KV * hd, ab), "o": dense(H * hd, D),
                },
                "post_ln": jnp.ones(D, jnp.bfloat16),
                "mlp": {"gate": dense(D, I), "up": dense(D, I),
                        "down": dense(I, D)},
            }
            if config.qk_norm:
                blk["attn"]["q_norm"] = jnp.ones(hd, jnp.bfloat16)
                blk["attn"]["k_norm"] = jnp.ones(hd, jnp.bfloat16)
            layers.append(blk)
        if quant and D % 64 == 0:
            from whisper_mlx_tpu.ops.quant import QuantTensor

            per_word = 32 // quant
            embed = QuantTensor(
                jnp.zeros((config.vocab_size, D // per_word), jnp.uint32),
                jnp.ones((config.vocab_size, D // 64), jnp.float32),
                jnp.zeros((config.vocab_size, D // 64), jnp.float32),
                quant, 64)
        else:
            embed = jnp.zeros((config.vocab_size, D), jnp.bfloat16)
        p = {
            "embed": embed,
            "layers": layers,
            "final_ln": jnp.ones(D, jnp.bfloat16),
        }
        if not config.tie_word_embeddings:
            p["lm_head"] = dense(D, config.vocab_size)
        return p

    params = zeros_params()
    if quant and os.environ.get("QB_FUSE", "1") == "1":
        from whisper_mlx_tpu.ops.quant import fuse_qwen_projections

        params = fuse_qwen_projections(params)

    # QB_MBT=1 (opt-in): one-time transpose to the multi-buffered DMA-ring
    # resident layout (QuantTensorT leaves; ops/quant_pallas_mb). Honors
    # WTPU_MBT_MAX_K to keep deep-K linears on the production kernel.
    if quant and os.environ.get("QB_MBT", "0") == "1":
        from whisper_mlx_tpu.ops.quant import prepare_mbt_params

        params = prepare_mbt_params(params)

    # QB_A8=1 (opt-in): re-quantize linears to per-channel int8 and run
    # decode matvecs as pure s8×s8 MXU dots (ops/quant_a8.py) — attacks
    # the r3 VPU-dequant wall. WTPU_A8_XLA=1 selects the pure-XLA dot
    # lowering instead of the Pallas DMA-ring kernel.
    if quant and os.environ.get("QB_A8", "0") == "1":
        from whisper_mlx_tpu.ops.quant_a8 import prepare_a8_params

        params = prepare_a8_params(params)

    cache = qwen.init_kv_cache(config, batch, max_len)
    toks = jnp.zeros((batch, prompt), jnp.int32)

    # QB_NATIVE=1 (opt-in): convert packed codes to native-dtype residency
    # inside the jit (XLA grouped-einsum dequant). Measured 4x SLOWER than
    # the default Pallas kernel e2e (11.8 vs 48.9 tok/s at B=1, r3) even
    # though microbenchmarks predicted the opposite; kept for re-measuring
    # on future toolchains.
    native = os.environ.get("QB_NATIVE", "0") == "1"

    def prep(p):
        if native and quant:
            from whisper_mlx_tpu.ops.quant import prepare_native_params

            return prepare_native_params(p, embed_dtype=config.dtype,
                                         decode_rows=batch)
        return p

    @jax.jit
    def prefill(params, toks, cache):
        logits, cache = qwen.decode_step(prep(params), toks, jnp.int32(0),
                                         cache, config)
        return logits, cache

    @jax.jit
    def decode_loop(params, cache, first):
        params = prep(params)

        def body(carry, _):
            tok, pos, cache = carry
            logits, cache = qwen.decode_step(params, tok, pos, cache, config)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return (nxt, pos + 1, cache), ()
        (tok, _, cache), _ = jax.lax.scan(
            body, (first, jnp.int32(prompt), cache), None, length=steps)
        return tok, cache

    # NOTE: on the axon relay backend block_until_ready returns at
    # dispatch-ack, NOT completion — a device->host fetch (np.asarray) is
    # the only true sync (measured: fetch-synced 7B decode is 22 ms/step
    # where block-synced read 0.02 ms/step). Every timing below fetches.
    t0 = time.perf_counter()
    logits, cache1 = prefill(params, toks, cache)
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    np.asarray(decode_loop(params, cache1, first)[0])
    compile_s = time.perf_counter() - t0

    best_p, best_d = np.inf, np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        lg, c1 = prefill(params, toks, cache)
        np.asarray(lg[:, -1, :8])  # fetch forces the full prefill
        best_p = min(best_p, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(decode_loop(params, c1, first)[0])
        best_d = min(best_d, time.perf_counter() - t0)

    tok_s = batch * steps / best_d
    prefill_tok_s = batch * prompt / best_p
    line = {
        "metric": f"qwen_decode_tok_s_{model}",
        "value": round(tok_s, 1),
        "unit": "tok/s/chip",
        "batch": batch, "quant": quant,
        "prefill_tok_s": round(prefill_tok_s, 1),
    }
    for flag, name in (("QB_A8", "a8"), ("QB_MBT", "mbt"),
                       ("QB_NATIVE", "native")):
        if os.environ.get(flag, "0") == "1":
            line[name] = True
    if os.environ.get("QB_A8", "0") == "1" and os.environ.get("WTPU_A8_MAX_N"):
        line["a8_max_n"] = int(os.environ["WTPU_A8_MAX_N"])
    if os.environ.get("WTPU_A8_SKIP"):
        line["a8_skip"] = os.environ["WTPU_A8_SKIP"]
    print(json.dumps(line))
    print(f"# model={model} batch={batch} quant={quant} steps={steps} "
          f"prompt={prompt} decode_best={best_d:.3f}s prefill_best={best_p:.3f}s "
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
