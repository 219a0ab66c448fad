"""Hardware bench: speculative decoding latency vs acceptance rate.

VERDICT r2 item (spec-dec has exactness tests but no perf evidence). With
no pretrained checkpoints offline, acceptance on *real* text is not
measurable — but the two quantities that determine the speedup ARE:

  speedup(k, a) ≈ accepted-per-target-call / per-call-overhead-ratio

so this bench brackets them on hardware:

  upper    draft == target (acceptance = 1.0): measures the best-case
           speedup — i.e. the verify-call overhead of the k+1-position
           prefill vs k+1 sequential steps.
  lower    independent random draft (acceptance ≈ 0): measures the
           worst-case slowdown when every proposal is rejected.
  baseline plain per-token jitted loop on the target (tok/s).

Real-checkpoint acceptance rates (typically 0.6-0.9 for a matched draft)
land between the brackets; the printed model interpolates.

Run: python scripts/bench_speculative.py
Knobs: SPEC_K (default 4), SPEC_TOKENS (96), SPEC_MODEL_DIM (1024/7B-ish
proxy dims by default — random weights, latency is value-independent).
"""

from __future__ import annotations

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

from whisper_mlx_tpu.inference.speculative import speculative_generate  # noqa: E402
from whisper_mlx_tpu.models.qwen import QwenConfig, decode_step, init_kv_cache, init_params  # noqa: E402

K = int(os.environ.get("SPEC_K", "4"))
N_TOK = int(os.environ.get("SPEC_TOKENS", "96"))
DIM = int(os.environ.get("SPEC_MODEL_DIM", "1024"))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def baseline_tok_s(params, cfg, prompt, n_tok):
    cache = init_kv_cache(cfg, 1, 1024)
    toks = jnp.asarray([prompt], jnp.int32)
    logits, cache = decode_step(params, toks, jnp.int32(0), cache, cfg)
    pos = len(prompt)
    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    out = [int(np.asarray(nxt)[0])]  # first generated token (from prefill)
    t0 = time.perf_counter()
    for _ in range(n_tok - 1):
        logits, cache = decode_step(params, nxt[:, None], jnp.int32(pos), cache, cfg)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        out.append(int(np.asarray(nxt)[0]))  # host fetch = true sync
        pos += 1
    return (n_tok - 1) / (time.perf_counter() - t0), out


def main():
    cfg = QwenConfig(
        vocab_size=2048, hidden_size=DIM, intermediate_size=4 * DIM,
        num_hidden_layers=16, num_attention_heads=DIM // 64,
        num_key_value_heads=max(DIM // 256, 1), rope_theta=1e6,
        tie_word_embeddings=True,
    )
    draft_cfg = QwenConfig(
        vocab_size=2048, hidden_size=DIM // 4, intermediate_size=DIM,
        num_hidden_layers=4, num_attention_heads=DIM // 256 or 1,
        num_key_value_heads=1, rope_theta=1e6, tie_word_embeddings=True,
    )
    params = init_params(cfg, seed=0)
    draft_params = init_params(draft_cfg, seed=1)
    prompt = list(range(32, 64))

    # warm-up / compile all three paths
    base_rate, base_out = baseline_tok_s(params, cfg, prompt, 8)
    speculative_generate(params, cfg, params, cfg, prompt, 8, set(), k=K)
    speculative_generate(params, cfg, draft_params, draft_cfg, prompt, 8, set(), k=K)

    base_rate, base_out = baseline_tok_s(params, cfg, prompt, N_TOK)

    t0 = time.perf_counter()
    up_out, up_stats = speculative_generate(
        params, cfg, params, cfg, prompt, N_TOK, set(), k=K)
    upper_rate = len(up_out) / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    lo_out, lo_stats = speculative_generate(
        params, cfg, draft_params, draft_cfg, prompt, N_TOK, set(), k=K)
    lower_rate = len(lo_out) / (time.perf_counter() - t0)

    # Token agreement vs the sequential baseline. On CPU f32 this is exact
    # (asserted in tests/test_speculative.py). On TPU the verify forward is
    # a MULTI-position bf16 matmul whose low bits differ from the
    # single-step decode's — near-tie argmaxes can flip, after which the
    # sequences legitimately diverge (first-divergence semantics). Report
    # the agreement prefix instead of asserting bitwise equality on bf16.
    n_cmp = min(len(up_out), len(base_out))
    agree = next((i for i in range(n_cmp) if up_out[i] != base_out[i]), n_cmp)
    if jax.default_backend() != "tpu":
        assert agree == n_cmp, "exactness broken on an f32 backend"

    line = {
        "metric": "speculative_decode_bracket",
        "k": K,
        "agreement_prefix": agree, "compared": n_cmp,
        "baseline_tok_s": round(base_rate, 2),
        "upper_tok_s": round(upper_rate, 2),
        "upper_speedup": round(upper_rate / base_rate, 3),
        "upper_acceptance": round(up_stats.acceptance_rate, 3),
        "lower_tok_s": round(lower_rate, 2),
        "lower_speedup": round(lower_rate / base_rate, 3),
        "lower_acceptance": round(lo_stats.acceptance_rate, 3),
        "model_dims": DIM,
    }
    print(json.dumps(line))
    print(f"# target {cfg.num_hidden_layers}L/{DIM}d, draft "
          f"{draft_cfg.num_hidden_layers}L/{DIM // 4}d, {N_TOK} tokens",
          file=sys.stderr)


if __name__ == "__main__":
    main()
