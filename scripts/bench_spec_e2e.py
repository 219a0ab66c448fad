"""Speculative whisper decoding END-TO-END: realized acceptance + wall-clock.

VERDICT r3 asked for a demonstrated e2e win (or documented negative), not
just the fixed-work bracket (scripts/bench_spec_whisper.py). Without
pretrained checkpoints the honest high-agreement pair is *self-speculation
via quantization*: the draft is the SAME large-v3 weights re-quantized to
per-channel int8 (ops/quant_a8.py) — at B=1 the decode loop is
weight-stream-bound, so halving the weight bytes (and riding the W8A8 MXU
kernel) makes every draft step genuinely cheaper than a bf16 target step,
while the output stays provably token-identical to bf16 greedy (the
verify logits ARE the target's). Realized acceptance comes straight off
the jitted loop's counters (SpecResult.accepted / proposed).

Prints one JSON line per k with:
  - greedy_tok_ms      bf16 target sequential baseline
  - a8_tok_ms          the draft running alone (direct B=1 latency point)
  - acceptance         realized (accepted / proposed)
  - spec_tok_s / greedy_tok_s and speedup_e2e (wall-clock, same audio)
  - agree_prefix       committed-token agreement vs the greedy baseline

Random weights give DIFFUSE posteriors (near-ties flip under the int8
re-quant + bf16 verify reordering), so the measured acceptance is a hard
floor for real checkpoints — same argument as docs/kv_quant_study.md.

Knobs: SPECW_K ("4,8" sweep), SPECW_LEN (224), SPECW_MODEL (large-v3).
Reference: no speculative mode exists in the reference stack (SURVEY §3.1).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_mlx_tpu.runtime.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/wtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

KS = tuple(int(k) for k in os.environ.get("SPECW_K", "4,8").split(","))
SAMPLE_LEN = int(os.environ.get("SPECW_LEN", "224"))
MODEL = os.environ.get("SPECW_MODEL", "large-v3")
# Draft construction (VERDICT r4 #4 — run the deployment pair for real):
#   a8     — same-depth int8 re-quant of the target (r4 negative: 0.66×)
#   turbo  — turbo-ARCHITECTURE draft (4-layer decoder, shared encoder
#            states), independent random weights: realized wall-clock of
#            the deployment pair; acceptance unrepresentative (random)
#   trunc  — draft = the target's FIRST 4 decoder layers (structurally
#            high-acceptance upper bound for a 4-layer draft)
DRAFT = os.environ.get("SPECW_DRAFT", "a8")


def random_params(config, dtype):
    """Device-side random init with init_params' scaling rules (numpy init
    of a 1.6 B-param tree needs ~6 GB host RAM on this 1-core box)."""
    from bench import _zeros_params

    zeros = _zeros_params(config, dtype)
    key = jax.random.PRNGKey(0)
    counter = [0]

    def fill(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        if leaf.ndim < 2 or "pos_emb" in name and "encoder" in name:
            return leaf  # biases, LN vectors, sinusoid table
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        if "token_emb" in name or "pos_emb" in name:
            scale = 0.02
        else:  # linear (in, out) / conv (w, in, out): 1/sqrt(fan_in)
            fan_in = int(np.prod(leaf.shape[:-1]))
            scale = fan_in ** -0.5
        return (jax.random.normal(k, leaf.shape, jnp.float32) * scale
                ).astype(dtype)

    return jax.tree_util.tree_map_with_path(fill, zeros)


def a8ify_decoder(params):
    """Draft tree: every 2-D decoder linear re-quantized to per-channel
    int8 (A8Tensor); embeddings/LNs/positions shared with the target."""
    from whisper_mlx_tpu.ops.quant_a8 import requant_a8

    def walk(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2:
                new = {"w": requant_a8(jnp.asarray(node["w"], jnp.float32).T)}
                if "b" in node:
                    new["b"] = node["b"]
                return new
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return {"encoder": params["encoder"],
            "decoder": {k: (v if k in ("token_emb", "pos_emb") else walk(v))
                        for k, v in params["decoder"].items()}}


def main() -> None:
    from whisper_mlx_tpu.decoding.filters import FilterConfig, make_suppress_mask
    from whisper_mlx_tpu.decoding.greedy import greedy_decode
    from whisper_mlx_tpu.decoding.speculative import spec_decode
    from whisper_mlx_tpu.decoding.tokenizer import (
        ByteLevelBPE, WhisperTokenizer, bytes_to_unicode)
    from whisper_mlx_tpu.models.whisper import WHISPER_CONFIGS

    config = dataclasses.replace(
        WHISPER_CONFIGS[MODEL], dtype=jnp.bfloat16, flash_attention=True,
        kv_bits=4, self_kv_bits=8)

    byte_vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
    tok = WhisperTokenizer(ByteLevelBPE(byte_vocab, []), n_base=50257,
                           num_languages=100 if config.n_vocab == 51866 else 99)

    params_t = random_params(config, jnp.bfloat16)
    if DRAFT == "a8":
        config_d = config
        params_d = a8ify_decoder(params_t)
    elif DRAFT in ("turbo", "trunc"):
        # the deployment pair's shape: large-v3 target + turbo-architecture
        # draft (4-layer decoder, SHARED encoder — models/whisper.py
        # WHISPER_CONFIGS['large-v3-turbo'] has identical encoder dims)
        config_d = dataclasses.replace(config, n_text_layer=4)
        if DRAFT == "turbo":
            params_d = {"encoder": params_t["encoder"],
                        "decoder": random_params(config_d, jnp.bfloat16)
                        ["decoder"]}
        else:  # trunc: first 4 decoder layers OF THE TARGET
            dec = dict(params_t["decoder"])
            dec["blocks"] = list(dec["blocks"])[: config_d.n_text_layer]
            params_d = {"encoder": params_t["encoder"], "decoder": dec}
    else:
        raise SystemExit(f"unknown SPECW_DRAFT {DRAFT!r}")

    rng = np.random.default_rng(0)
    states = jnp.asarray(rng.standard_normal((1, 1500, config.n_audio_state))
                         .astype(np.float32) * 0.1)

    init = jnp.asarray([[tok.sot, tok.sot + 1, tok.sot + 2]], jnp.int32)
    always_np, begin_np = make_suppress_mask(config.n_vocab, (), ())
    fcfg = FilterConfig(
        eot=tok.eot, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin, sample_begin=init.shape[1],
        max_initial_timestamp_index=None, apply_timestamp_rules=False)

    def fetch(res):
        return np.asarray(res.tokens)  # device→host sync (block lies)

    def timed_best(fn, reps=3):
        res = fn()
        fetch(res)  # compile + warm
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            res = fn()
            fetch(res)
            best = min(best, time.perf_counter() - t0)
        return res, best

    def run_greedy(p, cfg=config):
        return greedy_decode(
            p, states, init, jnp.asarray(always_np),
            jnp.asarray(begin_np), jnp.float32(0.0), jax.random.PRNGKey(0),
            cfg, fcfg, SAMPLE_LEN, 0, tok.no_speech)

    res_g, t_greedy = timed_best(lambda: run_greedy(params_t))
    toks_g = np.asarray(res_g.tokens)[0]
    len_g = int(np.asarray(res_g.lengths)[0])
    t_tok = t_greedy / SAMPLE_LEN

    res_a8, t_a8 = timed_best(lambda: run_greedy(params_d, config_d))
    t_tok_a8 = t_a8 / SAMPLE_LEN

    for k in KS:
        def run_spec(k=k):
            return spec_decode(
                params_t, params_d, states, states, init,
                jnp.asarray(always_np), jnp.asarray(begin_np),
                config_t=config, config_d=config_d, filter_cfg=fcfg,
                sample_len=SAMPLE_LEN, sot_index=0,
                no_speech_token=tok.no_speech, k=k)

        res_s, t_spec = timed_best(run_spec)
        iters = int(res_s.target_calls)
        accepted = int(res_s.accepted)
        proposed = int(res_s.proposed)
        toks_s = np.asarray(res_s.tokens)[0]
        len_s = int(np.asarray(res_s.lengths)[0])
        n_init = init.shape[1]
        # lengths are ABS (incl. the 3 init tokens); clip to the window
        committed = int(np.clip(len_s - n_init, 1, SAMPLE_LEN))
        decoded_g = int(np.clip(len_g - n_init, 1, SAMPLE_LEN))
        # agreement prefix vs bf16 greedy (bf16 near-ties may flip)
        n_cmp = min(len_g or SAMPLE_LEN, len_s or SAMPLE_LEN)
        agree = int(np.argmin(toks_g[:n_cmp] == toks_s[:n_cmp])
                    if not np.all(toks_g[:n_cmp] == toks_s[:n_cmp])
                    else n_cmp)
        acc = accepted / max(proposed, 1)
        spec_tok_s = committed / t_spec
        greedy_tok_s = decoded_g / t_greedy
        line = {
            "metric": "spec_whisper_e2e",
            "model": MODEL,
            "draft": {"a8": "a8-self", "turbo": "turbo-arch",
                      "trunc": "trunc4-target"}[DRAFT],
            "k": k,
            "sample_len": SAMPLE_LEN,
            "greedy_tok_ms": round(t_tok * 1e3, 3),
            "draft_tok_ms": round(t_tok_a8 * 1e3, 3),
            "acceptance": round(acc, 4),
            "iters": iters, "accepted": accepted, "proposed": proposed,
            "committed": committed,
            "spec_tok_s": round(spec_tok_s, 1),
            "greedy_tok_s": round(greedy_tok_s, 1),
            "speedup_e2e": round(spec_tok_s / greedy_tok_s, 3),
            "agree_prefix": agree, "cmp_len": n_cmp,
            "unit": "tok/s wall-clock vs bf16 greedy",
        }
        print(json.dumps(line), flush=True)
        if jax.default_backend() == "tpu":
            try:
                with open(os.path.join(os.path.dirname(__file__), "..",
                                       "bench_history.jsonl"), "a") as f:
                    f.write(json.dumps(line) + "\n")
            except OSError:
                pass


if __name__ == "__main__":
    main()
