"""Offline token-divergence study: fp KV cache vs int8 KV cache.

VERDICT r2 item 8: int8 cross+self KV is the serving default (bench.py,
__graft_entry__), while WER validation needs real checkpoints this image
cannot download. This study bounds the risk offline: decode many synthetic
30 s windows with fp caches vs int8 caches — same weights, same inputs,
same decode config — and measure

- window exact-match rate (identical token sequences),
- first-divergence step distribution,
- first-step logit perturbation (max / mean |Δ| and Δ relative to the
  logit range), which is decode-order-independent evidence.

int8 KV attention is EXACT attention over the dequantized values
(ops/kv_quant.py) — the only error source is the per-position absmax/127
rounding of K/V, so the logit perturbation is small and data-independent
in scale; token flips only occur at near-ties, where fp-vs-fp reorderings
(e.g. XLA fusion changes) flip tokens too.

Run: python scripts/study_kv_divergence.py          (CPU ok, ~minutes)
Knobs: STUDY_MODEL (tiny|base|small), STUDY_WINDOWS, STUDY_DTYPE
(float32|bfloat16 — bfloat16 is the serving compute dtype).
Results → docs/kv_quant_study.md (committed).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_mlx_tpu.runtime.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from whisper_mlx_tpu.decoding.task import DecodingOptions, decode  # noqa: E402
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer  # noqa: E402
from whisper_mlx_tpu.models.whisper import (  # noqa: E402
    WHISPER_CONFIGS,
    cross_kv,
    decode_step,
    encode,
    init_kv_cache,
    init_params,
)


def main() -> None:
    model_name = os.environ.get("STUDY_MODEL", "tiny")
    n_windows = int(os.environ.get("STUDY_WINDOWS", "32"))
    dtype_name = os.environ.get("STUDY_DTYPE", "float32")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    sample_len = int(os.environ.get("STUDY_SAMPLE_LEN", "64"))
    batch = int(os.environ.get("STUDY_BATCH", "8"))

    tok = make_synthetic_tokenizer()
    base = WHISPER_CONFIGS[model_name]
    base = dataclasses.replace(base, n_vocab=tok.n_vocab, dtype=dtype)
    params = init_params(base, seed=0, dtype=jnp.float32)
    if dtype == jnp.bfloat16:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    cfg_fp = dataclasses.replace(base, kv_bits=0, self_kv_bits=0)
    kv_bits = int(os.environ.get("STUDY_KV_BITS", "8"))
    self_bits = int(os.environ.get("STUDY_SELF_KV_BITS", str(kv_bits)))
    # STUDY_ATTN_MXU=1: the quantized leg additionally runs the integer-MXU
    # attention (ops/kv_quant.py attention_int8_mxu) — bounds the EXTRA
    # q / w·vs dynamic-rounding noise on top of the KV rounding
    attn_mxu = os.environ.get("STUDY_ATTN_MXU") == "1"
    cfg_q = dataclasses.replace(base, kv_bits=kv_bits, self_kv_bits=self_bits,
                                attn_mxu=attn_mxu)

    rng = np.random.default_rng(7)
    opts = DecodingOptions(sample_len=sample_len, without_timestamps=False)

    exact = 0
    first_div: list[int] = []
    logit_max_deltas: list[float] = []
    logit_mean_deltas: list[float] = []
    logit_ranges: list[float] = []
    total = 0

    for start in range(0, n_windows, batch):
        b = min(batch, n_windows - start)
        # synthetic mel in a realistic numeric range (normalized log-mel
        # lives in ~[-1, 1]); weights are random so text is arbitrary, but
        # near-tie density resembles a diffuse real posterior
        mel = rng.standard_normal((b, 3000, base.n_mels)).astype(np.float32) * 0.5
        mel_dev = jnp.asarray(mel)

        states = encode(params, mel_dev, cfg_fp)

        # --- first-step logit perturbation (order-independent evidence) ---
        toks0 = jnp.asarray([[tok.sot, tok.language_token("en"), tok.transcribe]] * b,
                            jnp.int32)
        lg = {}
        for name, cfg in (("fp", cfg_fp), ("q", cfg_q)):
            xkv = cross_kv(params, states, cfg)
            cache = init_kv_cache(cfg, b, max_len=8)
            logits, _, _ = decode_step(params, toks0, jnp.int32(0), cache, xkv, cfg)
            lg[name] = np.asarray(logits[:, -1].astype(jnp.float32))
        delta = np.abs(lg["fp"] - lg["q"])
        logit_max_deltas.append(float(delta.max()))
        logit_mean_deltas.append(float(delta.mean()))
        logit_ranges.append(float(lg["fp"].max() - lg["fp"].min()))

        # --- full greedy decode comparison --------------------------------
        res_fp = decode(params, states, tok, cfg_fp, opts, states_precomputed=True)
        res_q = decode(params, states, tok, cfg_q, opts, states_precomputed=True)
        for rf, rq in zip(res_fp, res_q):
            total += 1
            if rf.tokens == rq.tokens:
                exact += 1
                first_div.append(sample_len)
            else:
                n = min(len(rf.tokens), len(rq.tokens))
                i = next((k for k in range(n) if rf.tokens[k] != rq.tokens[k]), n)
                first_div.append(i)

    report = {
        "model": model_name, "dtype": dtype_name, "windows": total,
        "kv_bits": kv_bits, "self_kv_bits": self_bits,
        "attn_mxu": attn_mxu,
        "sample_len": sample_len,
        "exact_match_rate": round(exact / total, 4),
        "first_divergence_step": {
            "median": int(np.median(first_div)),
            "min": int(np.min(first_div)),
            "p25": int(np.percentile(first_div, 25)),
        },
        "first_step_logits": {
            "max_abs_delta": round(max(logit_max_deltas), 5),
            "mean_abs_delta": round(float(np.mean(logit_mean_deltas)), 6),
            "delta_vs_logit_range": round(
                max(logit_max_deltas) / max(logit_ranges), 5),
        },
        "backend": jax.default_backend(),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
