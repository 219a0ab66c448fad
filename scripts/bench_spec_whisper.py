"""Hardware bench: whisper speculative decoding (large-v3 + turbo draft).

The jitted spec loop (decoding/speculative.py) does FIXED device work per
iteration — k draft decoder steps + one (k+1)-position target verify — so
its per-iteration cost is measurable EXACTLY with a random draft
(acceptance ≈ 0 → one committed token per iteration → iterations =
sample_len). With real checkpoints only the iteration COUNT changes:
committed-per-iteration E[m](a) = sum_{i=0..k} i-step acceptance mass
= (1 - a^{k+1}) / (1 - a) for per-token acceptance a. This brackets the
speedup honestly without pretrained weights (same methodology as the LLM
bracket, scripts/bench_speculative.py):

    tok/s(a) = E[m](a) / t_iter   vs baseline   1 / t_tok

Prints one JSON line with both measured numbers, the modeled speedups at
a ∈ {0.6, 0.7, 0.8, 0.9}, and the break-even acceptance.

Knobs: SPECW_K (4), SPECW_LEN (224), SPECW_MODEL (large-v3),
SPECW_DRAFT_LAYERS (4 — the turbo decoder depth).
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

K = int(os.environ.get("SPECW_K", "4"))
SAMPLE_LEN = int(os.environ.get("SPECW_LEN", "224"))
MODEL = os.environ.get("SPECW_MODEL", "large-v3")
DRAFT_LAYERS = int(os.environ.get("SPECW_DRAFT_LAYERS", "4"))


def main() -> None:
    from bench import _zeros_params
    from whisper_mlx_tpu.decoding.filters import FilterConfig, make_suppress_mask
    from whisper_mlx_tpu.decoding.greedy import greedy_decode
    from whisper_mlx_tpu.decoding.speculative import spec_decode
    from whisper_mlx_tpu.decoding.tokenizer import (
        ByteLevelBPE, WhisperTokenizer, bytes_to_unicode)
    from whisper_mlx_tpu.models.whisper import WHISPER_CONFIGS

    config = dataclasses.replace(
        WHISPER_CONFIGS[MODEL], dtype=jnp.bfloat16, flash_attention=True,
        kv_bits=4, self_kv_bits=8)
    draft_cfg = dataclasses.replace(config, n_text_layer=DRAFT_LAYERS)

    byte_vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
    tok = WhisperTokenizer(ByteLevelBPE(byte_vocab, []), n_base=50257,
                           num_languages=100 if config.n_vocab == 51866 else 99)

    params_t = _zeros_params(config, jnp.bfloat16)
    params_d = _zeros_params(draft_cfg, jnp.bfloat16)
    # Timing is weight-value-independent, and t_iter divides by the ACTUAL
    # iteration count (res.target_calls), so any acceptance regime measures
    # the fixed per-iteration device cost exactly.
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
        return np.asarray(res.tokens)  # device→host sync (block lies here)

    # ---- baseline: plain greedy loop, 1 window --------------------------
    def run_greedy():
        return greedy_decode(
            params_t, states, init, jnp.asarray(always_np),
            jnp.asarray(begin_np), jnp.float32(0.0), jax.random.PRNGKey(0),
            config, fcfg, SAMPLE_LEN, 0, tok.no_speech)

    t0 = time.perf_counter()
    fetch(run_greedy())
    greedy_compile = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(run_greedy())
        times.append(time.perf_counter() - t0)
    t_greedy = min(times)
    t_tok = t_greedy / SAMPLE_LEN

    # ---- spec loop: random draft → acceptance ≈ 0 → t_iter exact --------
    def run_spec():
        return spec_decode(
            params_t, params_d, states, states, init,
            jnp.asarray(always_np), jnp.asarray(begin_np),
            config_t=config, config_d=draft_cfg, filter_cfg=fcfg,
            sample_len=SAMPLE_LEN, sot_index=0,
            no_speech_token=tok.no_speech, k=K)

    t0 = time.perf_counter()
    res = run_spec()
    fetch(res)
    spec_compile = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run_spec()
        fetch(res)
        times.append(time.perf_counter() - t0)
    t_spec = min(times)
    iters = int(res.target_calls)
    accepted = int(res.accepted)
    proposed = int(res.proposed)
    t_iter = t_spec / max(iters, 1)

    def e_m(a: float) -> float:
        return sum(a ** i for i in range(K + 1))

    modeled = {f"speedup@a={a}": round((e_m(a) / t_iter) * t_tok, 2)
               for a in (0.6, 0.7, 0.8, 0.9)}
    # break-even: E[m](a) = t_iter / t_tok
    need = t_iter / t_tok
    lo, hi = 0.0, 1.0
    for _ in range(40):
        mid = (lo + hi) / 2
        lo, hi = (mid, hi) if e_m(mid) < need else (lo, mid)
    line = {
        "metric": "spec_whisper_bracket",
        "model": MODEL, "draft_layers": DRAFT_LAYERS, "k": K,
        "sample_len": SAMPLE_LEN,
        "greedy_tok_ms": round(t_tok * 1e3, 3),
        "spec_iter_ms": round(t_iter * 1e3, 3),
        "iters": iters, "accepted": accepted, "proposed": proposed,
        "breakeven_acceptance": round((lo + hi) / 2, 3),
        **modeled,
        "unit": "modeled tok/s ratio vs greedy",
    }
    print(json.dumps(line))
    if jax.default_backend() == "tpu":
        try:
            with open(os.path.join(os.path.dirname(__file__), "..",
                                   "bench_history.jsonl"), "a") as f:
                f.write(json.dumps(line) + "\n")
        except OSError:
            pass
    print(f"# greedy {t_greedy:.3f}s/{SAMPLE_LEN} steps "
          f"(compile {greedy_compile:.0f}s); spec {t_spec:.3f}s/{iters} iters "
          f"(compile {spec_compile:.0f}s) backend={jax.default_backend()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
