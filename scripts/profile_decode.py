"""Per-stage device profile of the large-v3 decode pipeline.

VERDICT r2 item 1: the HBM roofline (docs/performance.md traffic math) puts
the B=56 batch at ~4.2 s but bench.py measures 6.65 s — this script finds
the missing ~2.4 s. Two measurement families, all fetch-synced (CLAUDE.md:
``block_until_ready`` acks at dispatch on this backend; only a device→host
fetch of an output truly waits):

1. **Pipeline stages**: mel → encoder → cross_kv+prefill → decode loop,
   each its own jit, timed end-to-end. loop = full_greedy − prefill-stage.
2. **224-step scan isolates**: each decode-step component alone inside a
   ``lax.scan`` of sample_len iterations at the real serving shapes
   (B=56, 32 layers, int8 cross+self KV, right-sized caches). Comparing
   the isolate sum against the real loop exposes what XLA fails to
   overlap/fuse in context.

Run on the TPU:  python scripts/profile_decode.py
Knobs: BENCH_BATCH / BENCH_SAMPLE_LEN / PROF_REPS.
Reference workload contract: /root/reference/run:3-6.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_mlx_tpu.runtime.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _zeros_params  # noqa: E402
from whisper_mlx_tpu.audio.mel import N_SAMPLES, log_mel_spectrogram  # noqa: E402
from whisper_mlx_tpu.decoding.filters import FilterConfig, apply_filters, make_suppress_mask  # noqa: E402
from whisper_mlx_tpu.decoding.task import DecodingOptions, decode  # noqa: E402
from whisper_mlx_tpu.decoding.tokenizer import (  # noqa: E402
    ByteLevelBPE,
    WhisperTokenizer,
    bytes_to_unicode,
)
from whisper_mlx_tpu.models.whisper import (  # noqa: E402
    WHISPER_CONFIGS,
    cross_kv,
    decode_step,
    encode,
    init_kv_cache,
    linear,
)
from whisper_mlx_tpu.ops.kv_quant import attention_int8_auto  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "56"))
SAMPLE_LEN = int(os.environ.get("BENCH_SAMPLE_LEN", "224"))
REPS = int(os.environ.get("PROF_REPS", "3"))

cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

config = dataclasses.replace(
    WHISPER_CONFIGS["large-v3"], dtype=jnp.bfloat16,
    flash_attention=True,
    kv_bits=int(os.environ.get("BENCH_KV", "4")),        # serving default int4 cross
    self_kv_bits=int(os.environ.get("BENCH_SELF_KV", "8")),
)
H = config.n_text_head          # 20
HD = config.head_dim            # 64
D = config.n_text_state         # 1280
L = config.n_text_layer         # 32
TK_CROSS = config.n_audio_ctx   # 1500
N_INIT = 3                      # sot sequence [sot, lang, task]
T_SELF = -(-(N_INIT + SAMPLE_LEN) // 128) * 128  # right-sized cache alloc

results: list[dict] = []


def timeit(name: str, fn, fetch, reps: int = REPS, note: str = "") -> float:
    t0 = time.perf_counter()
    out = fn()
    np.asarray(fetch(out))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(fetch(out))
        times.append(time.perf_counter() - t0)
    best = min(times)
    rec = {"stage": name, "seconds": round(best, 4), "compile_s": round(compile_s, 1),
           "note": note}
    results.append(rec)
    print(f"# {name:28s} {best:8.4f}s  (compile {compile_s:5.1f}s) {note}",
          file=sys.stderr, flush=True)
    return best


def scan_n(step, init, n=SAMPLE_LEN):
    def body(c, _):
        return step(c), None
    out, _ = jax.lax.scan(body, init, None, length=n)
    return out


def main() -> None:
    params = _zeros_params(config, jnp.bfloat16)
    byte_vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
    tok = WhisperTokenizer(ByteLevelBPE(byte_vocab, []), n_base=50257, num_languages=100)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, N_SAMPLES)).astype(np.float32) * 0.1)

    # ---- stage 1: mel ------------------------------------------------------
    mel_fn = jax.jit(lambda a: jax.vmap(
        lambda x: log_mel_spectrogram(x, n_mels=config.n_mels))(a))
    t_mel = timeit("mel", lambda: mel_fn(audio), lambda m: m[0, 0, :1])
    mel = mel_fn(audio)

    # ---- stage 2: encoder --------------------------------------------------
    t_enc = timeit("encode", lambda: encode(params, mel, config),
                   lambda s: s[0, 0, :1])
    states = encode(params, mel, config)

    # ---- stage 3: cross_kv + prefill --------------------------------------
    toks0 = jnp.full((B, N_INIT), 50258, jnp.int32)

    @jax.jit
    def prefill(states, toks):
        xkv = cross_kv(params, states, config)
        cache = init_kv_cache(config, B, max_len=N_INIT + SAMPLE_LEN)
        logits, cache, _ = decode_step(params, toks, jnp.int32(0), cache, xkv, config)
        return logits

    t_prefill = timeit("cross_kv+prefill", lambda: prefill(states, toks0),
                       lambda lg: lg[0, 0, :1])

    # ---- stage 4: full pipeline via decode() (bench.py parity) -------------
    options = DecodingOptions(sample_len=SAMPLE_LEN, without_timestamps=False)

    def full():
        return decode(params, states, tok, config, options, states_precomputed=True)

    t0 = time.perf_counter()
    full()
    full_compile = time.perf_counter() - t0
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        full()
        times.append(time.perf_counter() - t0)
    t_decode_total = min(times)
    results.append({"stage": "decode_total(xkv+prefill+loop)",
                    "seconds": round(t_decode_total, 4),
                    "compile_s": round(full_compile, 1), "note": "states precomputed"})
    print(f"# {'decode_total':28s} {t_decode_total:8.4f}s  "
          f"(compile {full_compile:5.1f}s)", file=sys.stderr, flush=True)
    t_loop = t_decode_total - t_prefill
    results.append({"stage": "loop(=total-prefill)", "seconds": round(t_loop, 4),
                    "compile_s": 0.0, "note": f"{SAMPLE_LEN} steps"})

    # ---- isolate A: cross-attention, all 32 layers, 224 steps --------------
    # NOTE: every isolate takes its big operands as jit ARGUMENTS — a
    # closed-over device array is baked in as a compile-time constant and
    # times impossibly fast (CLAUDE.md gotcha; a 7.3 GB captured cross-KV
    # "streamed" at 29 GB/ms in one invalidated run).
    kr = jax.random.PRNGKey(1)
    xkv = [
        {"k8t": jax.random.randint(kr, (B, H, HD, TK_CROSS), -127, 127, jnp.int8),
         "ks": jnp.ones((B, H, TK_CROSS, 1), jnp.bfloat16) * 0.01,
         "v8t": jax.random.randint(kr, (B, H, HD, TK_CROSS), -127, 127, jnp.int8),
         "vs": jnp.ones((B, H, TK_CROSS, 1), jnp.bfloat16) * 0.01}
        for _ in range(L)
    ]

    @jax.jit
    def cross_only(q0, xkv):
        def step(q):
            acc = q
            for lyr in xkv:
                out = attention_int8_auto(
                    q, lyr["k8t"], lyr["ks"], lyr["v8t"], lyr["vs"],
                    valid_len=TK_CROSS)
                acc = acc + out
            return acc * jnp.bfloat16(1e-3)
        return scan_n(step, q0)

    q0 = jnp.ones((B, H, 1, HD), jnp.bfloat16)
    timeit("iso: cross-attn x32L", lambda: cross_only(q0, xkv),
           lambda q: q[0, 0, 0, :1],
           note=f"{L}L x {SAMPLE_LEN} steps, Tk={TK_CROSS}")

    # ---- isolate B: self-attention + cache update, 32 layers ---------------
    self_cache = [
        {"k8t": jnp.zeros((B, H, HD, T_SELF), jnp.int8),
         "ks": jnp.zeros((B, H, T_SELF, 1), jnp.bfloat16),
         "v8t": jnp.zeros((B, H, HD, T_SELF), jnp.int8),
         "vs": jnp.zeros((B, H, T_SELF, 1), jnp.bfloat16)}
        for _ in range(L)
    ]

    @jax.jit
    def self_only(carry0):
        from whisper_mlx_tpu.ops.kv_quant import quantize_kv

        def step(carry):
            q, cache, pos = carry
            new_cache = []
            acc = q
            for entry in cache:
                k8n, ksn = quantize_kv(q)
                upd = lambda buf, new: jax.lax.dynamic_update_slice_in_dim(
                    buf, new, pos, axis=2)
                updt = lambda buf, new: jax.lax.dynamic_update_slice_in_dim(
                    buf, jnp.swapaxes(new, 2, 3), pos, axis=3)
                e = {"k8t": updt(entry["k8t"], k8n), "ks": upd(entry["ks"], ksn),
                     "v8t": updt(entry["v8t"], k8n), "vs": upd(entry["vs"], ksn)}
                new_cache.append(e)
                out = attention_int8_auto(
                    q, e["k8t"], e["ks"], e["v8t"], e["vs"], pos=pos, causal=True)
                acc = acc + out
            return (acc * jnp.bfloat16(1e-3), new_cache, pos + 1)
        return scan_n(step, carry0)[0]

    timeit("iso: self-attn x32L", lambda: self_only((q0, self_cache, jnp.int32(N_INIT))),
           lambda q: q[0, 0, 0, :1],
           note=f"{L}L x {SAMPLE_LEN} steps, Talloc={T_SELF}")

    # ---- isolate B2: self-attention READ only (static cache, no update) ----
    @jax.jit
    def self_read_only(carry0, cache):
        def step(carry):
            q, pos = carry
            acc = q
            for e in cache:
                out = attention_int8_auto(
                    q, e["k8t"], e["ks"], e["v8t"], e["vs"], pos=pos, causal=True)
                acc = acc + out
            return (acc * jnp.bfloat16(1e-3), pos + 1)
        return scan_n(step, carry0)[0]

    timeit("iso: self-attn read x32L",
           lambda: self_read_only((q0, jnp.int32(N_INIT)), self_cache),
           lambda q: q[0, 0, 0, :1],
           note="attention only, no cache update")

    # ---- isolate B3: cache UPDATE only (scatter, no attention) -------------
    @jax.jit
    def self_update_only(carry0):
        from whisper_mlx_tpu.ops.kv_quant import quantize_kv

        def step(carry):
            q, cache, pos = carry
            new_cache = []
            for entry in cache:
                k8n, ksn = quantize_kv(q)
                upd = lambda buf, new: jax.lax.dynamic_update_slice_in_dim(
                    buf, new, pos, axis=2)
                updt = lambda buf, new: jax.lax.dynamic_update_slice_in_dim(
                    buf, jnp.swapaxes(new, 2, 3), pos, axis=3)
                e = {"k8t": updt(entry["k8t"], k8n), "ks": upd(entry["ks"], ksn),
                     "v8t": updt(entry["v8t"], k8n), "vs": upd(entry["vs"], ksn)}
                new_cache.append(e)
            # consume one byte per layer so nothing is DCE'd
            acc = q + sum(e["k8t"][:, :1, :1, :1].astype(jnp.bfloat16)
                          for e in new_cache)[..., :1] * jnp.bfloat16(1e-6)
            return (acc * jnp.bfloat16(1.0), new_cache, pos + 1)
        return scan_n(step, carry0)[0]

    timeit("iso: self-cache update x32L",
           lambda: self_update_only((q0, self_cache, jnp.int32(N_INIT))),
           lambda q: q[0, 0, 0, :1],
           note="time-minor scatter writes only")

    # ---- isolate C: weight matmul chain (no attention math) ----------------
    @jax.jit
    def weights_only(x0, params):
        p = params["decoder"]

        def step(x):
            h = x
            for blk in p["blocks"]:
                a = blk["attn"]
                q_ = linear(h, a["q"]); k_ = linear(h, a["k"]); v_ = linear(h, a["v"])
                h = h + linear(q_ + k_ + v_, a["o"])
                c = blk["cross_attn"]
                h = h + linear(linear(h, c["q"]), c["o"])
                m = blk["mlp"]
                h = h + linear(jax.nn.gelu(linear(h, m["fc1"]), approximate=False), m["fc2"])
            logits = jnp.einsum("btd,vd->btv", h, p["token_emb"].astype(h.dtype))
            return (h + logits[..., :1] * jnp.bfloat16(1e-6)) * jnp.bfloat16(1e-3)
        return scan_n(step, x0)

    x0 = jnp.ones((B, 1, D), jnp.bfloat16)
    timeit("iso: weights+head x32L", lambda: weights_only(x0, params),
           lambda x: x[0, 0, :1],
           note="all decoder matmuls incl. logits head")

    # ---- isolate D: logits head alone --------------------------------------
    @jax.jit
    def head_only(x0, emb):
        def step(x):
            logits = jnp.einsum("btd,vd->btv", x, emb.astype(x.dtype))
            return x + logits[..., :1] * jnp.bfloat16(1e-6)
        return scan_n(step, x0)

    timeit("iso: logits head",
           lambda: head_only(x0, params["decoder"]["token_emb"]),
           lambda x: x[0, 0, :1],
           note=f"(B,1,{D})x({config.n_vocab},{D})")

    # ---- isolate E: filters + sampling --------------------------------------
    always_np, begin_np = make_suppress_mask(config.n_vocab, (50256,), (220,))
    sup, blk = jnp.asarray(always_np), jnp.asarray(begin_np)
    fcfg = FilterConfig(eot=tok.eot, no_timestamps=tok.no_timestamps,
                        timestamp_begin=tok.timestamp_begin, sample_begin=N_INIT)
    tokens_buf = jnp.zeros((B, config.n_text_ctx), jnp.int32)

    @jax.jit
    def filters_only(carry0):
        def step(carry):
            logits, key, cur = carry
            f = apply_filters(logits, tokens_buf, cur, sup, blk, fcfg)
            logprobs = jax.nn.log_softmax(f, axis=-1)
            key, sub = jax.random.split(key)
            greedy_t = jnp.argmax(f, axis=-1)
            samp = jax.random.categorical(sub, f / jnp.float32(0.5), axis=-1)
            lp = jnp.take_along_axis(logprobs, samp[:, None], axis=-1)[:, 0]
            nxt = logits + (greedy_t + samp)[:, None].astype(jnp.float32) * 1e-9 \
                + lp[:, None] * 1e-9
            return (nxt, key, cur + 1)
        return scan_n(step, carry0)[0]

    lg0 = jnp.zeros((B, config.n_vocab), jnp.float32)
    timeit("iso: filters+sampling", lambda: filters_only((lg0, jax.random.PRNGKey(0),
                                                          jnp.int32(N_INIT))),
           lambda x: x[0, :1],
           note="suppress+ts rules+log_softmax+categorical")

    # ---- summary ------------------------------------------------------------
    print(json.dumps({"profile": results, "batch": B, "sample_len": SAMPLE_LEN,
                      "backend": jax.default_backend()}))
    audio_s = B * 30.0
    total = t_mel + t_enc + t_decode_total
    print(f"# pipeline total {total:.3f}s  -> RTF/chip "
          f"{audio_s / total / jax.device_count():.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
