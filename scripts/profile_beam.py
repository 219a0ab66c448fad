"""Isolate the beam-search decode loop's cost components on hardware.

beam5/B=12 measures 51 RTF/chip vs greedy's 306 at B=56 — yet its traffic
math (12 windows of int4 cross-KV + 60 lanes of int8 self-KV + weights)
says the loop should cost ~2.2 s, not the ~6.8 s observed. This profiler
times the loop's pieces as 224-iteration ``lax.scan`` isolates with
RUNTIME arguments and device->host fetch sync (see profile_attn_micro.py
for why both matter on this backend):

  decode_anc   : real decode_step, ancestry self-attn, 60 lanes
  decode_plain : real decode_step, greedy self-attn path, 60 lanes
  select       : apply_filters + log_softmax + top_k + pool/refill einsums
  topk         : lax.top_k over (N, B*V) alone

Run: python scripts/profile_beam.py   (knobs: PROF_N, PROF_BEAM, PROF_ONLY)
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

import dataclasses  # noqa: E402

from whisper_mlx_tpu.decoding.filters import FilterConfig, apply_filters  # noqa: E402
from whisper_mlx_tpu.models.whisper import (  # noqa: E402
    WHISPER_CONFIGS,
    cross_kv,
    decode_step,
    init_kv_cache,
    init_params,
)

N = int(os.environ.get("PROF_N", "12"))
B = int(os.environ.get("PROF_BEAM", "5"))
STEPS = int(os.environ.get("BENCH_SAMPLE_LEN", "224"))
REPS = int(os.environ.get("PROF_REPS", "3"))
ONLY = os.environ.get("PROF_ONLY", "")
KV = int(os.environ.get("BENCH_KV", "4"))
SELF_KV = int(os.environ.get("BENCH_SELF_KV", "8"))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

results = []


def timeit(name, fn, fetch, note=""):
    t0 = time.perf_counter()
    np.asarray(fetch(fn()))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fetch(fn()))
        times.append(time.perf_counter() - t0)
    best = min(times)
    results.append({"name": name, "seconds": round(best, 4), "note": note})
    print(f"# {name:16s} {best:8.4f}s (compile {compile_s:5.1f}s) {note}",
          file=sys.stderr, flush=True)
    return best


def want(name: str) -> bool:
    return not ONLY or name in ONLY.split(",")


def main():
    cfg = dataclasses.replace(WHISPER_CONFIGS["large-v3"],
                              flash_attention=True, kv_bits=KV,
                              self_kv_bits=SELF_KV)
    V = cfg.n_vocab
    NB = N * B
    n_init = 3
    key = jax.random.PRNGKey(0)
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    audio = jax.random.normal(key, (N, 1500, cfg.n_audio_state), jnp.bfloat16)
    xkv = cache = None  # built inside jit (int4 arrays can't cross the boundary)

    fcfg = FilterConfig(eot=V - 1, no_timestamps=50363, timestamp_begin=50364,
                        sample_begin=n_init, max_initial_timestamp_index=50,
                        apply_timestamp_rules=True)
    supp = np.zeros(V, bool)
    supp[:50] = True
    supp_j = jnp.asarray(supp)
    blank_j = jnp.asarray(np.zeros(V, bool))

    # ---- decode isolates: real decode_step in a serial-feedback scan ----
    def make_decode(ancestry_mode: bool):
        @jax.jit
        def run(params, audio):
            xkv = cross_kv(params, audio, cfg)
            cache = init_kv_cache(cfg, NB, max_len=n_init + STEPS)
            t_alloc = (cache[0]["k8t"].shape[3] if "k8t" in cache[0]
                       else cache[0]["k"].shape[2])
            init = jnp.full((NB, n_init), 7, jnp.int32)
            logits, cache, _ = decode_step(params, init, jnp.int32(0), cache,
                                           xkv, cfg, share_xkv_groups=B)
            logits = logits[:, -1:]
            anc = jnp.tile(
                jnp.tile(jnp.arange(B, dtype=jnp.int32), (N,))[:, None],
                (1, t_alloc)) if ancestry_mode else None

            def step(carry, _):
                logits, cache, pos = carry
                tok = jnp.argmax(logits[:, -1, :512], axis=-1).astype(jnp.int32)
                logits, cache, _ = decode_step(
                    params, tok[:, None], pos, cache, xkv, cfg,
                    share_xkv_groups=B, beam_ancestry=anc)
                return (logits, cache, pos + 1), None

            (logits, _, _), _ = jax.lax.scan(
                step, (logits, cache, jnp.int32(n_init)), None, length=STEPS)
            return logits[0, 0, :8]
        return run

    if want("decode_anc"):
        run = make_decode(True)
        timeit("decode_anc", lambda: run(params, audio), lambda o: o,
               note=f"{NB} lanes, ancestry self-attn, kv{KV}/self{SELF_KV}")
    if want("decode_plain"):
        run = make_decode(False)
        timeit("decode_plain", lambda: run(params, audio), lambda o: o,
               note=f"{NB} lanes, plain self-attn")

    # ---- the REAL loop layout: lane-interleaved FLAT cache + ancestry ----
    # (decode_anc above exercises the superseded 5-D grouped form; the
    # production loop converts to the flat layout — decoding/beam.py)
    if want("decode_flat"):
        @jax.jit
        def run_flat(params, audio):
            xkv = cross_kv(params, audio, cfg)
            cache = init_kv_cache(cfg, NB, max_len=n_init + STEPS)
            t_alloc = (cache[0]["k8t"].shape[3] if "k8t" in cache[0]
                       else cache[0]["k"].shape[2])
            init = jnp.full((NB, n_init), 7, jnp.int32)
            logits, cache, _ = decode_step(params, init, jnp.int32(0), cache,
                                           xkv, cfg, share_xkv_groups=B)
            logits = logits[:, -1:]

            def _to_flat(entry):  # mirror of decoding/beam.py
                if "k8t" in entry:
                    def flat_kv(a):
                        nb, hh, dd, tt = a.shape
                        return (a.reshape(N, B, hh, dd, tt)
                                .transpose(0, 2, 3, 4, 1)
                                .reshape(N, hh, dd, tt * B))

                    def flat_s(s):
                        nb, hh, tt, _ = s.shape
                        return (s[..., 0].reshape(N, B, hh, tt)
                                .transpose(0, 2, 3, 1)
                                .reshape(N, hh, tt * B)[..., None])

                    return {"k8f": flat_kv(entry["k8t"]),
                            "ksf": flat_s(entry["ks"]),
                            "v8f": flat_kv(entry["v8t"]),
                            "vsf": flat_s(entry["vs"])}

                def flat_fp(a):
                    nb, hh, tt, dd = a.shape
                    return (a.reshape(N, B, hh, tt, dd)
                            .transpose(0, 2, 3, 1, 4)
                            .reshape(N, hh, tt * B, dd))

                return {"kf": flat_fp(entry["k"]), "vf": flat_fp(entry["v"])}

            cache = [_to_flat(e) for e in cache]
            anc = jnp.tile(
                jnp.tile(jnp.arange(B, dtype=jnp.int32), (N,))[:, None],
                (1, t_alloc))

            def step(carry, _):
                logits, cache, pos = carry
                tok = jnp.argmax(logits[:, -1, :512], axis=-1).astype(jnp.int32)
                logits, cache, _ = decode_step(
                    params, tok[:, None], pos, cache, xkv, cfg,
                    share_xkv_groups=B, beam_ancestry=anc)
                return (logits, cache, pos + 1), None

            (logits, _, _), _ = jax.lax.scan(
                step, (logits, cache, jnp.int32(n_init)), None, length=STEPS)
            return logits[0, 0, :8]

        timeit("decode_flat", lambda: run_flat(params, audio), lambda o: o,
               note=f"{NB} lanes, lane-interleaved FLAT self-attn "
                    "(the real loop layout)")

    # ---- selection machinery isolate (no model) ----
    K = 2 * B
    n_ctx = cfg.n_text_ctx
    logits0 = jax.random.normal(key, (NB, V), jnp.float32)

    if want("select"):
        @jax.jit
        def select_scan(logits0):
            tokens0 = jnp.zeros((NB, n_ctx), jnp.int32)
            cum0 = jnp.tile(
                jnp.where(jnp.arange(B)[None, :] == 0, 0.0, -jnp.inf), (N, 1))

            def step(carry, _):
                logits, tokens, cum, pos = carry
                f = apply_filters(logits, tokens, pos, supp_j, blank_j, fcfg)
                logprobs = jax.nn.log_softmax(f, axis=-1).reshape(N, B, V)
                cand = cum[:, :, None] + logprobs
                top_scores, top_idx = jax.lax.top_k(cand.reshape(N, B * V), K)
                parent = top_idx // V
                token = (top_idx % V).astype(jnp.int32)
                is_eot = token == fcfg.eot
                nb_rank = jnp.cumsum((~is_eot).astype(jnp.int32), axis=1) - 1
                keep = (~is_eot) & (nb_rank < B)
                sel = jnp.where(keep, nb_rank, B)
                onehot_b = jax.nn.one_hot(sel, B, dtype=jnp.int32)
                new_parent = jnp.einsum("nkb,nk->nb", onehot_b, parent)
                new_token = jnp.einsum("nkb,nk->nb", onehot_b, token)
                new_cum = jnp.einsum("nkb,nk->nb", onehot_b.astype(jnp.float32),
                                     top_scores)
                flat_parent = (new_parent + jnp.arange(N)[:, None] * B).reshape(-1)
                tokens = tokens[flat_parent]
                tokens = jax.lax.dynamic_update_slice(
                    tokens, new_token.reshape(-1, 1), (0, pos))
                # logits feedback: roll so the scan is serial
                logits = jnp.roll(logits, 1, axis=0) * 0.999 + new_cum.reshape(-1)[:, None] * 1e-6
                return (logits, tokens, new_cum, pos + 1), None

            (logits, tokens, cum, _), _ = jax.lax.scan(
                step, (logits0, tokens0, cum0, jnp.int32(n_init)), None,
                length=STEPS)
            return cum[0]
        timeit("select", lambda: select_scan(logits0), lambda o: o,
               note=f"filters+softmax+topk+refill ({NB},{V})")

    if want("topk"):
        @jax.jit
        def topk_scan(logits0):
            def step(carry, _):
                cand = carry.reshape(N, B * V)
                s, i = jax.lax.top_k(cand, K)
                carry = carry * 0.999 + jnp.sum(s) * 1e-9
                return carry, None
            out, _ = jax.lax.scan(step, logits0, None, length=STEPS)
            return out[0, :4]
        timeit("topk", lambda: topk_scan(logits0), lambda o: o,
               note=f"lax.top_k (N={N}, {B * V}) k={K}")

    print(json.dumps({"beam_profile": results, "n": N, "beam": B,
                      "kv": KV, "self_kv": SELF_KV}))




def bisect_main():
    """PROF_BISECT=1: decode_step with beam_ancestry set but the ancestry
    attention monkeypatched to plain attention (ignores anc). Separates
    'the op in context' from 'the code path around it'."""
    import whisper_mlx_tpu.models.whisper as mw
    from whisper_mlx_tpu.ops import kv_quant

    def fake_anc(q, k8t, k_scale, v8t, v_scale, ancestry, pos, groups):
        return kv_quant.attention_int8_auto(q, k8t, k_scale, v8t, v_scale,
                                            pos=pos, causal=True)
    kv_quant.attention_int8_ancestry = fake_anc
    global results
    results = []
    cfg = dataclasses.replace(WHISPER_CONFIGS["large-v3"],
                              flash_attention=True, kv_bits=KV,
                              self_kv_bits=SELF_KV)
    NB = N * B
    n_init = 3
    key = jax.random.PRNGKey(0)
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    audio = jax.random.normal(key, (N, 1500, cfg.n_audio_state), jnp.bfloat16)

    @jax.jit
    def run(params, audio):
        xkv = cross_kv(params, audio, cfg)
        cache = init_kv_cache(cfg, NB, max_len=n_init + STEPS)
        t_alloc = (cache[0]["k8t"].shape[3] if "k8t" in cache[0]
                   else cache[0]["k"].shape[2])
        init = jnp.full((NB, n_init), 7, jnp.int32)
        logits, cache, _ = decode_step(params, init, jnp.int32(0), cache,
                                       xkv, cfg, share_xkv_groups=B)
        logits = logits[:, -1:]
        anc = jnp.tile(
            jnp.tile(jnp.arange(B, dtype=jnp.int32), (N,))[:, None],
            (1, t_alloc))

        def step(carry, _):
            logits, cache, pos = carry
            tok = jnp.argmax(logits[:, -1, :512], axis=-1).astype(jnp.int32)
            logits, cache, _ = decode_step(
                params, tok[:, None], pos, cache, xkv, cfg,
                share_xkv_groups=B, beam_ancestry=anc)
            return (logits, cache, pos + 1), None

        (logits, _, _), _ = jax.lax.scan(
            step, (logits, cache, jnp.int32(n_init)), None, length=STEPS)
        return logits[0, 0, :8]

    timeit("decode_fakeanc", lambda: run(params, audio), lambda o: o,
           note="ancestry path, plain attn monkeypatch")
    print(json.dumps({"bisect": results}))


if os.environ.get("PROF_BISECT"):
    main = bisect_main



def ancvar_main():
    """PROF_ANCVAR=own|nosel: patch perf-probe variants of the ancestry
    attention into the real decode isolate to localize the slowdown.
    'own'   — 5-D grouped structure but each lane attends ONLY its own row
              (wrong math, isolates the reshape/group structure cost).
    'nosel' — full cross-lane einsum, but plain sum over k instead of the
              ancestry select (wrong math, isolates the select cost)."""
    from whisper_mlx_tpu.ops import kv_quant

    variant = os.environ["PROF_ANCVAR"]

    def probe_anc(q, k8t, k_scale, v8t, v_scale, ancestry, pos, groups):
        NB_, h, tq, d = q.shape
        T = k8t.shape[3]
        g = groups
        n = NB_ // g
        q4 = q.reshape(n, g, h, d)
        k5 = k8t.reshape(n, g, h, d, T)
        v5 = v8t.reshape(n, g, h, d, T)
        ks5 = k_scale[..., 0].reshape(n, g, h, T)
        vs5 = v_scale[..., 0].reshape(n, g, h, T)
        anc = ancestry.reshape(n, g, T)
        if variant == "own":
            s = jnp.einsum("nbhd,nbhdt->nbht", q4.astype(jnp.float32),
                           k5.astype(jnp.float32))
            s = s * ks5.astype(jnp.float32)
        else:  # nosel
            s_all = jnp.einsum("nbhd,nkhdt->nkbht", q4.astype(jnp.float32),
                               k5.astype(jnp.float32))
            s_all = s_all * ks5[:, :, None].astype(jnp.float32)
            s = jnp.sum(s_all, axis=1)
        valid = jnp.arange(T)[None, None, None, :] <= pos
        s = jnp.where(valid, s, -jnp.inf)
        w = jax.nn.softmax(s, axis=-1)
        if variant == "own":
            wv = w * vs5.astype(jnp.float32)
            out = jnp.einsum("nbht,nbhdt->nbhd", wv, v5.astype(jnp.float32))
        else:
            wv = w[:, None] * vs5[:, :, None].astype(jnp.float32)
            out = jnp.einsum("nkbht,nkhdt->nbhd", wv, v5.astype(jnp.float32))
        return out.reshape(NB_, h, tq, d).astype(q.dtype)

    kv_quant.attention_int8_ancestry = probe_anc
    import whisper_mlx_tpu.models.whisper  # noqa: F401  (uses late import)
    global results
    results = []
    cfg = dataclasses.replace(WHISPER_CONFIGS["large-v3"],
                              flash_attention=True, kv_bits=KV,
                              self_kv_bits=SELF_KV)
    NB = N * B
    n_init = 3
    key = jax.random.PRNGKey(0)
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    audio = jax.random.normal(key, (N, 1500, cfg.n_audio_state), jnp.bfloat16)

    @jax.jit
    def run(params, audio):
        xkv = cross_kv(params, audio, cfg)
        cache = init_kv_cache(cfg, NB, max_len=n_init + STEPS)
        t_alloc = cache[0]["k8t"].shape[3]
        init = jnp.full((NB, n_init), 7, jnp.int32)
        logits, cache, _ = decode_step(params, init, jnp.int32(0), cache,
                                       xkv, cfg, share_xkv_groups=B)
        logits = logits[:, -1:]
        anc = jnp.tile(
            jnp.tile(jnp.arange(B, dtype=jnp.int32), (N,))[:, None],
            (1, t_alloc))

        def step(carry, _):
            logits, cache, pos = carry
            tok = jnp.argmax(logits[:, -1, :512], axis=-1).astype(jnp.int32)
            logits, cache, _ = decode_step(
                params, tok[:, None], pos, cache, xkv, cfg,
                share_xkv_groups=B, beam_ancestry=anc)
            return (logits, cache, pos + 1), None

        (logits, _, _), _ = jax.lax.scan(
            step, (logits, cache, jnp.int32(n_init)), None, length=STEPS)
        return logits[0, 0, :8]

    timeit(f"decode_{variant}", lambda: run(params, audio), lambda o: o,
           note=f"ancestry variant: {variant}")
    print(json.dumps({"ancvar": results}))


if os.environ.get("PROF_ANCVAR"):
    main = ancvar_main


def perm_main():
    """PROF_PERM=gather|onehot: plain per-lane cache + per-step PHYSICAL
    lane permutation (classic beam reorder), measuring two lowerings of the
    permute against decode_plain's floor:

      gather — jnp.take over the lane axis (what r2 measured as 'well
               below copy bandwidth'; re-measured here at current shapes)
      onehot — (N, B, B) one-hot matmul on the MXU: bf16 for int8 codes
               (values ≤ |127| exact in bf16), f32 for scales.

    The permutation is data-dependent (derived from the fed-back token) so
    XLA cannot constant-fold it, and non-identity every step (worst case).
    """
    mode = os.environ["PROF_PERM"]
    cfg = dataclasses.replace(WHISPER_CONFIGS["large-v3"],
                              flash_attention=True, kv_bits=KV,
                              self_kv_bits=SELF_KV)
    NB = N * B
    n_init = 3
    key = jax.random.PRNGKey(0)
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    audio = jax.random.normal(key, (N, 1500, cfg.n_audio_state), jnp.bfloat16)

    def permute_entry(a, oh_b, flat_parent):
        """Permute lanes of a (NB, ...) cache tensor within B-sized groups."""
        if mode == "gather":
            return jnp.take(a, flat_parent, axis=0)
        nb = a.shape[0]
        rest = a.shape[1:]
        x = a.reshape(N, B, -1)
        if a.dtype in (jnp.int8, jnp.int4):
            out = jnp.einsum("nbk,nkx->nbx", oh_b.astype(jnp.bfloat16),
                             x.astype(jnp.bfloat16))
            return out.astype(a.dtype).reshape(nb, *rest)
        out = jnp.einsum("nbk,nkx->nbx", oh_b.astype(x.dtype), x)
        return out.reshape(nb, *rest)

    def permute_tree(cache, oh_b, flat_parent):
        if mode in ("pallas", "inplace"):
            from whisper_mlx_tpu.ops.lane_permute import (
                lane_move_inplace,
                permute_lanes,
            )
            fn = lane_move_inplace if mode == "inplace" else permute_lanes
            out = []
            for e in cache:
                keys = sorted(e)
                outs = fn([e[k] for k in keys], flat_parent)
                out.append(dict(zip(keys, outs)))
            return out
        return [{k: permute_entry(v, oh_b, flat_parent)
                 for k, v in e.items()} for e in cache]

    @jax.jit
    def run(params, audio):
        xkv = cross_kv(params, audio, cfg)
        cache = init_kv_cache(cfg, NB, max_len=n_init + STEPS)
        init = jnp.full((NB, n_init), 7, jnp.int32)
        logits, cache, _ = decode_step(params, init, jnp.int32(0), cache,
                                       xkv, cfg, share_xkv_groups=B)
        logits = logits[:, -1:]

        variant = os.environ.get("PROF_PERM_VARIANT", "dep")

        def step(carry, _):
            logits, cache, pos = carry
            tok = jnp.argmax(logits[:, -1, :512], axis=-1).astype(jnp.int32)
            # data-dependent rotation: parent[b] = (b + 1 + tok[w*B]%2) % B
            shift = (tok.reshape(N, B)[:, 0] % 2)[:, None]
            iota_b = jnp.arange(B, dtype=jnp.int32)[None, :]
            parent = (iota_b + 1 + shift) % B
            if mode == "inplace":
                # fixed-point-source pattern (the kernel's precondition):
                # lanes 0..B-3 keep their rows; the last two copy from
                # data-dependent low lanes (~40% of rows move — a realistic
                # beam-divergence rate)
                parent = jnp.where(iota_b < B - 2, iota_b,
                                   (iota_b + shift) % (B - 2))
            oh_b = jax.nn.one_hot(parent, B, dtype=jnp.float32)  # (N, B, B)
            flat_parent = (parent + jnp.arange(N)[:, None] * B).reshape(-1)
            if variant == "indep":
                # cost isolate: permute is carried but decode reads the OLD
                # cache and its dus'd updates are discarded — measures
                # decode + permute COEXISTING without a data dependence
                cache_perm = permute_tree(cache, oh_b, flat_parent)
                logits, _, _ = decode_step(
                    params, tok[:, None], pos, cache, xkv, cfg,
                    share_xkv_groups=B)
                return (logits, cache_perm, pos + 1), None
            cache = permute_tree(cache, oh_b, flat_parent)
            if variant == "barrier":
                # force a materialization boundary so XLA cannot fuse the
                # permute into the attention reads / dus operands
                cache = jax.lax.optimization_barrier(cache)
            logits, cache, _ = decode_step(
                params, tok[:, None], pos, cache, xkv, cfg,
                share_xkv_groups=B)
            return (logits, cache, pos + 1), None

        (logits, _, _), _ = jax.lax.scan(
            step, (logits, cache, jnp.int32(n_init)), None, length=STEPS)
        return logits[0, 0, :8]

    global results
    results = []
    timeit(f"decode_perm_{mode}", lambda: run(params, audio), lambda o: o,
           note=f"{NB} lanes, plain self-attn + per-step {mode} permute")
    print(json.dumps({"perm": results, "n": N, "beam": B,
                      "kv": KV, "self_kv": SELF_KV}))


if os.environ.get("PROF_PERM"):
    main = perm_main


if __name__ == "__main__":
    main()
