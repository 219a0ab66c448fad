"""int8 cross-attention KV: scale-folding exactness + pipeline integration."""

import dataclasses

import numpy as np
import pytest

import torch  # noqa: F401
import jax.numpy as jnp

from whisper_mlx_tpu.decoding.task import DecodingOptions, decode
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
from whisper_mlx_tpu.models.whisper import WhisperConfig, init_params
from whisper_mlx_tpu.ops.kv_quant import attention_int8_kv, quantize_kv


def test_quantize_kv_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 50, 16)).astype(np.float32)
    q, s = quantize_kv(jnp.asarray(x))
    back = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(back - x)
    assert np.all(err <= np.asarray(s)[..., 0][..., None] * 0.5 + 1e-7)


def test_attention_int8_exact_on_representable_kv():
    """When K/V are exactly int8×scale, folded attention == exact attention."""
    rng = np.random.default_rng(1)
    b, h, tq, tk, d = 1, 2, 4, 32, 16
    scale_k = rng.uniform(0.01, 0.1, size=(b, h, tk, 1)).astype(np.float32)
    scale_v = rng.uniform(0.01, 0.1, size=(b, h, tk, 1)).astype(np.float32)
    k8 = rng.integers(-127, 128, size=(b, h, tk, d)).astype(np.int8)
    v8 = rng.integers(-127, 128, size=(b, h, tk, d)).astype(np.int8)
    k = k8.astype(np.float32) * scale_k
    v = v8.astype(np.float32) * scale_v
    q = rng.standard_normal((b, h, tq, d)).astype(np.float32) * 0.3

    # exact reference over dequantized K/V
    s = np.einsum("bhqd,bhkd->bhqk", q, k)
    w = np.exp(s - s.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", w, v)

    out = np.asarray(attention_int8_kv(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(scale_k),
        jnp.asarray(v8), jnp.asarray(scale_v),
    ))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.fixture(scope="module")
def tiny():
    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(config, seed=0)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((2, 3000, 80)).astype(np.float32)
    return params, config, tok, jnp.asarray(mel)


def test_int8_kv_decode_close_to_fp(tiny):
    params, config, tok, mel = tiny
    cfg8 = dataclasses.replace(config, kv_bits=8, self_kv_bits=8)
    r_fp = decode(params, mel, tok, config, DecodingOptions(sample_len=12))
    r_q = decode(params, mel, tok, cfg8, DecodingOptions(sample_len=12))
    for a, b in zip(r_fp, r_q):
        assert abs(a.avg_logprob - b.avg_logprob) < 0.2
        assert a.tokens, "fp decode empty"
        assert b.tokens, "int8-kv decode empty"


def test_int8_kv_word_timestamps_fallback(tiny):
    """find_alignment silently uses fp cross-attention under kv_bits=8."""
    from whisper_mlx_tpu.inference.word_timestamps import find_alignment

    params, config, tok, mel = tiny
    cfg8 = dataclasses.replace(config, kv_bits=8, self_kv_bits=8)
    words = find_alignment(params, cfg8, tok, tok.encode(" hello world"),
                           np.asarray(mel[0]), num_frames=3000)
    assert words


def test_int8_kv_beam_search(tiny):
    """Beam search gathers the int8 KV cache dicts transparently."""
    params, config, tok, mel = tiny
    cfg8 = dataclasses.replace(config, kv_bits=8, self_kv_bits=8)
    r = decode(params, mel, tok, cfg8, DecodingOptions(sample_len=8, beam_size=2))
    assert len(r) == 2
    assert all(x.tokens for x in r)


def test_ancestry_attention_equals_gathered():
    """attention_*_ancestry == attention over the parent-gathered cache.

    The beam indirection cache (decoding/beam.py r3) claims exact
    equivalence to the old whole-cache gather; pin it directly: build a
    random ancestry (each lane's history maps to arbitrary owning lanes),
    materialize the gathered per-hypothesis cache it encodes, and compare.
    """
    import jax
    import jax.numpy as jnp

    from whisper_mlx_tpu.ops.kv_quant import (
        attention_fp_ancestry,
        attention_int8_ancestry,
        attention_int8_auto,
    )

    N, B, H, HD, T = 2, 3, 4, 16, 32
    NB = N * B
    pos = 20
    kr = jax.random.PRNGKey(5)
    q = jax.random.normal(jax.random.fold_in(kr, 0), (NB, H, 1, HD), jnp.float32)
    k8 = jax.random.randint(jax.random.fold_in(kr, 1), (NB, H, HD, T), -127, 127, jnp.int8)
    v8 = jax.random.randint(jax.random.fold_in(kr, 2), (NB, H, HD, T), -127, 127, jnp.int8)
    ks = jax.random.uniform(jax.random.fold_in(kr, 3), (NB, H, T, 1), jnp.float32, 0.01, 0.1)
    vs = jax.random.uniform(jax.random.fold_in(kr, 4), (NB, H, T, 1), jnp.float32, 0.01, 0.1)
    anc = jax.random.randint(jax.random.fold_in(kr, 5), (NB, T), 0, B, jnp.int32)

    got = attention_int8_ancestry(q, k8, ks, v8, vs, anc, jnp.int32(pos), B)

    # materialize the gathered cache the ancestry encodes, lane by lane
    rows = []
    for n in range(N):
        for b in range(B):
            lane = n * B + b
            src = n * B + np.asarray(anc[lane])  # (T,) flat source lanes
            rows.append({
                "k8": np.asarray(k8)[src, :, :, np.arange(T)],  # (T, H, HD)
                "v8": np.asarray(v8)[src, :, :, np.arange(T)],
                "ks": np.asarray(ks)[src, :, np.arange(T), :],  # (T, H, 1)
                "vs": np.asarray(vs)[src, :, np.arange(T), :],
            })
    g_k8 = jnp.asarray(np.stack([r["k8"] for r in rows]).transpose(0, 2, 3, 1))
    g_v8 = jnp.asarray(np.stack([r["v8"] for r in rows]).transpose(0, 2, 3, 1))
    g_ks = jnp.asarray(np.stack([r["ks"] for r in rows]).transpose(0, 2, 1, 3))
    g_vs = jnp.asarray(np.stack([r["vs"] for r in rows]).transpose(0, 2, 1, 3))
    want = attention_int8_auto(q, g_k8, g_ks, g_v8, g_vs, pos=pos, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # fp twin (raw-q convention: scales applied inside both paths)
    from whisper_mlx_tpu.models.whisper import attention

    kf = jax.random.normal(jax.random.fold_in(kr, 6), (NB, H, T, HD), jnp.float32)
    vf = jax.random.normal(jax.random.fold_in(kr, 7), (NB, H, T, HD), jnp.float32)
    got_fp = attention_fp_ancestry(q, kf, vf, anc, jnp.int32(pos), B)
    g_kf, g_vf = [], []
    for n in range(N):
        for b in range(B):
            lane = n * B + b
            src = n * B + np.asarray(anc[lane])
            g_kf.append(np.asarray(kf)[src, :, np.arange(T), :])
            g_vf.append(np.asarray(vf)[src, :, np.arange(T), :])
    g_kf = jnp.asarray(np.stack(g_kf).transpose(0, 2, 1, 3))
    g_vf = jnp.asarray(np.stack(g_vf).transpose(0, 2, 1, 3))
    k_idx = jnp.arange(T)[None, :]
    mask = jnp.where(k_idx <= pos, 0.0, -jnp.inf)
    want_fp, _ = attention(q, g_kf, g_vf, mask)
    np.testing.assert_allclose(np.asarray(got_fp), np.asarray(want_fp),
                               rtol=2e-5, atol=2e-5)


def test_int4_kv_decode_matches_shape_and_quality(tiny):
    """kv_bits=4 (native s4 cross cache): serving default — decodes must
    stay within the same quality envelope as int8 (docs/kv_quant_study.md)."""
    params, config, tok, mel = tiny
    cfg4 = dataclasses.replace(config, kv_bits=4, self_kv_bits=8)
    r_fp = decode(params, mel, tok, config, DecodingOptions(sample_len=12))
    r_q = decode(params, mel, tok, cfg4, DecodingOptions(sample_len=12))
    for a, b in zip(r_fp, r_q):
        assert abs(a.avg_logprob - b.avg_logprob) < 0.2
        assert b.tokens, "int4-kv decode empty"


def test_int4_kv_beam_search(tiny):
    """Beam + ancestry cache over the int4 cross / int8 self caches."""
    params, config, tok, mel = tiny
    cfg4 = dataclasses.replace(config, kv_bits=4, self_kv_bits=8)
    r = decode(params, mel, tok, cfg4, DecodingOptions(sample_len=8, beam_size=2))
    assert len(r) == 2
    assert all(x.tokens for x in r)


def test_beamflat_attention_equals_gathered():
    """attention_*_beamflat == attention over the parent-gathered cache.

    The lane-interleaved flat beam cache (decoding/beam.py r3) must be
    EXACTLY the gathered attention: build a random ancestry, interleave
    the per-lane cache into the flat layout (column t*B + k = lane k's
    position t), and compare against the materialized gathered cache.
    """
    import jax
    import jax.numpy as jnp

    from whisper_mlx_tpu.ops.kv_quant import (
        attention_fp_beamflat,
        attention_int8_auto,
        attention_int8_beamflat,
    )

    N, B, H, HD, T = 2, 3, 4, 16, 32
    NB = N * B
    pos = 20
    kr = jax.random.PRNGKey(11)
    q = jax.random.normal(jax.random.fold_in(kr, 0), (NB, H, 1, HD), jnp.float32)
    k8 = jax.random.randint(jax.random.fold_in(kr, 1), (NB, H, HD, T), -127, 127, jnp.int8)
    v8 = jax.random.randint(jax.random.fold_in(kr, 2), (NB, H, HD, T), -127, 127, jnp.int8)
    ks = jax.random.uniform(jax.random.fold_in(kr, 3), (NB, H, T, 1), jnp.float32, 0.01, 0.1)
    vs = jax.random.uniform(jax.random.fold_in(kr, 4), (NB, H, T, 1), jnp.float32, 0.01, 0.1)
    anc = jax.random.randint(jax.random.fold_in(kr, 5), (NB, T), 0, B, jnp.int32)

    def flat_kv(a):  # (NB, H, HD, T) -> (N, H, HD, T*B)
        return jnp.asarray(np.asarray(a).reshape(N, B, H, HD, T)
                           .transpose(0, 2, 3, 4, 1).reshape(N, H, HD, T * B))

    def flat_s(s):  # (NB, H, T, 1) -> (N, H, T*B, 1)
        return jnp.asarray(np.asarray(s)[..., 0].reshape(N, B, H, T)
                           .transpose(0, 2, 3, 1).reshape(N, H, T * B)[..., None])

    got = attention_int8_beamflat(q, flat_kv(k8), flat_s(ks), flat_kv(v8),
                                  flat_s(vs), anc, jnp.int32(pos), B)

    rows = []
    for n in range(N):
        for b in range(B):
            lane = n * B + b
            src = n * B + np.asarray(anc[lane])  # (T,) flat source lanes
            rows.append({
                "k8": np.asarray(k8)[src, :, :, np.arange(T)],  # (T, H, HD)
                "v8": np.asarray(v8)[src, :, :, np.arange(T)],
                "ks": np.asarray(ks)[src, :, np.arange(T), :],
                "vs": np.asarray(vs)[src, :, np.arange(T), :],
            })
    g_k8 = jnp.asarray(np.stack([r["k8"] for r in rows]).transpose(0, 2, 3, 1))
    g_v8 = jnp.asarray(np.stack([r["v8"] for r in rows]).transpose(0, 2, 3, 1))
    g_ks = jnp.asarray(np.stack([r["ks"] for r in rows]).transpose(0, 2, 1, 3))
    g_vs = jnp.asarray(np.stack([r["vs"] for r in rows]).transpose(0, 2, 1, 3))
    want = attention_int8_auto(q, g_k8, g_ks, g_v8, g_vs, pos=pos, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # fp twin
    from whisper_mlx_tpu.models.whisper import attention

    kf = jax.random.normal(jax.random.fold_in(kr, 6), (NB, H, T, HD), jnp.float32)
    vf = jax.random.normal(jax.random.fold_in(kr, 7), (NB, H, T, HD), jnp.float32)

    def flat_fp(a):  # (NB, H, T, HD) -> (N, H, T*B, HD)
        return jnp.asarray(np.asarray(a).reshape(N, B, H, T, HD)
                           .transpose(0, 2, 3, 1, 4).reshape(N, H, T * B, HD))

    got_fp = attention_fp_beamflat(q, flat_fp(kf), flat_fp(vf), anc,
                                   jnp.int32(pos), B)
    g_kf, g_vf = [], []
    for n in range(N):
        for b in range(B):
            lane = n * B + b
            src = n * B + np.asarray(anc[lane])
            g_kf.append(np.asarray(kf)[src, :, np.arange(T), :])
            g_vf.append(np.asarray(vf)[src, :, np.arange(T), :])
    g_kf = jnp.asarray(np.stack(g_kf).transpose(0, 2, 1, 3))
    g_vf = jnp.asarray(np.stack(g_vf).transpose(0, 2, 1, 3))
    k_idx = jnp.arange(T)[None, :]
    mask = jnp.where(k_idx <= pos, 0.0, -jnp.inf)
    want_fp, _ = attention(q, g_kf, g_vf, mask)
    np.testing.assert_allclose(np.asarray(got_fp), np.asarray(want_fp),
                               rtol=2e-5, atol=2e-5)


def test_tmajor_attention_matches_auto():
    """attention_int8_tmajor == attention_int8_auto on the same quantized
    cache, both tq==1 (decode step) and tq>1 (prefill), fp32 tolerance."""
    from whisper_mlx_tpu.ops.kv_quant import attention_int8_auto, attention_int8_tmajor

    rng = np.random.default_rng(3)
    b, h, T, d = 2, 4, 32, 16
    k8 = rng.integers(-127, 128, size=(b, h, T, d)).astype(np.int8)
    v8 = rng.integers(-127, 128, size=(b, h, T, d)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, size=(b, h, T, 1)).astype(np.float32)
    vs = rng.uniform(0.01, 0.1, size=(b, h, T, 1)).astype(np.float32)
    k8t = jnp.swapaxes(jnp.asarray(k8), 2, 3)
    v8t = jnp.swapaxes(jnp.asarray(v8), 2, 3)
    kT = jnp.asarray(k8.transpose(2, 0, 1, 3).reshape(T, b, h * d))
    vT = jnp.asarray(v8.transpose(2, 0, 1, 3).reshape(T, b, h * d))
    ksT = jnp.asarray(ks[..., 0].transpose(2, 0, 1))
    vsT = jnp.asarray(vs[..., 0].transpose(2, 0, 1))

    for tq, pos in [(1, 7), (1, T - 1), (5, 3)]:
        q = jnp.asarray(rng.standard_normal((b, h, tq, d)).astype(np.float32) * 0.3)
        ref = np.asarray(attention_int8_auto(
            q, k8t, jnp.asarray(ks), v8t, jnp.asarray(vs),
            pos=jnp.int32(pos), causal=True))
        out = np.asarray(attention_int8_tmajor(
            q, kT, ksT, vT, vsT, pos=jnp.int32(pos)))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_tmajor_layout_decode_token_identical(tiny):
    """Full decode with the time-major self cache == time-minor tokens."""
    params, config, tok, mel = tiny
    base = dataclasses.replace(config, kv_bits=8, self_kv_bits=8)
    tmaj = dataclasses.replace(base, self_kv_layout="tmajor")
    r_min = decode(params, mel, tok, base, DecodingOptions(sample_len=12))
    r_maj = decode(params, mel, tok, tmaj, DecodingOptions(sample_len=12))
    for a, b in zip(r_min, r_maj):
        assert a.tokens == b.tokens
        assert abs(a.avg_logprob - b.avg_logprob) < 1e-3


def test_tmajor_layout_beam_falls_back(tiny):
    """Beam search under tmajor config still works (forces its own layout)."""
    params, config, tok, mel = tiny
    cfg = dataclasses.replace(config, kv_bits=8, self_kv_bits=8,
                              self_kv_layout="tmajor")
    r = decode(params, mel, tok, cfg, DecodingOptions(sample_len=8, beam_size=2))
    assert len(r) == 2
    assert all(x.tokens for x in r)


def test_tmajor_phase_ladder_token_identical(tiny):
    """Growing-cache phase ladder (64/128/192) == single-allocation decode."""
    import os

    params, config, tok, mel = tiny
    tmaj = dataclasses.replace(config, kv_bits=8, self_kv_bits=8,
                               self_kv_layout="tmajor")
    # sample_len=140 crosses the 64 and 128 phase boundaries
    opts = DecodingOptions(sample_len=140)
    r_ladder = decode(params, mel, tok, tmaj, opts)
    os.environ["WTPU_SELF_PHASES"] = ""  # single phase, exact horizon
    try:
        r_flat = decode(params, mel, tok, tmaj, opts)
    finally:
        del os.environ["WTPU_SELF_PHASES"]
    for a, b in zip(r_ladder, r_flat):
        assert a.tokens == b.tokens
        assert abs(a.avg_logprob - b.avg_logprob) < 1e-3


def test_tmajor_cross_attention_matches_grouped_and_auto():
    """tmajor cross (plain + grouped) == the time-minor reference paths."""
    from whisper_mlx_tpu.ops.kv_quant import (
        attention_int8_auto,
        attention_int8_grouped,
        attention_int8_tmajor_cross,
        attention_int8_tmajor_grouped,
    )

    rng = np.random.default_rng(4)
    n, g, h, T, d = 2, 3, 4, 24, 16
    b = n * g
    k8 = rng.integers(-127, 128, size=(n, h, T, d)).astype(np.int8)
    v8 = rng.integers(-127, 128, size=(n, h, T, d)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, size=(n, h, T, 1)).astype(np.float32)
    vs = rng.uniform(0.01, 0.1, size=(n, h, T, 1)).astype(np.float32)
    kT = jnp.asarray(k8.transpose(2, 0, 1, 3).reshape(T, n, h * d))
    vT = jnp.asarray(v8.transpose(2, 0, 1, 3).reshape(T, n, h * d))
    ksT = jnp.asarray(ks[..., 0].transpose(2, 0, 1))
    vsT = jnp.asarray(vs[..., 0].transpose(2, 0, 1))
    k8t = jnp.swapaxes(jnp.asarray(k8), 2, 3)
    v8t = jnp.swapaxes(jnp.asarray(v8), 2, 3)

    # plain (n == b rows): tq 1 and 4
    for tq in (1, 4):
        q = jnp.asarray(rng.standard_normal((n, h, tq, d)).astype(np.float32) * 0.3)
        ref = np.asarray(attention_int8_auto(
            q, k8t, jnp.asarray(ks), v8t, jnp.asarray(vs), valid_len=T))
        out = np.asarray(attention_int8_tmajor_cross(q, kT, ksT, vT, vsT))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    # grouped: g rows share each window's cache; tq 1 and 4
    for tq in (1, 4):
        q5 = jnp.asarray(
            rng.standard_normal((n, g, h, tq, d)).astype(np.float32) * 0.3)
        ref = np.asarray(attention_int8_grouped(
            q5, k8t, jnp.asarray(ks), v8t, jnp.asarray(vs), valid_len=T))
        out = np.asarray(attention_int8_tmajor_grouped(q5, kT, ksT, vT, vsT))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_tmajor_cross_decode_token_identical(tiny):
    """decode() with kv_layout=tmajor == tminor tokens (greedy + best_of + beam)."""
    params, config, tok, mel = tiny
    base = dataclasses.replace(config, kv_bits=8, self_kv_bits=8)
    tmaj = dataclasses.replace(base, kv_layout="tmajor")
    r_min = decode(params, mel, tok, base, DecodingOptions(sample_len=12))
    r_maj = decode(params, mel, tok, tmaj, DecodingOptions(sample_len=12))
    for a, b in zip(r_min, r_maj):
        assert a.tokens == b.tokens
    # beam (grouped cross) under tmajor
    r_beam = decode(params, mel, tok, tmaj,
                    DecodingOptions(sample_len=8, beam_size=2))
    assert len(r_beam) == 2 and all(x.tokens for x in r_beam)
    # best_of sampling path (grouped cross, temperature > 0)
    r_bo = decode(params, mel, tok, tmaj,
                  DecodingOptions(sample_len=8, temperature=0.7, best_of=2))
    assert len(r_bo) == 2


# ---------------------------------------------------------------------------
# integer-MXU attention (attention_int8_mxu / _grouped_mxu / beamflat mxu):
# s8×s8 dots with dynamic q / w·vs rounding — close to the einsum path
# within the documented rounding noise, plus full-decode integration
# ---------------------------------------------------------------------------


def _rel_err(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9))


def test_attention_mxu_close_to_einsum_path():
    from whisper_mlx_tpu.ops.kv_quant import (
        attention_int8_auto,
        attention_int8_mxu,
    )

    rng = np.random.default_rng(0)
    b, h, d, tk = 3, 4, 64, 200
    q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, tk, d)), jnp.float32)
    for bits in (8, 4):
        k8, ks = quantize_kv(k, bits=bits)
        v8, vs = quantize_kv(v, bits=bits)
        k8t, v8t = jnp.swapaxes(k8, 2, 3), jnp.swapaxes(v8, 2, 3)
        ref = attention_int8_auto(q, k8t, ks, v8t, vs, valid_len=190)
        got = attention_int8_mxu(q, k8t, ks, v8t, vs, valid_len=190)
        assert _rel_err(ref, got) < 0.03, bits
        ref = attention_int8_auto(q, k8t, ks, v8t, vs, pos=jnp.int32(120),
                                  causal=True)
        got = attention_int8_mxu(q, k8t, ks, v8t, vs, pos=jnp.int32(120),
                                 causal=True)
        assert _rel_err(ref, got) < 0.03, bits


def test_attention_grouped_mxu_close_to_grouped():
    from whisper_mlx_tpu.ops.kv_quant import (
        attention_int8_grouped,
        attention_int8_grouped_mxu,
    )

    rng = np.random.default_rng(1)
    n, g, h, d, tk = 2, 5, 4, 64, 160
    q5 = jnp.asarray(rng.standard_normal((n, g, h, 1, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((n, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, h, tk, d)), jnp.float32)
    k8, ks = quantize_kv(k, bits=8)
    v8, vs = quantize_kv(v, bits=8)
    k8t, v8t = jnp.swapaxes(k8, 2, 3), jnp.swapaxes(v8, 2, 3)
    ref = attention_int8_grouped(q5, k8t, ks, v8t, vs, valid_len=150)
    got = attention_int8_grouped_mxu(q5, k8t, ks, v8t, vs, valid_len=150)
    assert _rel_err(ref, got) < 0.03


def test_attention_beamflat_mxu_close_to_flat():
    from whisper_mlx_tpu.ops.kv_quant import (
        attention_int8_beamflat,
        quantize_kv as _qkv,
    )

    rng = np.random.default_rng(2)
    n, g, h, d, T = 2, 5, 4, 64, 32
    NB, J = n * g, T * g
    q = jnp.asarray(rng.standard_normal((NB, h, 1, d)), jnp.float32) * 0.3
    k8 = jnp.asarray(rng.integers(-127, 128, (n, h, d, J)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (n, h, d, J)), jnp.int8)
    ks = jnp.asarray(np.abs(rng.standard_normal((n, h, J, 1))) * 0.02 + 1e-3,
                     jnp.bfloat16)
    vs = jnp.asarray(np.abs(rng.standard_normal((n, h, J, 1))) * 0.02 + 1e-3,
                     jnp.bfloat16)
    anc = jnp.asarray(rng.integers(0, g, (NB, T)), jnp.int32)
    pos = jnp.int32(T - 2)
    ref = attention_int8_beamflat(q, k8, ks, v8, vs, anc, pos, g)
    got = attention_int8_beamflat(q, k8, ks, v8, vs, anc, pos, g, mxu=True)
    assert _rel_err(ref, got) < 0.05


def test_attn_mxu_full_decode(tiny):
    """Greedy + beam decode run end-to-end with attn_mxu=True and produce
    valid results (token-level equality is NOT expected — the dynamic q /
    w·vs rounding perturbs logits within the studied band)."""
    params, config, tok, mel = tiny
    cfg = dataclasses.replace(config, kv_bits=8, self_kv_bits=8,
                              attn_mxu=True)
    res = decode(params, mel, tok, cfg, DecodingOptions(sample_len=8))
    assert len(res) == 2 and all(r.tokens for r in res)
    res_b = decode(params, mel, tok, cfg,
                   DecodingOptions(sample_len=8, beam_size=3))
    assert len(res_b) == 2 and all(r.tokens for r in res_b)
