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
