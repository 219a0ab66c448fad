"""LLM generation engine: sampling, stop tokens, streaming, chat template."""

import numpy as np
import pytest

import torch  # noqa: F401
import jax
import jax.numpy as jnp

from whisper_mlx_tpu.decoding.llm_tokenizer import ByteFallbackTokenizer
from whisper_mlx_tpu.inference.generate import (
    LLMEngine,
    apply_chat_template,
    sample_token,
)
from whisper_mlx_tpu.models.qwen import QwenConfig, init_params


@pytest.fixture(scope="module")
def engine():
    tok = ByteFallbackTokenizer()
    config = QwenConfig(
        vocab_size=tok.vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10_000.0, tie_word_embeddings=True, attention_bias=True,
    )
    params = init_params(config, seed=0)
    return LLMEngine(params, config, tok, max_context=256)


def test_chat_template():
    s = apply_chat_template([
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
    ])
    assert s == (
        "<|im_start|>system\nbe brief<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\n<think>\n\n</think>\n\n"
    )


def test_generate_greedy_deterministic(engine):
    r1 = engine.generate("hello", max_tokens=12, temperature=0.0)
    r2 = engine.generate("hello", max_tokens=12, temperature=0.0)
    assert r1.tokens == r2.tokens
    assert r1.generation_tokens <= 12
    assert isinstance(r1.text, str)
    assert r1.prompt_tokens == 5


def test_generate_sampling_seeds_differ(engine):
    r1 = engine.generate("hello", max_tokens=12, temperature=1.0, seed=1)
    r2 = engine.generate("hello", max_tokens=12, temperature=1.0, seed=2)
    assert r1.tokens != r2.tokens


def test_stream_matches_generate(engine):
    full = engine.generate("abc", max_tokens=10, temperature=0.0)
    streamed = "".join(engine.stream_generate("abc", max_tokens=10, temperature=0.0))
    assert streamed == full.text


def test_chat_entry(engine):
    r = engine.chat([{"role": "user", "content": "hi"}], max_tokens=8, temperature=0.0)
    assert r.generation_tokens <= 8


def test_sample_token_top_k():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 0.0]])
    key = jax.random.PRNGKey(0)
    # top_k=1 at any temperature must select argmax
    for seed in range(5):
        t = sample_token(logits, jax.random.PRNGKey(seed), jnp.float32(2.0), top_k=1)
        assert int(t[0]) == 1


def test_sample_token_top_p():
    # one dominant token (p≈0.97): top_p=0.5 keeps only it
    logits = jnp.asarray([[10.0, 5.0, 1.0, 0.0]])
    for seed in range(5):
        t = sample_token(logits, jax.random.PRNGKey(seed), jnp.float32(1.0), top_p=0.5)
        assert int(t[0]) == 0


def test_stop_token_halts(engine):
    """Force the first sampled token to be a stop token via a rigged model:
    instead, verify generate() never emits a stop id in its output."""
    r = engine.generate("xyz", max_tokens=20, temperature=0.8, seed=3)
    stops = set(engine._stop_ids())
    assert not (set(r.tokens) & stops)


def test_engine_speculative_path_matches_plain():
    """LLMEngine with a draft configured (greedy) == without."""
    from whisper_mlx_tpu.models.qwen import QwenConfig as QC, init_params as qinit

    tok = ByteFallbackTokenizer()
    tcfg = QwenConfig(
        vocab_size=tok.vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10_000.0, tie_word_embeddings=True,
    )
    dcfg = QC(
        vocab_size=tok.vocab_size, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        rope_theta=10_000.0, tie_word_embeddings=True,
    )
    tparams = qinit(tcfg, seed=0)
    plain = LLMEngine(tparams, tcfg, tok, max_context=256)
    spec = LLMEngine(tparams, tcfg, tok, max_context=256,
                     draft=(qinit(dcfg, seed=5), dcfg))
    r_plain = plain.generate("hello there", max_tokens=16, temperature=0.0)
    r_spec = spec.generate("hello there", max_tokens=16, temperature=0.0)
    assert r_spec.tokens == r_plain.tokens
    # sampling requests bypass the speculative path
    r_sampled = spec.generate("hello there", max_tokens=8, temperature=0.9, seed=2)
    assert r_sampled.generation_tokens <= 8


def test_quantized_promoted_stream_matches_generate(monkeypatch):
    """Quantized engine with the OPT-IN uint8-code promotion
    (WTPU_NATIVE_RESIDENT=1): the per-step streaming jit over native codes
    must agree with the one-jit generate loop. (Default is off — the Pallas
    path measured faster e2e on the TPU; this pins the opt-in path's
    correctness.)"""
    import dataclasses

    from whisper_mlx_tpu.ops.quant import NativeQuantTensor, quantize_params

    monkeypatch.setenv("WTPU_NATIVE_RESIDENT", "1")

    tok = ByteFallbackTokenizer()
    config = QwenConfig(
        vocab_size=tok.vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10_000.0, tie_word_embeddings=True, attention_bias=True,
        dtype=jnp.float32,
    )
    params = init_params(config, seed=0)
    qlayers = quantize_params(
        {"encoder": {"layers": params["layers"]}, "decoder": {}},
        bits=4, group_size=64)["encoder"]["layers"]
    eng = LLMEngine(dict(params, layers=qlayers), config, tok, max_context=256)
    leaves = jax.tree_util.tree_leaves(
        eng.params, is_leaf=lambda n: isinstance(n, NativeQuantTensor))
    assert any(isinstance(x, NativeQuantTensor) for x in leaves)
    full = eng.generate("abc", max_tokens=10, temperature=0.0)
    streamed = "".join(eng.stream_generate("abc", max_tokens=10, temperature=0.0))
    # the stream withholds trailing incomplete UTF-8 bytes ('�'); everything
    # it does emit must match the one-jit loop exactly
    assert full.text.startswith(streamed)
    assert set(full.text[len(streamed):]) <= {"�"}


def test_quantized_mbt_resident_matches_packed(monkeypatch):
    """Quantized engine with the opt-in transposed DMA-ring residency
    (WTPU_MBT_RESIDENT=1, ops/quant_pallas_mb): linears ride the tree as
    QuantTensorT and generate() must emit the same tokens as the packed
    engine (off-TPU the dispatch dequant-falls-back; on-TPU the mbt
    kernel measured token-exact — bench_history r3)."""
    from whisper_mlx_tpu.ops.quant import quantize_params
    from whisper_mlx_tpu.ops.quant_pallas_mb import QuantTensorT

    tok = ByteFallbackTokenizer()
    config = QwenConfig(
        vocab_size=tok.vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10_000.0, tie_word_embeddings=True, attention_bias=True,
        dtype=jnp.float32,
    )
    params = init_params(config, seed=0)
    qlayers = quantize_params(
        {"encoder": {"layers": params["layers"]}, "decoder": {}},
        bits=4, group_size=64)["encoder"]["layers"]
    packed = LLMEngine(dict(params, layers=qlayers), config, tok,
                       max_context=256)
    ref = packed.generate("abc", max_tokens=10, temperature=0.0)

    monkeypatch.setenv("WTPU_MBT_RESIDENT", "1")
    eng = LLMEngine(dict(params, layers=qlayers), config, tok,
                    max_context=256)
    leaves = jax.tree_util.tree_leaves(
        eng.params, is_leaf=lambda n: isinstance(n, QuantTensorT))
    assert any(isinstance(x, QuantTensorT) for x in leaves)
    out = eng.generate("abc", max_tokens=10, temperature=0.0)
    assert out.text == ref.text


def test_quantized_a8_matches_packed(monkeypatch):
    """Quantized engine with the W8A8 serving opt-in (WTPU_QWEN_A8=1,
    ops/quant_a8): linears are re-quantized to per-channel-int8 A8Tensor
    at load and generate() must emit the same tokens as the packed engine
    (off-TPU the dispatch dequant-falls-back; on-TPU the a8 kernel is the
    84.9 tok/s r4 path, parity-tested in test_pallas_kernels)."""
    from whisper_mlx_tpu.ops.quant import quantize_params
    from whisper_mlx_tpu.ops.quant_a8 import A8Tensor

    tok = ByteFallbackTokenizer()
    config = QwenConfig(
        vocab_size=tok.vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10_000.0, tie_word_embeddings=True, attention_bias=True,
        dtype=jnp.float32,
    )
    params = init_params(config, seed=0)
    qlayers = quantize_params(
        {"encoder": {"layers": params["layers"]}, "decoder": {}},
        bits=4, group_size=64)["encoder"]["layers"]
    packed = LLMEngine(dict(params, layers=qlayers), config, tok,
                       max_context=256)
    ref = packed.generate("abc", max_tokens=10, temperature=0.0)

    monkeypatch.setenv("WTPU_QWEN_A8", "1")
    eng = LLMEngine(dict(params, layers=qlayers), config, tok,
                    max_context=256)
    leaves = jax.tree_util.tree_leaves(
        eng.params, is_leaf=lambda n: isinstance(n, A8Tensor))
    assert any(isinstance(x, A8Tensor) for x in leaves)
    out = eng.generate("abc", max_tokens=10, temperature=0.0)
    assert out.text == ref.text
