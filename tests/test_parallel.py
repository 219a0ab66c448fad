"""Sharding correctness on the virtual 8-device CPU mesh.

The invariant that matters: DP×TP-sharded execution produces EXACTLY the
tokens of single-device execution (GSPMD only changes layout, not math —
modulo reduction order, which argmax token selection is robust to here).
"""

import numpy as np
import pytest

import torch  # noqa: F401
import jax
import jax.numpy as jnp

from whisper_mlx_tpu.decoding.task import DecodingOptions, decode
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
from whisper_mlx_tpu.models.whisper import WhisperConfig, encode, init_params
from whisper_mlx_tpu.parallel.mesh import make_mesh
from whisper_mlx_tpu.parallel.sharding import shard_batch, shard_params


@pytest.fixture(scope="module")
def tiny():
    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(config, seed=0)
    rng = np.random.default_rng(7)
    # batch 8: divisible by every dp size tested (8, 2, 1)
    mel = rng.standard_normal((8, 3000, 80)).astype(np.float32)
    return params, config, tok, mel


def test_eight_virtual_devices():
    assert jax.device_count() == 8, "conftest must provide 8 virtual CPU devices"


def test_mesh_construction():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=3)


@pytest.mark.parametrize("dp,tp", [(8, 1), (2, 4), (1, 8)])
def test_sharded_decode_matches_single_device(tiny, dp, tp):
    params, config, tok, mel = tiny
    base = decode(params, jnp.asarray(mel), tok, config, DecodingOptions(sample_len=16))

    mesh = make_mesh(dp=dp, tp=tp)
    p_sh = shard_params(params, mesh)
    mel_sh = shard_batch(jnp.asarray(mel), mesh)
    sharded = decode(p_sh, mel_sh, tok, config, DecodingOptions(sample_len=16))

    assert [r.tokens for r in base] == [r.tokens for r in sharded]
    for rb, rs in zip(base, sharded):
        np.testing.assert_allclose(rb.avg_logprob, rs.avg_logprob, atol=1e-4)


def test_sharded_decode_int8_kv_matches_single_device(tiny):
    """The serving default (int8 cross+self KV, time-minor caches) must be
    token-identical under DP×TP sharding — the transposed int8 cache
    tensors are sharded data like any other (GSPMD layout only)."""
    import dataclasses

    params, config, tok, mel = tiny
    config = dataclasses.replace(config, kv_bits=8, self_kv_bits=8)
    base = decode(params, jnp.asarray(mel), tok, config, DecodingOptions(sample_len=16))
    mesh = make_mesh(dp=4, tp=2)
    p_sh = shard_params(params, mesh)
    mel_sh = shard_batch(jnp.asarray(mel), mesh)
    sharded = decode(p_sh, mel_sh, tok, config, DecodingOptions(sample_len=16))
    for b, s in zip(base, sharded):
        assert b.tokens == s.tokens


def test_sharded_encoder_states_match(tiny):
    params, config, tok, mel = tiny
    ref = np.asarray(encode(params, jnp.asarray(mel), config))
    mesh = make_mesh(dp=2, tp=4)
    out = np.asarray(encode(shard_params(params, mesh), shard_batch(jnp.asarray(mel), mesh), config))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_sharded_qwen_decode_matches_single_device():
    """Megatron-TP-sharded Qwen decode must be token-identical to
    single-device (the LLM serving path for Qwen3-32B, which exceeds one
    chip's HBM)."""
    import jax.numpy as jnp

    from whisper_mlx_tpu.models.qwen import QwenConfig, decode_step, init_kv_cache, init_params
    from whisper_mlx_tpu.parallel.sharding_llm import shard_qwen_params

    config = QwenConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10_000.0, tie_word_embeddings=False, attention_bias=True,
    )
    params = init_params(config, seed=0)
    tokens = jnp.asarray([[5, 9, 200, 43]])

    cache = init_kv_cache(config, 1, max_len=16)
    ref_logits, _ = decode_step(params, tokens, jnp.int32(0), cache, config)

    mesh = make_mesh(dp=2, tp=4)
    p_sh = shard_qwen_params(params, mesh)
    cache = init_kv_cache(config, 1, max_len=16)
    sh_logits, _ = decode_step(p_sh, tokens, jnp.int32(0), cache, config)

    np.testing.assert_allclose(
        np.asarray(sh_logits), np.asarray(ref_logits), atol=1e-4, rtol=1e-4
    )
    assert np.array_equal(
        np.argmax(np.asarray(sh_logits), -1), np.argmax(np.asarray(ref_logits), -1)
    )


def test_sharded_quantized_qwen():
    """TP sharding composes with quantized (QuantTensor) params."""
    import jax.numpy as jnp

    from whisper_mlx_tpu.models.qwen import QwenConfig, decode_step, init_kv_cache, init_params
    from whisper_mlx_tpu.ops.quant import quantize_params
    from whisper_mlx_tpu.parallel.sharding_llm import shard_qwen_params

    config = QwenConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10_000.0, tie_word_embeddings=True, attention_bias=True,
    )
    params = init_params(config, seed=0)
    qlayers = quantize_params(
        {"encoder": {"layers": params["layers"]}, "decoder": {}},
        bits=8, group_size=64,
    )["encoder"]["layers"]
    qparams = dict(params, layers=qlayers)
    tokens = jnp.asarray([[1, 2, 3]])

    cache = init_kv_cache(config, 1, max_len=8)
    ref, _ = decode_step(qparams, tokens, jnp.int32(0), cache, config)

    mesh = make_mesh(dp=4, tp=2)
    p_sh = shard_qwen_params(qparams, mesh)
    cache = init_kv_cache(config, 1, max_len=8)
    sh, _ = decode_step(p_sh, tokens, jnp.int32(0), cache, config)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(ref), atol=1e-4)


def test_sharded_decode_tmajor_matches_single_device(tiny):
    """Time-major KV layouts (cross + self) stay token-identical under
    DP×TP sharding: the (T, b, h·d) caches put batch on dim 1, and GSPMD
    must propagate the batch sharding through the plane updates and the
    elementwise-stream attention."""
    import dataclasses

    params, config, tok, mel = tiny
    config = dataclasses.replace(config, kv_bits=8, self_kv_bits=8,
                                 kv_layout="tmajor", self_kv_layout="tmajor")
    base = decode(params, jnp.asarray(mel), tok, config, DecodingOptions(sample_len=16))
    mesh = make_mesh(dp=4, tp=2)
    p_sh = shard_params(params, mesh)
    mel_sh = shard_batch(jnp.asarray(mel), mesh)
    sharded = decode(p_sh, mel_sh, tok, config, DecodingOptions(sample_len=16))
    for b, s in zip(base, sharded):
        assert b.tokens == s.tokens
