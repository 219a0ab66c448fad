"""Qwen model parity vs the transformers torch oracle (fp64, random init).

Same strategy as the whisper parity tests: the loader + model math must
reproduce torch logits at 1e-8 in fp64 for both Qwen2 (GQA+bias, RoPE) and
Qwen3 (qk-norm, head_dim≠hidden/heads) tiny configs.
"""

import dataclasses

import numpy as np
import pytest

import torch  # noqa: F401  — import before jax (see conftest)
import jax
import jax.numpy as jnp

from whisper_mlx_tpu.checkpoint.qwen_loader import config_from_hf, convert_hf_qwen_state
from whisper_mlx_tpu.models.qwen import QWEN_CONFIGS, decode_step, init_kv_cache, init_params

QWEN2_TINY = dict(
    model_type="qwen2", vocab_size=512, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    rope_theta=10_000.0, rms_norm_eps=1e-6, tie_word_embeddings=True,
    max_position_embeddings=512,
)
QWEN3_TINY = dict(
    model_type="qwen3", vocab_size=512, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32, rope_theta=1e6, rms_norm_eps=1e-6, tie_word_embeddings=False,
    max_position_embeddings=512,
)


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _build(tiny_cfg, hf_cls):
    torch.manual_seed(0)
    model = hf_cls(hf_cls.config_class(**tiny_cfg)).double().eval()
    config = dataclasses.replace(config_from_hf(tiny_cfg), dtype=jnp.float64)
    params = convert_hf_qwen_state(model.state_dict(), config, dtype=jnp.float64)
    return model, params, config


@pytest.mark.parametrize("tiny_cfg,model_name", [
    (QWEN2_TINY, "Qwen2ForCausalLM"),
    (QWEN3_TINY, "Qwen3ForCausalLM"),
])
def test_qwen_logits_parity(tiny_cfg, model_name):
    import transformers

    hf_cls = getattr(transformers, model_name)
    model, params, config = _build(tiny_cfg, hf_cls)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, tiny_cfg["vocab_size"], size=(2, 9))
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    cache = init_kv_cache(config, batch=2, max_len=32)
    logits, _ = decode_step(params, jnp.asarray(tokens), jnp.int32(0), cache, config)
    # 5e-7 bound: cos/sin for RoPE are fp32 in both stacks but torch's libm
    # and XLA differ by 1 ulp (~6e-8); everything else is fp64-exact
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-7, rtol=1e-5)


def test_qwen_incremental_matches_prefill():
    import transformers

    model, params, config = _build(QWEN2_TINY, transformers.Qwen2ForCausalLM)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 512, size=(1, 6))
    cache = init_kv_cache(config, 1, max_len=16)
    full, _ = decode_step(params, jnp.asarray(tokens), jnp.int32(0), cache, config)

    cache = init_kv_cache(config, 1, max_len=16)
    steps = []
    for t in range(6):
        lg, cache = decode_step(params, jnp.asarray(tokens[:, t : t + 1]), jnp.int32(t), cache, config)
        steps.append(np.asarray(lg)[:, 0])
    np.testing.assert_allclose(np.stack(steps, 1), np.asarray(full), atol=1e-10)


def test_config_table_covers_reference_models():
    # reference llm.py:31-35 exposes small/medium/large = 7B/14B/32B
    for name in ("qwen2.5-7b", "qwen2.5-14b", "qwen3-32b"):
        assert name in QWEN_CONFIGS
    assert QWEN_CONFIGS["qwen3-32b"].qk_norm
    assert QWEN_CONFIGS["qwen3-32b"].num_hidden_layers == 64


def test_quantized_qwen_decode():
    from whisper_mlx_tpu.ops.quant import quantize_params

    config = dataclasses.replace(
        config_from_hf(QWEN2_TINY), dtype=jnp.float32
    )
    params = init_params(config, seed=0)
    # quantize the transformer linears (reuses the whisper-generic walker on
    # the layers subtree)
    qlayers = quantize_params({"encoder": {"layers": params["layers"]}, "decoder": {}},
                              bits=8, group_size=64)["encoder"]["layers"]
    qparams = dict(params, layers=qlayers)
    tokens = jnp.asarray([[1, 2, 3]])
    cache = init_kv_cache(config, 1, max_len=8)
    lg_fp, _ = decode_step(params, tokens, jnp.int32(0), cache, config)
    cache = init_kv_cache(config, 1, max_len=8)
    lg_q, _ = decode_step(qparams, tokens, jnp.int32(0), cache, config)
    # int8 grouped quantization keeps logits close
    assert np.abs(np.asarray(lg_fp) - np.asarray(lg_q)).max() < 0.5


def test_qwen_flash_prefill_matches_xla():
    """flash_attention prefill ≈ XLA attention prefill (interpret kernel)."""
    from unittest import mock

    from whisper_mlx_tpu.ops import flash_attention as fa

    config = dataclasses.replace(config_from_hf(QWEN2_TINY), dtype=jnp.float32)
    params = init_params(config, seed=0)
    tokens = jnp.asarray([[5, 9, 200, 43, 17, 3, 88, 101]])

    cache = init_kv_cache(config, 1, max_len=16)
    ref, _ = decode_step(params, tokens, jnp.int32(0), cache, config)

    orig = fa.flash_attention

    def interp(q, k, v, **kw):
        kw["interpret"] = True
        kw["tile_q"] = 8
        kw["tile_k"] = 128
        return orig(q, k, v, **kw)

    cfg_flash = dataclasses.replace(config, flash_attention=True)
    cache = init_kv_cache(cfg_flash, 1, max_len=16)
    with mock.patch.object(fa, "flash_attention", interp):
        out, _ = decode_step(params, tokens, jnp.int32(0), cache, cfg_flash)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_int8_kv_cache_matches_bf16_tokens():
    """kv_bits=8 (per-position absmax scales folded exactly into attention,
    models/qwen.py) must pick the same greedy tokens as the fp cache over
    several steps; logits stay within int8 KV rounding (~1%)."""
    import dataclasses

    from whisper_mlx_tpu.models import qwen

    cfg = dataclasses.replace(
        qwen.QWEN_CONFIGS["qwen2.5-7b"], hidden_size=128, intermediate_size=192,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, vocab_size=512, dtype=jnp.float32,
    )
    cfg8 = dataclasses.replace(cfg, kv_bits=8)
    params = qwen.init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 512, (2, 6)), jnp.int32)
    l0, c0 = qwen.decode_step(params, toks, jnp.int32(0),
                              qwen.init_kv_cache(cfg, 2, 32), cfg)
    l8, c8 = qwen.decode_step(params, toks, jnp.int32(0),
                              qwen.init_kv_cache(cfg8, 2, 32), cfg8)
    for step in range(3):
        nxt0 = jnp.argmax(l0[:, -1], -1).astype(jnp.int32)[:, None]
        nxt8 = jnp.argmax(l8[:, -1], -1).astype(jnp.int32)[:, None]
        assert (np.asarray(nxt0) == np.asarray(nxt8)).all()
        l0, c0 = qwen.decode_step(params, nxt0, jnp.int32(6 + step), c0, cfg)
        l8, c8 = qwen.decode_step(params, nxt8, jnp.int32(6 + step), c8, cfg8)
    rel = float(jnp.max(jnp.abs(l0 - l8)) / jnp.max(jnp.abs(l0)))
    assert rel < 0.05, rel

    # per-row positions (continuous batching) run on the int8 cache too
    pos = jnp.asarray([2, 5], jnp.int32)
    lp, _ = qwen.decode_step(params, toks[:, :1], pos, c8, cfg8)
    assert lp.shape == (2, 1, 512)
    assert np.isfinite(np.asarray(lp)).all()


def test_promoted_native_decode_matches_packed():
    """promote_resident_native (uint8-code residency for the per-step jit
    paths) must not change decode results vs the packed QuantTensor tree."""
    from whisper_mlx_tpu.ops.quant import promote_resident_native, quantize_params

    config = dataclasses.replace(config_from_hf(QWEN2_TINY), dtype=jnp.float32)
    params = init_params(config, seed=0)
    qlayers = quantize_params(
        {"encoder": {"layers": params["layers"]}, "decoder": {}},
        bits=4, group_size=64)["encoder"]["layers"]
    qparams = dict(params, layers=qlayers)
    nparams, promoted = promote_resident_native(qparams)
    assert promoted

    tokens = jnp.asarray([[1, 2, 3, 44]])
    lg_q, _ = decode_step(qparams, tokens, jnp.int32(0),
                          init_kv_cache(config, 1, max_len=8), config)
    lg_n, _ = decode_step(nparams, tokens, jnp.int32(0),
                          init_kv_cache(config, 1, max_len=8), config)
    scale = max(float(np.abs(np.asarray(lg_q)).max()), 1.0)
    np.testing.assert_allclose(np.asarray(lg_n), np.asarray(lg_q),
                               atol=1e-4 * scale)

    # budget gate: refuses when codes exceed the budget
    _, promoted_small = promote_resident_native(qparams, budget_bytes=1)
    assert not promoted_small
