"""Architecture parity vs the transformers torch Whisper oracle.

No pretrained weights exist offline (zero egress), so parity is proven the
stronger way: a randomly initialized torch WhisperModel is converted through
the real checkpoint loader (checkpoint/hf_loader.py) and must produce the
same encoder states and decoder logits as our JAX graph — this validates the
model math AND the loader's weight mapping at once. This mirrors the
reference's golden-output strategy (SURVEY.md §4) at the tensor level.
"""

import numpy as np
import pytest

# torch must be imported before jax does real work in this process (OpenMP
# clash observed in this image); conftest already pinned JAX to CPU.
import torch  # noqa: F401  (import order matters)
import jax.numpy as jnp

from whisper_mlx_tpu.checkpoint.hf_loader import config_from_hf, convert_hf_whisper_state
from whisper_mlx_tpu.models.whisper import (
    cross_kv,
    decode_step,
    encode,
    init_kv_cache,
    init_params,
    WHISPER_CONFIGS,
)

TINY_HF = dict(
    vocab_size=2000,
    num_mel_bins=80,
    d_model=64,
    encoder_layers=2,
    encoder_attention_heads=4,
    decoder_layers=2,
    decoder_attention_heads=4,
    encoder_ffn_dim=256,
    decoder_ffn_dim=256,
    max_source_positions=1500,
    max_target_positions=448,
    pad_token_id=0,
    bos_token_id=1,
    eos_token_id=2,
    decoder_start_token_id=1,
)


@pytest.fixture(scope="module", autouse=True)
def _x64():
    # fp64 on both sides turns accumulation-order noise (~1e-3 between oneDNN
    # and XLA in fp32) into a decisive <1e-9 parity bound.
    import jax

    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def oracle():
    import dataclasses

    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperModel

    torch.manual_seed(0)
    model = WhisperModel(HFConfig(**TINY_HF)).double().eval()
    config = dataclasses.replace(config_from_hf(TINY_HF), dtype=jnp.float64)
    params = convert_hf_whisper_state(model.state_dict(), config, dtype=jnp.float64)
    return model, params, config


def test_encoder_parity(oracle):
    model, params, config = oracle
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 3000, config.n_mels))
    with torch.no_grad():
        ref = model.encoder(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state.numpy()
    ours = np.asarray(encode(params, jnp.asarray(mel), config))
    assert ours.shape == ref.shape == (2, 1500, config.n_audio_state)
    np.testing.assert_allclose(ours, ref, atol=1e-9, rtol=1e-9)


def test_decoder_prefill_parity(oracle):
    model, params, config = oracle
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 3000, config.n_mels))
    tokens = rng.integers(0, config.n_vocab, size=(1, 7))
    with torch.no_grad():
        enc_out = model.encoder(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state
        dec = model.decoder(
            input_ids=torch.from_numpy(tokens), encoder_hidden_states=enc_out
        ).last_hidden_state
        ref_logits = (dec @ model.decoder.embed_tokens.weight.T).numpy()

    audio_states = encode(params, jnp.asarray(mel), config)
    xkv = cross_kv(params, audio_states, config)
    cache = init_kv_cache(config, batch=1)
    logits, cache, _ = decode_step(
        params, jnp.asarray(tokens), jnp.int32(0), cache, xkv, config
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-8, rtol=1e-8)


def test_incremental_matches_prefill(oracle):
    """KV-cached one-token steps must equal a single full prefill pass."""
    _, params, config = oracle
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 3000, config.n_mels)).astype(np.float32)
    tokens = rng.integers(0, config.n_vocab, size=(1, 6))

    audio_states = encode(params, jnp.asarray(mel), config)
    xkv = cross_kv(params, audio_states, config)

    full_logits, _, _ = decode_step(
        params, jnp.asarray(tokens), jnp.int32(0), init_kv_cache(config, 1), xkv, config
    )

    cache = init_kv_cache(config, 1)
    step_logits = []
    for t in range(tokens.shape[1]):
        lg, cache, _ = decode_step(
            params, jnp.asarray(tokens[:, t : t + 1]), jnp.int32(t), cache, xkv, config
        )
        step_logits.append(np.asarray(lg)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), atol=1e-4, rtol=1e-4)


def test_cross_attention_export(oracle):
    _, params, config = oracle
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((1, 3000, config.n_mels)).astype(np.float32)
    tokens = rng.integers(0, config.n_vocab, size=(1, 5))
    audio_states = encode(params, jnp.asarray(mel), config)
    xkv = cross_kv(params, audio_states, config)
    _, _, cross = decode_step(
        params, jnp.asarray(tokens), jnp.int32(0),
        init_kv_cache(config, 1), xkv, config, collect_cross_attn=True,
    )
    assert cross.shape == (config.n_text_layer, 1, config.n_text_head, 5, 1500)
    s = np.asarray(jnp.sum(cross, axis=-1))
    np.testing.assert_allclose(s, np.ones_like(s), atol=1e-5)


def test_configs_cover_model_family():
    # the reference serves large-v3 (reference run:4); family must be complete
    for name in ("tiny", "base", "small", "medium", "large-v2", "large-v3", "large-v3-turbo"):
        assert name in WHISPER_CONFIGS
    assert WHISPER_CONFIGS["large-v3"].n_mels == 128
    assert WHISPER_CONFIGS["large-v3-turbo"].n_text_layer == 4


def test_init_params_structure_matches_loader(oracle):
    _, loaded, config = oracle
    import jax

    ours = init_params(config)
    ls = jax.tree.structure(loaded)
    os_ = jax.tree.structure(ours)
    assert ls == os_
