"""End-to-end greedy generation parity vs transformers Whisper generate().

The closest offline proxy to golden-transcript parity (no pretrained
weights exist in this image): with identical random weights, suppress
lists, blank rule, timestamp grammar and greedy selection, OUR full jitted
decode loop must emit exactly the token sequence transformers' generation
stack emits. This exercises mel→encoder→KV-cached decoder→filters→argmax
end to end on both sides.
"""

import numpy as np
import pytest

import torch
import jax
import jax.numpy as jnp

from whisper_mlx_tpu.checkpoint.hf_loader import config_from_hf, convert_hf_whisper_state
from whisper_mlx_tpu.decoding.task import DecodingOptions, _resolve_suppress, decode
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer


@pytest.fixture(scope="module")
def oracle_model():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    tok = make_synthetic_tokenizer()
    hf_cfg = dict(
        vocab_size=tok.n_vocab, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4, decoder_layers=2,
        decoder_attention_heads=4, encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=tok.eot, bos_token_id=tok.eot, eos_token_id=tok.eot,
        decoder_start_token_id=tok.sot,
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(HFConfig(**hf_cfg)).eval()
    config = config_from_hf(hf_cfg)
    params = convert_hf_whisper_state(model.model.state_dict(), config)
    return model, params, config, tok


@pytest.mark.parametrize("seed", [3, 7, 11])
def test_greedy_generation_token_parity(oracle_model, seed):
    from transformers import GenerationConfig

    model, params, config, tok = oracle_model
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 3000, 80)).astype(np.float32)

    opts = DecodingOptions(sample_len=24)
    suppress = sorted(_resolve_suppress(opts, tok))
    blank = sorted(set(tok.encode(" ")))

    gen_cfg = GenerationConfig(
        max_new_tokens=24, num_beams=1, do_sample=False,
        decoder_start_token_id=tok.sot,
        eos_token_id=tok.eot, pad_token_id=tok.eot,
        suppress_tokens=suppress,
        begin_suppress_tokens=blank + [tok.eot],
        no_timestamps_token_id=tok.no_timestamps,
        max_initial_timestamp_index=50,
        forced_decoder_ids=[(1, tok.language_token("en")), (2, tok.transcribe)],
        return_timestamps=True,
    )
    with torch.no_grad():
        out = model.generate(
            torch.from_numpy(mel.transpose(0, 2, 1)),
            generation_config=gen_cfg,
        )
    hf_tokens = [t for t in out[0].tolist() if t < tok.eot or t >= tok.timestamp_begin]

    ours = decode(params, jnp.asarray(mel), tok, config, opts)[0]
    our_tokens = [t for t in ours.tokens if t < tok.eot or t >= tok.timestamp_begin]

    assert our_tokens == hf_tokens, (
        f"seed {seed}: generation diverged\nours: {our_tokens}\nHF:   {hf_tokens}"
    )
