"""Differential oracle for the LONG-FORM seek loop vs transformers.

VERDICT r2 item 4 (the last offline rung under docs/wer_protocol.md §5):
transformers implements openai-compatible chunked long-form generation —
seek windows, timestamp-driven advance, temperature fallback, segment
extraction (transformers/models/whisper/generation_whisper.py). With
identical random weights and identical mel input, our ``transcribe()``
sequential mode must produce the same segments: same text tokens, same
start/end times, same seek progression.

The single-window decode loop is already pinned token-for-token by
tests/test_golden_generation.py; this file pins the *orchestration* above
it (reference contract: /root/reference/run:3-6).

Known representation differences normalized here:
- HF keeps the closing timestamp pair token in the final kept segment of a
  window (``slices[-1] += 1`` in ``_retrieve_segment``); openai/ours do
  not. We compare TEXT tokens (< eot) plus start/end times instead of raw
  token lists.
- ours blanks degenerate segments (empty text) but keeps them; HF keeps
  raw. We drop empties on both sides before comparing.
"""

import numpy as np
import pytest

import torch
import jax.numpy as jnp

from tests.conftest import make_speechy_audio
from whisper_mlx_tpu.audio.mel import N_SAMPLES, log_mel_spectrogram
from whisper_mlx_tpu.checkpoint.hf_loader import config_from_hf, convert_hf_whisper_state
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
from whisper_mlx_tpu.inference.transcribe import transcribe


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


def _mel_for_both(audio: np.ndarray, n_mels: int) -> np.ndarray:
    """The mel array transcribe() computes internally: content + 30 s of
    zero-padded audio. Both sides window/zero-pad from the content region
    identically, so feeding HF mel[:content_frames] is exact."""
    padded = np.concatenate([audio, np.zeros(N_SAMPLES, np.float32)])
    mel_all = np.asarray(log_mel_spectrogram(jnp.asarray(padded), n_mels=n_mels))
    content_frames = mel_all.shape[0] - 3000
    return mel_all[:content_frames]


def _gen_config(tok, **overrides):
    """HF GenerationConfig mirroring our decode defaults: same suppress
    lists (HF otherwise injects GPT-2-id defaults that mismatch the
    synthetic tokenizer), same blank rule, same 224-token horizon
    (openai/ours cap each window at sample_len = n_text_ctx//2)."""
    from transformers import GenerationConfig

    from whisper_mlx_tpu.decoding.task import DecodingOptions, _resolve_suppress

    suppress = sorted(_resolve_suppress(DecodingOptions(), tok))
    blank = sorted(set(tok.encode(" ")))
    return GenerationConfig(
        num_beams=1, do_sample=False,
        decoder_start_token_id=tok.sot,
        eos_token_id=tok.eot, pad_token_id=tok.eot,
        suppress_tokens=suppress,
        begin_suppress_tokens=blank + [tok.eot],
        no_timestamps_token_id=tok.no_timestamps,
        max_initial_timestamp_index=50,
        forced_decoder_ids=[(1, tok.language_token("en")), (2, tok.transcribe)],
        return_timestamps=True,
        max_new_tokens=224,
        **overrides,
    )


def _hf_longform(model, tok, mel_content, *, temperature=0.0,
                 logprob_threshold=None, compression_ratio_threshold=None,
                 no_speech_threshold=None, condition_on_prev_tokens=False):
    gen_cfg = _gen_config(tok)
    with torch.no_grad():
        out = model.generate(
            torch.from_numpy(mel_content.T[None]),  # (1, n_mels, frames)
            generation_config=gen_cfg,
            return_segments=True,
            temperature=temperature,
            logprob_threshold=logprob_threshold,
            compression_ratio_threshold=compression_ratio_threshold,
            no_speech_threshold=no_speech_threshold,
            condition_on_prev_tokens=condition_on_prev_tokens,
        )
    return _norm_hf_segments(out["segments"][0], tok)


def _norm_hf_segments(segs, tok):
    segments = []
    for seg in segs:
        toks = [int(t) for t in seg["tokens"].tolist()]
        text_toks = [t for t in toks if t < tok.eot]
        # ours/openai BLANK whitespace-only segments (transcribe.py keeps
        # them with text=""/tokens=[]); HF keeps the raw tokens — normalize
        # by dropping whitespace-only segments on both sides
        if not text_toks or not tok.decode(text_toks).strip():
            continue
        segments.append({
            "start": float(seg["start"]), "end": float(seg["end"]),
            "text_tokens": text_toks,
        })
    return segments


def _our_segments(result, tok):
    segments = []
    for seg in result["segments"]:
        text_toks = [t for t in seg["tokens"] if t < tok.eot]
        if not text_toks or not tok.decode(text_toks).strip():
            continue
        segments.append({
            "start": seg["start"], "end": seg["end"], "text_tokens": text_toks,
        })
    return segments


def _assert_segments_equal(ours, hf):
    assert len(ours) == len(hf), (
        f"segment count diverged: ours={len(ours)} hf={len(hf)}\n"
        f"ours: {[(s['start'], s['end']) for s in ours]}\n"
        f"hf:   {[(s['start'], s['end']) for s in hf]}"
    )
    for i, (a, b) in enumerate(zip(ours, hf)):
        assert a["text_tokens"] == b["text_tokens"], (
            f"segment {i} tokens diverged\nours: {a}\nhf:   {b}")
        assert abs(a["start"] - b["start"]) < 1e-4, (i, a["start"], b["start"])
        assert abs(a["end"] - b["end"]) < 1e-4, (i, a["end"], b["end"])


def test_longform_seek_parity(oracle_model):
    """3-window audio, greedy, no thresholds: the pure seek loop."""
    model, params, config, tok = oracle_model
    audio = make_speechy_audio(seconds=75.0)
    mel_content = _mel_for_both(audio, config.n_mels)

    hf = _hf_longform(model, tok, mel_content)
    ours = transcribe(
        audio, params=params, config=config, tokenizer=tok,
        temperature=0.0, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        condition_on_previous_text=False, verbose=False,
    )
    _assert_segments_equal(_our_segments(ours, tok), hf)


def test_longform_fallback_parity(oracle_model):
    """Fallback-triggering ladder: random-weight avg_logprob (~ -ln V) is
    far below -0.2, so every window falls through rung 0 and keeps the
    final rung's attempt — on both sides, deterministically (t=0.0 rungs).
    """
    model, params, config, tok = oracle_model
    audio = make_speechy_audio(seconds=45.0)
    mel_content = _mel_for_both(audio, config.n_mels)

    hf = _hf_longform(model, tok, mel_content,
                      temperature=(0.0, 0.0), logprob_threshold=-0.2)
    ours = transcribe(
        audio, params=params, config=config, tokenizer=tok,
        temperature=(0.0, 0.0), logprob_threshold=-0.2,
        compression_ratio_threshold=None, no_speech_threshold=None,
        condition_on_previous_text=False, verbose=False,
    )
    our_segs = _our_segments(ours, tok)
    # the ladder genuinely engaged: results carry an exhausted-rung logprob
    assert all(s["avg_logprob"] < -0.2 for s in ours["segments"])
    _assert_segments_equal(our_segs, hf)


def test_longform_condition_on_prev_parity(oracle_model):
    """condition_on_previous_text=True: prompts accumulate across windows
    (HF prompt_condition_type='all-segments' matches openai semantics)."""
    model, params, config, tok = oracle_model
    audio = make_speechy_audio(seconds=75.0)
    mel_content = _mel_for_both(audio, config.n_mels)

    gen_cfg = _gen_config(tok, prompt_condition_type="all-segments")
    with torch.no_grad():
        out = model.generate(
            torch.from_numpy(mel_content.T[None]),
            generation_config=gen_cfg,
            return_segments=True,
            temperature=0.0,
            condition_on_prev_tokens=True,
        )
    hf = _norm_hf_segments(out["segments"][0], tok)

    ours = transcribe(
        audio, params=params, config=config, tokenizer=tok,
        temperature=0.0, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        condition_on_previous_text=True, verbose=False,
    )
    _assert_segments_equal(_our_segments(ours, tok), hf)
