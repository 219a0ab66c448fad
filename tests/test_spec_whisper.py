"""Whisper speculative decoding (decoding/speculative.py): exactness.

Greedy speculative decode must be TOKEN-IDENTICAL to the plain greedy loop
regardless of the draft — that is the whole contract (the draft only
changes speed). Covered here offline on tiny random models:
- draft == target (acceptance 1.0, the upper bracket),
- independent random draft (low acceptance, worst case),
- a weakly-perturbed draft (partial acceptance, the realistic case),
- timestamp grammar on AND off (filters run at every proposal/verify
  position with that position's exact prefix),
- short sample_len (max-length cut inside an accepted block).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_mlx_tpu.decoding.speculative import spec_decode_task
from whisper_mlx_tpu.decoding.task import DecodingOptions, decode
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
from whisper_mlx_tpu.models.whisper import WhisperConfig, init_params


@pytest.fixture(scope="module")
def spec_setup():
    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    draft_cfg = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=1,  # turbo-style: shallow
    )
    params = init_params(config, seed=0)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 3000, 80)).astype(np.float32)
    return params, config, draft_cfg, tok, jnp.asarray(mel)


def _greedy_ref(params, mel, tok, config, options):
    return decode(params, mel, tok, config, options)


@pytest.mark.parametrize("without_timestamps", [False, True])
def test_spec_identical_draft_is_exact_and_fully_accepted(
        spec_setup, without_timestamps):
    params, config, _, tok, mel = spec_setup
    options = DecodingOptions(sample_len=40,
                              without_timestamps=without_timestamps)
    ref = _greedy_ref(params, mel, tok, config, options)
    out = spec_decode_task(params, params, mel, tok, config, config,
                           options, k=4)
    assert [r.tokens for r in out] == [r.tokens for r in ref]
    assert [r.text for r in out] == [r.text for r in ref]
    for o, r in zip(out, ref):
        np.testing.assert_allclose(o.avg_logprob, r.avg_logprob,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(o.no_speech_prob, r.no_speech_prob,
                                   rtol=1e-4, atol=1e-6)
        # identical draft: every verified proposal is the target's argmax
        assert o.spec_stats["accepted"] == o.spec_stats["proposed"] or (
            # the final block may be cut by EOT/max-len before all k count
            o.spec_stats["proposed"] - o.spec_stats["accepted"] < 4
        )
        # >1 token per target call is the speedup mechanism
        committed = len(o.tokens) + 1
        assert committed > o.spec_stats["target_calls"]


def test_spec_random_draft_is_still_exact(spec_setup):
    """An independent random draft (≈0 acceptance) must not change output."""
    params, config, draft_cfg, tok, mel = spec_setup
    draft = init_params(draft_cfg, seed=99)
    options = DecodingOptions(sample_len=32)
    ref = _greedy_ref(params, mel, tok, config, options)
    out = spec_decode_task(params, draft, mel, tok, config, draft_cfg,
                           options, k=3)
    assert [r.tokens for r in out] == [r.tokens for r in ref]
    for o in out:
        assert o.spec_stats["accepted"] <= o.spec_stats["proposed"]


def test_spec_perturbed_draft_partial_acceptance(spec_setup):
    """A draft = target + small noise accepts some but not all proposals —
    and stays exact (the realistic distil-draft regime)."""
    import jax

    params, config, _, tok, mel = spec_setup
    rng = np.random.default_rng(5)
    noisy = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32)) * 0.03
        if hasattr(a, "shape") and a.dtype in (jnp.float32, jnp.bfloat16)
        else a,
        params)
    options = DecodingOptions(sample_len=40)
    ref = _greedy_ref(params, mel, tok, config, options)
    out = spec_decode_task(params, noisy, mel, tok, config, config,
                           options, k=4)
    assert [r.tokens for r in out] == [r.tokens for r in ref]
    total_p = sum(o.spec_stats["proposed"] for o in out)
    total_a = sum(o.spec_stats["accepted"] for o in out)
    assert 0 < total_a <= total_p


def test_transcribe_with_draft_matches_plain(spec_setup):
    """transcribe(draft_params=...) — the t=0 ladder rung rides the
    speculative path and the final transcript must be identical."""
    from whisper_mlx_tpu.inference.transcribe import transcribe

    params, config, _, tok, _ = spec_setup
    rng = np.random.default_rng(11)
    audio = (rng.standard_normal(16000 * 45) * 0.05).astype(np.float32)
    kwargs = dict(params=params, config=config, tokenizer=tok,
                  temperature=0.0, sample_len=24, word_timestamps=False)
    ref = transcribe(audio, **kwargs)
    out = transcribe(audio, draft_params=params, draft_config=config,
                     spec_k=3, **kwargs)
    assert out["text"] == ref["text"]
    assert [s["text"] for s in out["segments"]] == [
        s["text"] for s in ref["segments"]]


def test_spec_quantized_kv_caches(spec_setup):
    """The serving config decodes over int8/int4 KV caches — the spec loop
    must match plain greedy under the SAME cache quantization."""
    import dataclasses

    params, config, _, tok, mel = spec_setup
    qcfg = dataclasses.replace(config, kv_bits=8, self_kv_bits=8)
    options = DecodingOptions(sample_len=24)
    ref = decode(params, mel, tok, qcfg, options)
    out = spec_decode_task(params, params, mel, tok, qcfg, qcfg,
                           options, k=4)
    assert [r.tokens for r in out] == [r.tokens for r in ref]


def test_spec_short_sample_len_cut(spec_setup):
    """max_len lands inside an accepted block → committed tokens must be
    cut exactly where sequential greedy stops."""
    params, config, _, tok, mel = spec_setup
    for sl in (3, 5, 7):
        options = DecodingOptions(sample_len=sl)
        ref = _greedy_ref(params, mel, tok, config, options)
        out = spec_decode_task(params, params, mel, tok, config, config,
                               options, k=4)
        assert [r.tokens for r in out] == [r.tokens for r in ref], sl
