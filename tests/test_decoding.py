"""Decode-loop behavior: timestamp grammar, determinism, option surface.

Runs a tiny random-weight model with the synthetic offline tokenizer; the
assertions encode the Whisper decoding rules (SURVEY.md §2.1) as properties
that must hold for ANY model weights — grammar is enforced by the filters,
not by the model.
"""

import numpy as np
import pytest

import torch  # noqa: F401  — import before jax (image-specific, see conftest)
import jax
import jax.numpy as jnp

from whisper_mlx_tpu.decoding.task import DecodingOptions, compression_ratio, decode, detect_language
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
from whisper_mlx_tpu.models.whisper import WhisperConfig, encode, init_params


@pytest.fixture(scope="module")
def tiny_model():
    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(config, seed=0)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 3000, 80)).astype(np.float32)
    return params, config, tok, jnp.asarray(mel)


def test_greedy_timestamp_grammar(tiny_model):
    params, config, tok, mel = tiny_model
    results = decode(params, mel, tok, config, DecodingOptions(sample_len=40))
    assert len(results) == 2
    for r in results:
        assert r.tokens, "no tokens sampled"
        # first sampled token must be a timestamp ≤ max_initial (1.0s = idx 50)
        assert r.tokens[0] >= tok.timestamp_begin
        assert r.tokens[0] <= tok.timestamp_begin + 50
        # monotone timestamps
        ts = [t for t in r.tokens if t >= tok.timestamp_begin]
        assert ts == sorted(ts)
        # notimestamps token never sampled; no suppressed specials
        assert tok.no_timestamps not in r.tokens
        assert tok.sot not in r.tokens
        assert np.isfinite(r.avg_logprob)
        assert 0.0 <= r.no_speech_prob <= 1.0


def test_greedy_deterministic(tiny_model):
    params, config, tok, mel = tiny_model
    r1 = decode(params, mel, tok, config, DecodingOptions(sample_len=24))
    r2 = decode(params, mel, tok, config, DecodingOptions(sample_len=24))
    assert [r.tokens for r in r1] == [r.tokens for r in r2]


def test_defer_matches_eager(tiny_model):
    """decode(defer=True) dispatches the device work and postpones only the
    host fetch/ranking — results must be identical to the eager call, and
    multiple deferred batches may be in flight at once (bench.py
    BENCH_PIPELINE steady-state mode)."""
    params, config, tok, mel = tiny_model
    opts = DecodingOptions(sample_len=24)
    eager = decode(params, mel, tok, config, opts)
    h1 = decode(params, mel, tok, config, opts, defer=True)
    h2 = decode(params, mel, tok, config, opts, defer=True)
    assert callable(h1)
    for deferred in (h1(), h2()):
        assert [r.tokens for r in deferred] == [r.tokens for r in eager]
        assert [r.text for r in deferred] == [r.text for r in eager]


def test_without_timestamps(tiny_model):
    """Reference semantics: without_timestamps appends <|notimestamps|> to the
    sot sequence and disables the timestamp grammar — it does NOT hard-mask
    timestamp tokens (the trained model avoids them via the sot signal)."""
    from whisper_mlx_tpu.decoding.task import build_initial_tokens

    params, config, tok, mel = tiny_model
    opts = DecodingOptions(sample_len=24, without_timestamps=True)
    init, sot_index, sample_begin = build_initial_tokens(tok, opts, config.n_text_ctx)
    assert init[-1] == tok.no_timestamps
    assert sot_index == 0 and sample_begin == 4
    results = decode(params, mel, tok, config, opts)
    for r in results:
        # grammar off: first sampled token is NOT forced to be a timestamp —
        # with random weights over a mostly-text vocab the argmax lands on text
        assert r.tokens, "decode produced no tokens"


def test_temperature_sampling_varies(tiny_model):
    params, config, tok, mel = tiny_model
    opts = DecodingOptions(sample_len=24, temperature=1.0)
    r1 = decode(params, mel, tok, config, opts, rng=jax.random.PRNGKey(1))
    r2 = decode(params, mel, tok, config, opts, rng=jax.random.PRNGKey(2))
    assert [r.tokens for r in r1] != [r.tokens for r in r2]
    assert all(r.temperature == 1.0 for r in r1)


def test_prompt_conditioning_changes_output(tiny_model):
    params, config, tok, mel = tiny_model
    base = decode(params, mel, tok, config, DecodingOptions(sample_len=16))
    prompted = decode(
        params, mel, tok, config,
        DecodingOptions(sample_len=16, prompt="hello world"),
    )
    # prompt changes the conditioning context; with random weights outputs differ
    assert [r.tokens for r in base] != [r.tokens for r in prompted]


def test_best_of_sampling(tiny_model):
    params, config, tok, mel = tiny_model
    results = decode(
        params, mel, tok, config,
        DecodingOptions(sample_len=16, temperature=0.8, best_of=3),
    )
    assert len(results) == 2  # one per window, best-of collapsed


def test_detect_language(tiny_model):
    params, config, tok, mel = tiny_model
    states = encode(params, mel, config)
    codes, probs = detect_language(params, states, tok, config)
    assert len(codes) == 2
    assert all(c in tok.all_language_codes for c in codes)
    assert np.all(probs > 0) and np.all(probs <= 1)


def test_compression_ratio():
    assert compression_ratio("") == 0.0
    rep = compression_ratio("the the the the the the the the the the")
    varied = compression_ratio("a quick brown fox jumps over lazy dogs")
    assert rep > varied


def test_translate_task_sot_sequence(tiny_model):
    """task=translate switches the sot sequence (reference decode option)."""
    from whisper_mlx_tpu.decoding.task import build_initial_tokens

    params, config, tok, mel = tiny_model
    tok.task = "translate"
    try:
        init, _, _ = build_initial_tokens(tok, DecodingOptions(task="translate"),
                                          config.n_text_ctx)
        assert init == [tok.sot, tok.language_token("en"), tok.translate]
    finally:
        tok.task = "transcribe"


def test_prefix_option(tiny_model):
    """prefix seeds the sampled region (reference DecodingOptions.prefix)."""
    from whisper_mlx_tpu.decoding.task import build_initial_tokens

    params, config, tok, mel = tiny_model
    prefix_ids = tok.encode(" hello")
    init, sot_index, sample_begin = build_initial_tokens(
        tok, DecodingOptions(prefix=list(prefix_ids)), config.n_text_ctx
    )
    assert init[-len(prefix_ids):] == list(prefix_ids)
    assert sample_begin == len(init)
    r = decode(params, mel, tok, config,
               DecodingOptions(sample_len=8, prefix=list(prefix_ids)))
    assert all(x.tokens for x in r)


def test_english_only_layout():
    """.en models: no language tokens; sot sequence is just [sot]."""
    from whisper_mlx_tpu.decoding.tokenizer import ByteLevelBPE, WhisperTokenizer, bytes_to_unicode

    byte_vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
    tok = WhisperTokenizer(ByteLevelBPE(byte_vocab, []), n_base=256, num_languages=0)
    assert not tok.multilingual
    assert tok.sot_sequence == (tok.sot,)
    assert tok.all_language_tokens == ()
    # layout collapses: translate/transcribe right after sot
    assert tok.translate == tok.sot + 1
    assert tok.timestamp_begin == tok.no_timestamps + 1


@pytest.mark.parametrize("self_kv_bits", [0, 8])
def test_two_phase_cache_growth_equivalence(tiny_model, self_kv_bits):
    """The two-phase (growing) self-KV cache is token-identical to the
    single-allocation decode: phase 1 runs over a 128-position cache and is
    copied into the full-horizon allocation when the write position reaches
    it (decoding/greedy.py). The dead-position tail only ever contributes
    masked -inf scores, so the math is identical — this pins it."""
    import dataclasses

    from whisper_mlx_tpu.decoding.filters import FilterConfig, make_suppress_mask
    from whisper_mlx_tpu.decoding.greedy import greedy_decode
    from whisper_mlx_tpu.decoding.task import _resolve_suppress, build_initial_tokens

    params, config, tok, mel = tiny_model
    config = dataclasses.replace(config, self_kv_bits=self_kv_bits)
    audio_states = encode(params, mel, config)
    opts = DecodingOptions(sample_len=200)
    init_tokens, sot_index, sample_begin = build_initial_tokens(tok, opts, config.n_text_ctx)
    always_np, begin_np = make_suppress_mask(
        config.n_vocab, _resolve_suppress(opts, tok),
        tuple(tok.encode(" ")) + (tok.eot,))
    filter_cfg = FilterConfig(
        eot=tok.eot, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin, sample_begin=sample_begin,
        max_initial_timestamp_index=50, apply_timestamp_rules=True)
    initial = jnp.tile(jnp.asarray(init_tokens, jnp.int32)[None, :], (2, 1))
    common = dict(
        config=config, filter_cfg=filter_cfg, sample_len=200,
        sot_index=sot_index, no_speech_token=tok.no_speech)
    args = (params, audio_states, initial, jnp.asarray(always_np),
            jnp.asarray(begin_np), jnp.float32(0.0), jax.random.PRNGKey(0))
    grown = greedy_decode(*args, grow_cache=True, **common)
    flat = greedy_decode(*args, grow_cache=False, **common)
    assert np.array_equal(np.asarray(grown.tokens), np.asarray(flat.tokens))
    assert np.array_equal(np.asarray(grown.lengths), np.asarray(flat.lengths))
    np.testing.assert_allclose(np.asarray(grown.sum_logprobs),
                               np.asarray(flat.sum_logprobs), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("unroll", [2, 3])
def test_unrolled_decode_equivalence(tiny_model, unroll):
    """unroll=k chains k decode steps per while-loop iteration
    (greedy.py run_loop). The pair condition + lax.cond-guarded trailing
    steps must reproduce unroll=1 exactly — including non-divisible trip
    counts (k=3 over a 200-step horizon) and the early-exit check moving
    from every step to every k steps (a mid-pair all-done batch runs a
    frozen step whose writes are no-ops)."""
    import dataclasses

    from whisper_mlx_tpu.decoding.filters import FilterConfig, make_suppress_mask
    from whisper_mlx_tpu.decoding.greedy import greedy_decode
    from whisper_mlx_tpu.decoding.task import _resolve_suppress, build_initial_tokens

    params, config, tok, mel = tiny_model
    config = dataclasses.replace(config, self_kv_bits=8)
    audio_states = encode(params, mel, config)
    opts = DecodingOptions(sample_len=200)
    init_tokens, sot_index, sample_begin = build_initial_tokens(tok, opts, config.n_text_ctx)
    always_np, begin_np = make_suppress_mask(
        config.n_vocab, _resolve_suppress(opts, tok),
        tuple(tok.encode(" ")) + (tok.eot,))
    filter_cfg = FilterConfig(
        eot=tok.eot, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin, sample_begin=sample_begin,
        max_initial_timestamp_index=50, apply_timestamp_rules=True)
    initial = jnp.tile(jnp.asarray(init_tokens, jnp.int32)[None, :], (2, 1))
    common = dict(
        config=config, filter_cfg=filter_cfg, sample_len=200,
        sot_index=sot_index, no_speech_token=tok.no_speech)
    args = (params, audio_states, initial, jnp.asarray(always_np),
            jnp.asarray(begin_np), jnp.float32(0.0), jax.random.PRNGKey(0))
    base = greedy_decode(*args, **common)
    fast = greedy_decode(*args, unroll=unroll, **common)
    assert np.array_equal(np.asarray(base.tokens), np.asarray(fast.tokens))
    assert np.array_equal(np.asarray(base.lengths), np.asarray(fast.lengths))
    np.testing.assert_allclose(np.asarray(base.sum_logprobs),
                               np.asarray(fast.sum_logprobs), rtol=1e-5, atol=1e-5)
