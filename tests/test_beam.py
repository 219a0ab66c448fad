"""Beam search properties + exact-equivalence oracle vs a host reference.

The decisive test: a slow, obviously-correct host-side beam search (plain
Python over the same jitted single-step model fn) must produce the same best
hypothesis as the vectorized jitted beam for beam_size ∈ {2, 3} on a tiny
model. This pins the candidate-selection/finished-pool semantics.
"""

import numpy as np
import pytest

import torch  # noqa: F401
import jax
import jax.numpy as jnp

from whisper_mlx_tpu.decoding.filters import FilterConfig, apply_filters, make_suppress_mask
from whisper_mlx_tpu.decoding.task import DecodingOptions, decode, _resolve_suppress, build_initial_tokens
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
from whisper_mlx_tpu.models.whisper import (
    WhisperConfig,
    cross_kv,
    decode_step,
    encode,
    init_kv_cache,
    init_params,
)


@pytest.fixture(scope="module")
def tiny():
    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(config, seed=3)
    rng = np.random.default_rng(11)
    mel = rng.standard_normal((2, 3000, 80)).astype(np.float32)
    return params, config, tok, jnp.asarray(mel)


def host_beam_search(params, config, tok, states, init_tokens, sample_begin,
                     beam_size, sample_len, filter_cfg, suppress, blank):
    """Reference implementation: insertion-ordered dicts, one window."""
    xkv = cross_kv(params, states, config)
    cache = init_kv_cache(config, 1)
    logits, cache, _ = decode_step(
        params, jnp.asarray([init_tokens], jnp.int32), jnp.int32(0), cache, xkv, config
    )
    # replicate cache for beams lazily via index 0 gathers
    beams = [(tuple(init_tokens), 0.0, cache)]
    last_logits = [logits[:, -1]]
    finished: list[tuple[tuple, float]] = []
    max_candidates = beam_size

    for step in range(sample_len):
        candidates = []
        for b, (seq, cum, bcache) in enumerate(beams):
            lg = last_logits[b][0].astype(jnp.float32)[None]
            buf = np.zeros((1, config.n_text_ctx), np.int32)
            buf[0, : len(seq)] = seq
            lg = apply_filters(lg, jnp.asarray(buf), jnp.int32(len(seq)),
                               suppress, blank, filter_cfg)
            lp = np.asarray(jax.nn.log_softmax(lg, axis=-1))[0]
            for t in np.argsort(-lp):  # best-first
                candidates.append((cum + lp[t], int(t), b))
                if len([c for c in candidates if c[2] == b]) >= beam_size + 1:
                    break
        candidates.sort(key=lambda c: -c[0])
        new_beams = []
        for score, t, b in candidates:
            if t == tok.eot:
                if len(finished) < max_candidates:
                    finished.append((beams[b][0] + (t,), score))
            elif len(new_beams) < beam_size:
                seq, _, bcache = beams[b]
                new_beams.append((seq + (t,), score, bcache, b, t))
        if len(finished) >= max_candidates:
            beams = [(s, c, bc) for s, c, bc, _, _ in new_beams]
            break
        # advance model for new beams
        stepped = []
        new_logits = []
        for seq, score, bcache, parent, t in new_beams:
            lg, ncache, _ = decode_step(
                params, jnp.asarray([[t]], jnp.int32), jnp.int32(len(seq) - 1),
                bcache, xkv, config,
            )
            stepped.append((seq, score, ncache))
            new_logits.append(lg[:, -1])
        beams = stepped
        last_logits = new_logits
        if not beams:
            break
    return finished, beams


def test_beam_matches_host_reference(tiny):
    params, config, tok, mel = tiny
    opts = DecodingOptions(sample_len=12, beam_size=3)
    jit_results = decode(params, mel, tok, config, opts)

    init_tokens, sot_index, sample_begin = build_initial_tokens(tok, opts, config.n_text_ctx)
    suppress_ids = _resolve_suppress(opts, tok)
    blank_ids = tuple(tok.encode(" ")) + (tok.eot,)
    always, begin = make_suppress_mask(config.n_vocab, suppress_ids, blank_ids)
    fc = FilterConfig(
        eot=tok.eot, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin, sample_begin=sample_begin,
        max_initial_timestamp_index=50,
    )
    states = encode(params, mel, config)
    for w in range(2):
        finished, live = host_beam_search(
            params, config, tok, states[w : w + 1], init_tokens, sample_begin,
            beam_size=3, sample_len=12, filter_cfg=fc,
            suppress=jnp.asarray(always), blank=jnp.asarray(begin),
        )
        # reference finalize: live hypotheses join only when the pool is short
        pool = list(finished)
        if len(pool) < 3:
            pool += [(seq + (tok.eot,), score) for seq, score, _ in live]
        # rank with default (no length_penalty): score / length
        def rank(item):
            seq, score = item
            L = max(len(seq) - sample_begin - 1, 1)  # sampled tokens before EOT
            return score / L
        best_seq, best_score = max(pool, key=rank)
        expected = list(best_seq[sample_begin:-1])
        assert jit_results[w].tokens == expected, (
            f"window {w}: jit {jit_results[w].tokens} != host {expected}"
        )


def test_beam_basic_properties(tiny):
    params, config, tok, mel = tiny
    results = decode(params, mel, tok, config, DecodingOptions(sample_len=16, beam_size=2))
    assert len(results) == 2
    for r in results:
        assert r.tokens
        assert tok.eot not in r.tokens
        assert r.tokens[0] >= tok.timestamp_begin  # initial timestamp rule
        assert np.isfinite(r.avg_logprob)


def test_beam_deterministic(tiny):
    params, config, tok, mel = tiny
    opts = DecodingOptions(sample_len=12, beam_size=3)
    r1 = decode(params, mel, tok, config, opts)
    r2 = decode(params, mel, tok, config, opts)
    assert [r.tokens for r in r1] == [r.tokens for r in r2]


def test_beam_patience_pool(tiny):
    params, config, tok, mel = tiny
    r = decode(params, mel, tok, config,
               DecodingOptions(sample_len=12, beam_size=2, patience=2.0))
    assert len(r) == 2
    assert all(np.isfinite(x.avg_logprob) for x in r)
