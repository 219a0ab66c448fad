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
            # stable: ties break by ascending token id, the reference's
            # insertion order and lax.top_k's flat-index order
            for t in np.argsort(-lp, kind="stable"):  # best-first
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


def _run_beam_raw(params, config, tok, states, beam_size, patience, sample_len):
    """Call beam_decode directly to expose the full finished pool."""
    from whisper_mlx_tpu.decoding.beam import beam_decode

    opts = DecodingOptions(sample_len=sample_len, beam_size=beam_size,
                           patience=patience)
    init_tokens, sot_index, sample_begin = build_initial_tokens(
        tok, opts, config.n_text_ctx)
    suppress_ids = _resolve_suppress(opts, tok)
    blank_ids = tuple(tok.encode(" ")) + (tok.eot,)
    always, begin = make_suppress_mask(config.n_vocab, suppress_ids, blank_ids)
    fc = FilterConfig(
        eot=tok.eot, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin, sample_begin=sample_begin,
        max_initial_timestamp_index=50,
    )
    P = max(round(beam_size * (patience or 1.0)), 1)
    N = states.shape[0]
    res = beam_decode(
        params, states,
        jnp.tile(jnp.asarray(init_tokens, jnp.int32)[None, :], (N, 1)),
        jnp.asarray(always), jnp.asarray(begin),
        config=config, filter_cfg=fc, sample_len=sample_len,
        sot_index=sot_index, no_speech_token=tok.no_speech,
        beam_size=beam_size, pool_size=P,
    )
    return res, sample_begin


def _pool_sequences(res, sample_begin):
    """Valid (score>-inf) finished hypotheses as token tuples per window."""
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    scores = np.asarray(res.scores)
    out = []
    for w in range(toks.shape[0]):
        seqs = []
        for p in range(toks.shape[1]):
            if not np.isfinite(scores[w, p]):
                continue
            L = int(lens[w, p])
            seqs.append(tuple(toks[w, p, sample_begin : sample_begin + L]))
        out.append(seqs)
    return out


def test_beam_pool_has_no_duplicates(tiny):
    """Reference dedupes identical hypotheses via dict keys; here they must be
    structurally absent — including the patience>1 backfill path that used to
    replicate the worst live beam into the spare slots (r2 fix)."""
    params, config, tok, mel = tiny
    states = encode(params, mel, config)
    for beam_size, patience in [(2, 2.0), (3, 1.0), (2, 3.0)]:
        res, sample_begin = _run_beam_raw(
            params, config, tok, states, beam_size, patience, sample_len=10)
        counts = np.asarray(res.fin_count)
        for w, seqs in enumerate(_pool_sequences(res, sample_begin)):
            assert len(seqs) == counts[w]
            assert len(set(seqs)) == len(seqs), (
                f"duplicate hypotheses b={beam_size} p={patience} w={w}: {seqs}")


def test_beam_pool_distinct_under_full_ties(tiny):
    """Zero weights → fully uniform logits → maximal tie pressure; the pool
    must still be duplicate-free and the decode deterministic."""
    params, config, tok, mel = tiny
    zero_params = jax.tree.map(lambda a: a * 0, params)
    states = encode(zero_params, mel, config)
    res, sample_begin = _run_beam_raw(
        zero_params, config, tok, states, beam_size=3, patience=2.0,
        sample_len=8)
    for seqs in _pool_sequences(res, sample_begin):
        assert seqs, "pool empty"
        assert len(set(seqs)) == len(seqs), f"tie duplicates: {seqs}"


def test_beam_matches_host_reference_under_ties(tiny):
    """Tie case: with uniform (zero-weight) logits both the host reference and
    the jitted beam must break ties identically — lexicographically by
    (parent, token id) — and return the same best hypothesis."""
    params, config, tok, mel = tiny
    zero_params = jax.tree.map(lambda a: a * 0, params)
    opts = DecodingOptions(sample_len=8, beam_size=3)
    jit_results = decode(zero_params, mel, tok, config, opts)

    init_tokens, sot_index, sample_begin = build_initial_tokens(tok, opts, config.n_text_ctx)
    suppress_ids = _resolve_suppress(opts, tok)
    blank_ids = tuple(tok.encode(" ")) + (tok.eot,)
    always, begin = make_suppress_mask(config.n_vocab, suppress_ids, blank_ids)
    fc = FilterConfig(
        eot=tok.eot, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin, sample_begin=sample_begin,
        max_initial_timestamp_index=50,
    )
    states = encode(zero_params, mel, config)
    for w in range(2):
        finished, live = host_beam_search(
            zero_params, config, tok, states[w : w + 1], init_tokens, sample_begin,
            beam_size=3, sample_len=8, filter_cfg=fc,
            suppress=jnp.asarray(always), blank=jnp.asarray(begin),
        )
        pool = list(finished)
        if len(pool) < 3:
            pool += [(seq + (tok.eot,), score) for seq, score, _ in live]

        def rank(item):
            seq, score = item
            L = max(len(seq) - sample_begin - 1, 1)
            return score / L

        best_seq, _ = max(pool, key=rank)
        expected = list(best_seq[sample_begin:-1])
        assert jit_results[w].tokens == expected, (
            f"tie window {w}: jit {jit_results[w].tokens} != host {expected}")


def test_topk_flat_iterative_matches_lax_topk():
    """The TPU iterative masked-argmax top-k must equal lax.top_k exactly —
    values AND indices — including tie-heavy and -inf-masked rows (the
    beam loop feeds -inf-masked candidate rows every step)."""
    import numpy as np

    from whisper_mlx_tpu.decoding import beam as beam_mod

    rng = np.random.default_rng(7)
    n, v, k = 6, 4096, 10
    cand = rng.standard_normal((n, v)).astype(np.float32)
    # tie-heavy: quantize to few levels; -inf rows: mask one row + one block
    cand = np.round(cand * 2) / 2
    cand[2, :] = -np.inf
    cand[3, 100:] = -np.inf
    cand[4, :5] = 3.25  # exact ties at the top
    x = jnp.asarray(cand)

    ref_s, ref_i = jax.lax.top_k(x, k)
    beam_mod._FORCE_ITER = True
    try:
        it_s, it_i = beam_mod._topk_flat(x, k)
    finally:
        beam_mod._FORCE_ITER = False
    assert jnp.all(ref_s == it_s), (ref_s, it_s)
    assert jnp.all(ref_i == it_i), (ref_i, it_i)


def test_beam_phase_ladder_exact(tiny):
    """The growing-cache phase ladder (phases=(16,)) must produce results
    BIT-identical to the single-phase loop — the ladder only changes the
    self-KV allocation trajectory, never the math (greedy has the same
    invariant; beam additionally grows the ancestry matrix)."""
    from whisper_mlx_tpu.decoding.beam import beam_decode

    params, config, tok, mel = tiny
    states = encode(params, mel, config)
    opts = DecodingOptions(sample_len=50, beam_size=3)
    init_tokens, sot_index, sample_begin = build_initial_tokens(
        tok, opts, config.n_text_ctx)
    suppress_ids = _resolve_suppress(opts, tok)
    blank_ids = tuple(tok.encode(" ")) + (tok.eot,)
    always, begin = make_suppress_mask(config.n_vocab, suppress_ids, blank_ids)
    fc = FilterConfig(
        eot=tok.eot, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin, sample_begin=sample_begin,
        max_initial_timestamp_index=None, apply_timestamp_rules=False)

    def run(phases):
        return beam_decode(
            params, states,
            jnp.tile(jnp.asarray(init_tokens, jnp.int32)[None, :], (2, 1)),
            jnp.asarray(always), jnp.asarray(begin),
            config=config, filter_cfg=fc, sample_len=50,
            sot_index=sot_index, no_speech_token=tok.no_speech,
            beam_size=3, pool_size=3, phases=phases,
        )

    flat = run(())          # single loop, full allocation
    laddered = run((16,))   # 16-slot phase then full
    assert np.array_equal(np.asarray(flat.tokens), np.asarray(laddered.tokens))
    assert np.array_equal(np.asarray(flat.lengths), np.asarray(laddered.lengths))
    assert np.array_equal(np.asarray(flat.fin_count), np.asarray(laddered.fin_count))
    np.testing.assert_array_equal(
        np.asarray(flat.scores), np.asarray(laddered.scores))

def test_beam_kv_scheme_parity(tiny):
    """flat (ancestry indirection), perm (one-hot MXU physical reorder) and
    permg (gather reorder) are three lowerings of the same beam math — the
    decoded tokens must be identical across schemes and self-KV dtypes, and
    perm/permg (identical attention path, different permute lowering) must
    agree bit-for-bit on scores."""
    import dataclasses

    from whisper_mlx_tpu.decoding.beam import beam_decode

    params, config, tok, mel = tiny
    opts = DecodingOptions(sample_len=40, beam_size=3)
    init_tokens, sot_index, sample_begin = build_initial_tokens(
        tok, opts, config.n_text_ctx)
    suppress_ids = _resolve_suppress(opts, tok)
    blank_ids = tuple(tok.encode(" ")) + (tok.eot,)
    always, begin = make_suppress_mask(config.n_vocab, suppress_ids, blank_ids)
    fc = FilterConfig(
        eot=tok.eot, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin, sample_begin=sample_begin,
        max_initial_timestamp_index=None, apply_timestamp_rules=False)

    for self_bits in (0, 8, 4):
        cfg = dataclasses.replace(config, self_kv_bits=self_bits)
        states = encode(params, mel, cfg)

        def run(scheme, cfg=cfg, states=states):
            return beam_decode(
                params, states,
                jnp.tile(jnp.asarray(init_tokens, jnp.int32)[None, :], (2, 1)),
                jnp.asarray(always), jnp.asarray(begin),
                config=cfg, filter_cfg=fc, sample_len=40,
                sot_index=sot_index, no_speech_token=tok.no_speech,
                beam_size=3, pool_size=3, phases=(16,), kv_scheme=scheme,
            )

        flat, perm, permg = run("flat"), run("perm"), run("permg")
        permp = run("permp")  # Pallas DMA lowering (interpret on CPU)
        permi = run("permi")  # copy-on-divergence lane bookkeeping
        others = [(perm, "perm"), (permg, "permg"),
                  (permp, "permp"), (permi, "permi")]
        if self_bits != 4:  # shared: no s4 gather on this backend
            others.append((run("shared"), "shared"))
        for other, name in others:
            assert np.array_equal(np.asarray(flat.tokens),
                                  np.asarray(other.tokens)), \
                f"{name} tokens diverge from flat (self_kv_bits={self_bits})"
            assert np.array_equal(np.asarray(flat.lengths),
                                  np.asarray(other.lengths))
            assert np.array_equal(np.asarray(flat.fin_count),
                                  np.asarray(other.fin_count))
            np.testing.assert_allclose(
                np.asarray(flat.scores), np.asarray(other.scores),
                rtol=2e-5, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(perm.scores), np.asarray(permg.scores))


def test_beam_shared_overflow_fallback_exact(tiny):
    """kv_scheme='shared' with a pathologically small W: the fast loop
    overflows almost immediately and the exact flat fallback finishes each
    segment — tokens must STILL be identical to flat. Also checks a roomy
    W for the no-overflow path, both fp and int8 self-KV."""
    import dataclasses

    from whisper_mlx_tpu.decoding.beam import beam_decode

    params, config, tok, mel = tiny
    opts = DecodingOptions(sample_len=40, beam_size=3)
    init_tokens, sot_index, sample_begin = build_initial_tokens(
        tok, opts, config.n_text_ctx)
    always, begin = make_suppress_mask(config.n_vocab, (), (tok.eot,))
    fc = FilterConfig(
        eot=tok.eot, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin, sample_begin=sample_begin,
        max_initial_timestamp_index=None, apply_timestamp_rules=False)

    for self_bits in (0, 8):
        cfg = dataclasses.replace(config, self_kv_bits=self_bits)
        states = encode(params, mel, cfg)

        def run(scheme, window=None, cfg=cfg, states=states):
            return beam_decode(
                params, states,
                jnp.tile(jnp.asarray(init_tokens, jnp.int32)[None, :], (2, 1)),
                jnp.asarray(always), jnp.asarray(begin),
                config=cfg, filter_cfg=fc, sample_len=40,
                sot_index=sot_index, no_speech_token=tok.no_speech,
                beam_size=3, pool_size=3, phases=(16,), kv_scheme=scheme,
                window=window,
            )

        flat = run("flat")
        for W in (4, 12, 40):  # 4 → overflow-dominated; 40 → never
            shared = run("shared", window=W)
            assert np.array_equal(np.asarray(flat.tokens),
                                  np.asarray(shared.tokens)), \
                f"shared W={W} self_bits={self_bits} tokens diverge"
            np.testing.assert_allclose(
                np.asarray(flat.scores), np.asarray(shared.scores),
                rtol=3e-5, atol=1e-5)
