"""DTW + word-timestamp machinery (host-verifiable parts exact)."""

import numpy as np
import pytest

import torch  # noqa: F401
import jax.numpy as jnp

from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
from whisper_mlx_tpu.inference.word_timestamps import (
    WordTiming,
    default_alignment_heads,
    dtw,
    find_alignment,
    median_filter,
    merge_punctuations,
)
from whisper_mlx_tpu.models.whisper import WhisperConfig, init_params


def test_dtw_identity_diagonal():
    # strongly diagonal cost → diagonal path
    N = 8
    cost = np.ones((N, N)) - np.eye(N)
    ti, fi = dtw(cost)
    on_diag = sum(1 for a, b in zip(ti, fi) if a == b)
    assert on_diag >= N  # path visits every diagonal cell


def test_dtw_monotone_and_complete():
    rng = np.random.default_rng(0)
    cost = rng.random((5, 40))
    ti, fi = dtw(cost)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == 4 and fi[-1] == 39
    assert np.all(np.diff(ti) >= 0) and np.all(np.diff(fi) >= 0)
    assert np.all((np.diff(ti) + np.diff(fi)) >= 1)


def test_dtw_against_bruteforce():
    """Exactness on small instances vs exhaustive path enumeration."""
    import itertools

    rng = np.random.default_rng(1)
    for _ in range(5):
        N, M = 3, 4
        cost = rng.random((N, M))

        def best_path_cost():
            # enumerate all monotone paths from (0,0) to (N-1,M-1)
            best = np.inf
            stack = [((0, 0), cost[0, 0])]
            while stack:
                (i, j), c = stack.pop()
                if (i, j) == (N - 1, M - 1):
                    best = min(best, c)
                    continue
                for di, dj in ((1, 0), (0, 1), (1, 1)):
                    ni, nj = i + di, j + dj
                    if ni < N and nj < M:
                        stack.append(((ni, nj), c + cost[ni, nj]))
            return best

        ti, fi = dtw(cost)
        path_cost = sum(cost[a, b] for a, b in zip(ti, fi))
        assert abs(path_cost - best_path_cost()) < 1e-12


def test_median_filter():
    x = np.array([[1.0, 9.0, 1.0, 1.0, 9.0, 1.0, 1.0]])
    y = median_filter(x, 3)
    assert y.shape == x.shape
    assert y[0, 1] == 1.0  # spike removed


def test_merge_punctuations():
    words = [
        WordTiming(" -", [1], 0.0, 0.1, 0.9),
        WordTiming(" hello", [2], 0.1, 0.5, 0.9),
        WordTiming(",", [3], 0.5, 0.6, 0.9),
        WordTiming(" world", [4], 0.6, 1.0, 0.9),
        WordTiming(".", [5], 1.0, 1.1, 0.9),
    ]
    merge_punctuations(words, "\"'“¿([{-", "\"'.。,，!！?？:：”)]}、")
    rendered = [w.word for w in words if w.word]
    assert rendered == [" - hello,", " world."]


def test_find_alignment_tiny_model():
    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(config, seed=0)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((3000, 80)).astype(np.float32)
    text = tok.encode(" hello world again")
    words = find_alignment(params, config, tok, text, mel, num_frames=3000)
    assert words, "no words aligned"
    for w in words:
        assert 0.0 <= w.start <= w.end <= 30.0
        assert 0.0 <= w.probability <= 1.0
    # words cover the text tokens in order
    flat = [t for w in words for t in w.tokens]
    assert flat == text


def test_default_alignment_heads():
    config = WhisperConfig(n_text_layer=4, n_text_head=6)
    heads = default_alignment_heads(config)
    assert all(l >= 2 for l, _ in heads)
    assert len(heads) == 2 * 6


def test_checkpoint_alignment_heads_roundtrip(tmp_path):
    """Real mlx checkpoints ship the model-specific DTW head mask in
    config.json ("alignment_heads"); the loader must carry it into
    WhisperConfig (where find_alignment prefers it over the upper-half
    fallback) and export must round-trip it."""
    import dataclasses

    from whisper_mlx_tpu.checkpoint.quant_loader import (
        export_mlx_whisper, load_mlx_whisper)
    from whisper_mlx_tpu.models.whisper import init_params

    heads = ((0, 1), (1, 3), (1, 5))
    config = WhisperConfig(
        n_mels=80, n_vocab=1000,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
        alignment_heads=heads,
    )
    export_mlx_whisper(init_params(config, seed=0), config, tmp_path / "m")
    _, c2 = load_mlx_whisper(tmp_path / "m")
    assert c2.alignment_heads == heads
    # and a config WITHOUT the mask loads as None (fallback applies)
    export_mlx_whisper(init_params(config, seed=0),
                       dataclasses.replace(config, alignment_heads=None),
                       tmp_path / "m0")
    _, c0 = load_mlx_whisper(tmp_path / "m0")
    assert c0.alignment_heads is None


def test_add_word_timestamps_distribution(monkeypatch):
    """Distribution of aligned words back onto segments, isolated from the
    model: find_alignment is stubbed with a known alignment."""
    from whisper_mlx_tpu.inference import word_timestamps as wt
    from whisper_mlx_tpu.inference.transcribe import Segment

    tok = make_synthetic_tokenizer()
    t_hello = tok.encode(" hello")
    t_world = tok.encode(" world")

    seg1 = Segment(id=0, seek=0, start=0.0, end=2.0, text=" hello",
                   tokens=list(t_hello), temperature=0.0, avg_logprob=-0.5,
                   compression_ratio=1.0, no_speech_prob=0.1)
    seg2 = Segment(id=1, seek=0, start=2.0, end=4.0, text=" world",
                   tokens=list(t_world), temperature=0.0, avg_logprob=-0.5,
                   compression_ratio=1.0, no_speech_prob=0.1)

    fake = [
        WordTiming(" hello", list(t_hello), 0.4, 1.6, 0.9),
        WordTiming(" world", list(t_world), 2.1, 3.5, 0.8),
    ]
    monkeypatch.setattr(wt, "find_alignment", lambda *a, **k: list(fake))

    config = WhisperConfig()
    wt.add_word_timestamps([seg1, seg2], None, config, tok,
                           np.zeros((3000, 80), np.float32), time_offset=10.0)
    assert seg1.words == [{"word": " hello", "start": 10.4, "end": 11.6, "probability": 0.9}]
    assert seg2.words == [{"word": " world", "start": 12.1, "end": 13.5, "probability": 0.8}]
    # segment boundaries snapped to word boundaries
    assert seg1.start == 10.4 and seg1.end == 11.6


def test_native_dtw_matches_numpy():
    """C++ DTW kernel (native/audio.cc) vs the NumPy implementation."""
    import subprocess
    import sys
    from pathlib import Path

    so = Path("whisper_mlx_tpu/native/libwhisper_tpu_native.so")
    if not so.exists():
        rc = subprocess.run([sys.executable, "-m", "whisper_mlx_tpu.native.build"]).returncode
        if rc != 0:
            pytest.skip("native build failed")
    import importlib

    import whisper_mlx_tpu.native as native

    importlib.reload(native)
    assert native.lib is not None and hasattr(native.lib, "dtw")

    from whisper_mlx_tpu.inference.word_timestamps import dtw as py_dtw

    rng = np.random.default_rng(0)
    for n, m in ((5, 40), (20, 300), (1, 7)):
        cost = rng.random((n, m)).astype(np.float32)
        # numpy reference path (bypass the native fast path inside dtw())
        import whisper_mlx_tpu.native as nat_mod

        saved = nat_mod.lib
        nat_mod.lib = None
        try:
            ref_t, ref_f = py_dtw(cost)
        finally:
            nat_mod.lib = saved
        got_t, got_f = native.lib.dtw(cost)
        ref_cost = sum(cost[a, b] for a, b in zip(ref_t, ref_f))
        got_cost = sum(cost[a, b] for a, b in zip(got_t, got_f))
        assert abs(ref_cost - got_cost) < 1e-4
        np.testing.assert_array_equal(got_t, ref_t)
        np.testing.assert_array_equal(got_f, ref_f)
