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


# ---------------------------------------------------------------------------
# Differential oracle vs transformers (VERDICT r3 item 7): the reference's
# word-timing pipeline (mlx_whisper copies openai whisper/timing.py; HF
# transformers ships the same algorithm in generation_whisper.py). With
# identical weights/inputs, each leg must agree: cross-attention collection
# (numeric), median filter (exact), DTW (path-exact incl. tie-breaks), and
# the full post-attention timing pipeline (same weights through ours and
# HF's _extract_token_timestamps).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hf_whisper():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from whisper_mlx_tpu.checkpoint.hf_loader import (
        config_from_hf, convert_hf_whisper_state)

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
    cfg = HFConfig(**hf_cfg)
    cfg._attn_implementation = "eager"  # sdpa cannot output attentions
    model = WhisperForConditionalGeneration(cfg).eval()
    config = config_from_hf(hf_cfg)
    params = convert_hf_whisper_state(model.model.state_dict(), config)
    return model, params, config, tok


def test_dtw_matches_transformers():
    """Path-exact (not just cost-exact) vs HF _dynamic_time_warping,
    including tie-broken cells: quantized cost values provoke exact ties,
    where openai/HF's comparator picks `right` even when diag==down < right.
    HF accumulates cost in float32 — the /16-grid values keep its sums exact
    at these sizes, so any path difference is a tie-break divergence."""
    from transformers.models.whisper.generation_whisper import (
        _dynamic_time_warping)

    rng = np.random.default_rng(7)
    cases = [rng.random((n, m)) for n, m in ((5, 40), (12, 120), (1, 9))]
    cases += [rng.integers(0, 8, size=(n, m)) / 16.0
              for n, m in ((6, 50), (10, 10), (3, 200))]
    for cost in cases:
        ref_t, ref_f = _dynamic_time_warping(-(-cost))  # HF takes the matrix as-is
        got_t, got_f = dtw(cost.astype(np.float64))
        np.testing.assert_array_equal(got_t, ref_t)
        np.testing.assert_array_equal(got_f, ref_f)


def test_median_filter_matches_transformers():
    from transformers.models.whisper.generation_whisper import _median_filter

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 11, 97)).astype(np.float32)
    ours = median_filter(x, 7)
    theirs = _median_filter(torch.from_numpy(x), 7).numpy()
    np.testing.assert_allclose(ours, theirs, atol=0, rtol=0)


def test_cross_attention_matches_hf(hf_whisper):
    """decode_step(collect_cross_attn=True) == HF forward output_attentions:
    the attention-collection leg of the word-timing pipeline is numerically
    the same teacher-forced pass."""
    import jax.numpy as jnp

    from whisper_mlx_tpu.models.whisper import (
        cross_kv, decode_step, encode, init_kv_cache)

    model, params, config, tok = hf_whisper
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((3000, 80)).astype(np.float32) * 0.1
    text = tok.encode(" hello world again and again")
    tokens = list(tok.sot_sequence) + [tok.no_timestamps] + text + [tok.eot]

    states = encode(params, jnp.asarray(mel)[None], config)
    xkv = cross_kv(params, states, config)
    cache = init_kv_cache(config, 1)
    _, _, cross = decode_step(
        params, jnp.asarray([tokens], jnp.int32), jnp.int32(0), cache, xkv,
        config, collect_cross_attn=True)
    ours = np.asarray(cross[:, 0].astype(jnp.float32))  # (L, H, T, 1500)

    with torch.no_grad():
        out = model.model(
            input_features=torch.from_numpy(mel.T[None]),
            decoder_input_ids=torch.tensor([tokens]),
            output_attentions=True)
    for layer in range(config.n_text_layer):
        theirs = out.cross_attentions[layer][0].numpy()  # (H, T, 1500)
        np.testing.assert_allclose(ours[layer], theirs, atol=2e-4,
                                   err_msg=f"layer {layer}")


def test_find_alignment_matches_openai_pipeline_via_hf(hf_whisper):
    """End-to-end word-timing oracle (VERDICT r3 item 7): find_alignment vs
    an independent data path — torch/HF forward cross-attention through the
    openai timing.py pipeline built from TRANSFORMERS' OWN primitives
    (_median_filter, _dynamic_time_warping). Word starts/ends must agree
    within one frame (0.02 s); with identical fp32 inputs they are normally
    bit-equal — the tolerance absorbs jax-vs-torch reduction-order ULPs at
    DTW near-ties.

    Why not HF's _extract_token_timestamps verbatim: HF's extractor has two
    documented algorithmic deltas vs openai/mlx_whisper (the parity target,
    reference run:3-6 -> mlx_whisper -> openai timing.py): it normalizes
    AFTER dropping the prefill rows (openai normalizes over all rows, then
    slices), and it does not renormalize attention after the num_frames
    crop (openai softmaxes after slicing). On trained checkpoints the band-
    diagonal attention makes all variants agree within a frame; on random
    weights the variants legitimately diverge, so the oracle pins the
    openai-spec pipeline while reusing HF's primitives as the independent
    implementation.
    """
    from transformers.models.whisper.generation_whisper import (
        _dynamic_time_warping, _median_filter)

    from whisper_mlx_tpu.inference.word_timestamps import (
        AUDIO_TIME_PER_TOKEN, default_alignment_heads)

    model, params, config, tok = hf_whisper
    heads = default_alignment_heads(config)
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((3000, 80)).astype(np.float32) * 0.1
    text = tok.encode(" hello world again and again")

    for num_frames in (3000, 2000):  # full window + cropped (renorm leg)
        ours = find_alignment(params, config, tok, text, mel,
                              num_frames=num_frames)

        # -- independent path: HF forward + openai-spec post-processing --
        tokens = list(tok.sot_sequence) + [tok.no_timestamps] + text + [tok.eot]
        with torch.no_grad():
            out = model.model(
                input_features=torch.from_numpy(mel.T[None]),
                decoder_input_ids=torch.tensor([tokens]),
                output_attentions=True)
        w = torch.stack([out.cross_attentions[l][0, h] for l, h in heads])
        w = w[:, :, : num_frames // 2]
        w = w / w.sum(-1, keepdim=True).clamp(min=1e-9)
        std, mean = torch.std_mean(w, dim=-2, keepdim=True, unbiased=False)
        w = (w - mean) / std.clamp(min=1e-9)
        w = _median_filter(w, 7)
        matrix = w.mean(dim=0)[len(tok.sot_sequence):-1]
        ti, tj = _dynamic_time_warping(-matrix.double().numpy())
        jumps = np.pad(np.diff(ti), (1, 0), constant_values=1).astype(bool)
        jump_times = tj[jumps] * AUDIO_TIME_PER_TOKEN

        words, word_tokens = tok.split_to_word_tokens(text + [tok.eot])
        bounds = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))
        ref_start = jump_times[bounds[:-1]]
        ref_end = jump_times[bounds[1:]]

        assert [x.word for x in ours] == words[:-1]
        got_start = np.array([x.start for x in ours])
        got_end = np.array([x.end for x in ours])
        np.testing.assert_allclose(got_start, ref_start, atol=0.02 + 1e-9,
                                   err_msg=f"starts (num_frames={num_frames})")
        np.testing.assert_allclose(got_end, ref_end, atol=0.02 + 1e-9,
                                   err_msg=f"ends (num_frames={num_frames})")
