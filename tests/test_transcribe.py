"""End-to-end transcribe() pipeline on a tiny random model.

With random weights the *text* is meaningless, but the pipeline invariants
(reference contract, SURVEY.md §2.1) must hold: dict shape, monotone
segment times, seek-loop termination on long audio, writer outputs, CLI.
"""

import json

import numpy as np
import pytest

import torch  # noqa: F401  — import order (see conftest)
import jax.numpy as jnp

from tests.conftest import make_speechy_audio
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
from whisper_mlx_tpu.inference.transcribe import transcribe
from whisper_mlx_tpu.models.whisper import WhisperConfig, init_params


@pytest.fixture(scope="module")
def tiny():
    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    return init_params(config, seed=0), config, tok


def test_transcribe_contract(tiny):
    params, config, tok = tiny
    audio = make_speechy_audio(seconds=5.0)
    result = transcribe(
        audio, params=params, config=config, tokenizer=tok,
        temperature=0.0, verbose=False,
    )
    assert set(result) >= {"text", "segments", "language"}
    assert isinstance(result["text"], str)
    assert result["language"] == "en"
    for seg in result["segments"]:
        assert seg["start"] <= seg["end"]
        assert set(seg) >= {"id", "seek", "start", "end", "text", "tokens",
                            "temperature", "avg_logprob", "compression_ratio",
                            "no_speech_prob"}


def test_transcribe_long_audio_terminates(tiny):
    """70 s of audio → multiple windows; the seek loop must always advance."""
    params, config, tok = tiny
    audio = make_speechy_audio(seconds=70.0)
    result = transcribe(
        audio, params=params, config=config, tokenizer=tok,
        temperature=0.0, condition_on_previous_text=False, verbose=False,
    )
    seeks = [seg["seek"] for seg in result["segments"]]
    assert seeks == sorted(seeks)


def test_transcribe_batched_mode(tiny):
    params, config, tok = tiny
    audio = make_speechy_audio(seconds=70.0)
    result = transcribe(
        audio, params=params, config=config, tokenizer=tok,
        temperature=0.0, batch_windows=True, window_batch_size=2, verbose=False,
    )
    assert set(result) >= {"text", "segments", "language"}
    starts = [seg["start"] for seg in result["segments"]]
    assert starts == sorted(starts)


def test_writers(tiny, tmp_path):
    from whisper_mlx_tpu.inference.writers import get_writer

    result = {
        "text": "hello world",
        "segments": [
            {"start": 0.0, "end": 1.5, "text": " hello"},
            {"start": 1.5, "end": 3661.25, "text": " world"},
        ],
        "language": "en",
    }
    get_writer("all", tmp_path)(result, "out")
    assert (tmp_path / "out.txt").read_text() == "hello\nworld\n"
    srt = (tmp_path / "out.srt").read_text()
    assert "00:00:00,000 --> 00:00:01,500" in srt
    assert "01:01:01,250" in srt
    vtt = (tmp_path / "out.vtt").read_text()
    assert vtt.startswith("WEBVTT")
    assert "00:00.000 --> 00:01.500" in vtt
    tsv = (tmp_path / "out.tsv").read_text().splitlines()
    assert tsv[0] == "start\tend\ttext"
    assert tsv[1] == "0\t1500\thello"
    assert json.loads((tmp_path / "out.json").read_text())["language"] == "en"


def test_cli_runs(tiny, tmp_path, monkeypatch):
    """CLI surface parity with the reference launcher flags (run:3-6)."""
    import struct

    from whisper_mlx_tpu import cli

    audio = make_speechy_audio(seconds=2.0)
    pcm16 = (np.clip(audio, -1, 1) * 32767).astype("<i2")
    data = pcm16.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16_000, 32_000, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    wav = tmp_path / "in.wav"
    wav.write_bytes(hdr + data)

    params, config, tok = tiny
    monkeypatch.setattr(cli, "load_model", lambda m, d: (params, config, tok))
    rc = cli.main([
        str(wav), "-f", "txt", "--output-name", "result",
        "--output-dir", str(tmp_path),
        "--condition-on-previous-text", "False",
        "--hallucination-silence-threshold", "1",
        "--temperature-increment-on-fallback", "none",
        "--verbose", "False",
    ])
    assert rc == 0
    assert (tmp_path / "result.txt").exists()


def test_stage_timer_in_result(tiny):
    """transcribe() reports per-stage timing (runtime/profiling)."""
    params, config, tok = tiny
    audio = make_speechy_audio(seconds=3.0)
    result = transcribe(audio, params=params, config=config, tokenizer=tok,
                        temperature=0.0, verbose=False)
    stages = result["stages"]
    assert {"mel", "encode", "decode"} <= set(stages)
    for s in stages.values():
        assert s["count"] >= 1 and s["total_ms"] >= 0


def test_stage_timer_unit():
    import time

    from whisper_mlx_tpu.runtime.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_ms"] >= 10


def test_clip_timestamps(tiny):
    """clip_timestamps restricts transcription to given ranges (reference
    option surface)."""
    params, config, tok = tiny
    audio = make_speechy_audio(seconds=70.0)
    result = transcribe(
        audio, params=params, config=config, tokenizer=tok,
        temperature=0.0, clip_timestamps="0,30", verbose=False,
        condition_on_previous_text=False,
    )
    # all segments start inside the clip window
    assert all(seg["seek"] < 3000 for seg in result["segments"])


def test_batched_word_timestamps(tiny):
    params, config, tok = tiny
    audio = make_speechy_audio(seconds=35.0)
    result = transcribe(
        audio, params=params, config=config, tokenizer=tok,
        temperature=0.0, batch_windows=True, window_batch_size=2,
        word_timestamps=True, no_speech_threshold=None, verbose=False,
    )
    assert any("words" in seg for seg in result["segments"])
