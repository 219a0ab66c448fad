"""WER harness correctness (the BASELINE metric implementation)."""

from whisper_mlx_tpu.inference.wer import corpus_wer, edit_distance, normalize_text, wer


def test_normalize_text():
    assert normalize_text("Hello, World!") == "hello world"
    assert normalize_text("I can't  go") == "i cannot go"
    assert normalize_text("they're won't") == "they are will not"


def test_edit_distance_exact():
    assert edit_distance(["a", "b", "c"], ["a", "b", "c"]) == (0, 0, 0, 0)
    s, d, i, e = edit_distance(["a", "b", "c"], ["a", "x", "c"])
    assert (s, d, i, e) == (1, 0, 0, 1)
    s, d, i, e = edit_distance(["a", "b", "c"], ["a", "c"])
    assert (s, d, i, e) == (0, 1, 0, 1)
    s, d, i, e = edit_distance(["a", "c"], ["a", "b", "c"])
    assert (s, d, i, e) == (0, 0, 1, 1)


def test_wer_values():
    r = wer("the cat sat on the mat", "the cat sat on the mat")
    assert r["wer"] == 0.0
    r = wer("the cat sat", "the dog sat")
    assert abs(r["wer"] - 1 / 3) < 1e-9
    r = wer("Hello, world!", "hello world")  # normalization handles punctuation
    assert r["wer"] == 0.0


def test_corpus_wer_weighting():
    pairs = [("a b c d", "a b c d"), ("x y", "x z")]  # 1 error / 6 words
    stats = corpus_wer(pairs)
    assert abs(stats["wer"] - 1 / 6) < 1e-9
    assert stats["utterances"] == 2


def test_harness_end_to_end(tmp_path, capsys):
    """FULL eval harness smoke on 3 synthetic utterances (VERDICT r4 #8):
    wav+ref corpus dir -> scripts/eval_wer.py main() -> load_model
    ('test-tiny' random 64-dim) -> transcribe -> normalize -> corpus WER.
    The day real weights land, swapping --model makes this the
    LibriSpeech rung (docs/wer_protocol.md)."""
    import struct
    import sys
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import eval_wer

    rng = np.random.default_rng(0)
    for i, ref in enumerate(["hello world", "the cat sat", "one two three"]):
        sr = 16000
        t = np.arange(int(1.5 * sr)) / sr
        tone = np.sin(2 * np.pi * (220 + 110 * i) * t)
        pcm = ((tone + 0.05 * rng.standard_normal(t.size)) * 9000).astype(
            np.int16)
        raw = pcm.tobytes()
        hdr = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVEfmt " +
               struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16) +
               b"data" + struct.pack("<I", len(raw)))
        (tmp_path / f"utt{i}.wav").write_bytes(hdr + raw)
        (tmp_path / f"utt{i}.txt").write_text(ref)
    (tmp_path / "orphan.wav").write_bytes(
        (tmp_path / "utt0.wav").read_bytes())  # no ref -> must be skipped

    stats = eval_wer.main([str(tmp_path), "--model", "test-tiny"])
    assert stats["utterances"] == 3
    assert stats["wer"] >= 0.0  # random weights: value meaningless
    assert stats["audio_seconds"] > 4.0
    assert stats["rtf"] > 0.0
    assert "hypothesis words" not in stats  # corpus_wer contract keys only
