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
