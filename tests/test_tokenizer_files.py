"""Tokenizer file-loading + BPE parity vs the HF `tokenizers` oracle.

No real Whisper vocab ships in this image, so a small GPT-2-style BPE is
synthesized (vocab.json + merges.txt), loaded through our loader AND
through `tokenizers.ByteLevelBPETokenizer`, and encodings must match —
this pins the merge-rank algorithm and the byte-level pretokenization.
"""

import json

import pytest

from whisper_mlx_tpu.decoding.tokenizer import (
    ByteLevelBPE,
    bytes_to_unicode,
    load_tokenizer,
)


def _make_vocab_files(tmp_path):
    """Byte alphabet + a few merges (GPT-2 file formats)."""
    b2u = bytes_to_unicode()
    vocab = {c: i for i, c in enumerate(b2u.values())}
    merges = []

    def add_merge(a, b):
        merged = a + b
        if merged not in vocab:
            vocab[merged] = len(vocab)
        merges.append(f"{a} {b}")

    # build merges for: "th", "the", "Ġthe", "in", "ing"
    add_merge("t", "h")
    add_merge("th", "e")
    add_merge("Ġ", "the")
    add_merge("i", "n")
    add_merge("in", "g")

    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return vocab, merges


@pytest.mark.parametrize("text", [
    "the thing",
    " the theme",
    "nothing in the making",
    "unicode: héllo ‰ 日本",
])
def test_bpe_matches_hf_tokenizers(tmp_path, text):
    vocab, merges = _make_vocab_files(tmp_path)

    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel

    hf = Tokenizer(BPE.from_file(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    ))
    hf.pre_tokenizer = ByteLevel(add_prefix_space=False, use_regex=True)

    ours = ByteLevelBPE(vocab, [tuple(m.split()) for m in merges])
    assert ours.encode(text) == hf.encode(text).ids
    assert ours.decode(ours.encode(text)) == text


def test_load_tokenizer_from_hf_files(tmp_path):
    _make_vocab_files(tmp_path)
    tok = load_tokenizer(tmp_path, language="de", task="translate")
    ids = tok.encode("the thing")
    assert tok.decode(ids) == "the thing"
    # special layout sits on top of the file vocab
    assert tok.sot == tok.n_base + 1
    assert tok.sot_sequence[1] == tok.language_token("de")
    assert tok.sot_sequence[2] == tok.translate


def test_load_tokenizer_missing_files(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_tokenizer(tmp_path / "nope_dir_without_files")
