"""Tokenizer tests: round-trips, index contract, CTC collapse (SURVEY.md 2.9)."""
import json
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.utils.text import (
    CharacterTextEncoder,
    SubwordTextEncoder,
    WordTextEncoder,
    load_text_encoder,
    PAD_IDX,
    EOS_IDX,
    UNK_IDX,
)

REPO = Path(__file__).resolve().parent.parent


def _char_encoder():
    vocab = CharacterTextEncoder.RESERVED + list("abcdefghijklmnopqrstuvwxyz'") + ["<space>"]
    return CharacterTextEncoder(vocab)


def test_index_contract():
    enc = _char_encoder()
    assert PAD_IDX == 0 and EOS_IDX == 1 and UNK_IDX == 2
    assert enc.pad_idx == 0 and enc.eos_idx == 1 and enc.unk_idx == 2


def test_char_roundtrip():
    enc = _char_encoder()
    ids = enc.encode("hello world")
    assert ids[-1] == EOS_IDX
    assert enc.decode(ids) == "hello world"


def test_char_unk():
    enc = _char_encoder()
    ids = enc.encode("a#b")
    assert UNK_IDX in ids


def test_ctc_collapse():
    enc = _char_encoder()
    a = enc.encode("a")[0]
    b = enc.encode("b")[0]
    seq = [0, a, a, 0, a, b, b, 0, 0]
    assert enc.decode(seq, ignore_repeat=True) == "aab"
    # without collapse, repeats stay, blanks still dropped
    assert enc.decode([a, a, b], ignore_repeat=False) == "aab"


def test_decode_stops_at_eos():
    enc = _char_encoder()
    a = enc.encode("a")[0]
    assert enc.decode([a, EOS_IDX, a, a]) == "a"


def test_word_roundtrip():
    enc = WordTextEncoder(WordTextEncoder.RESERVED + ["hello", "world"])
    ids = enc.encode("hello world hello")
    assert enc.decode(ids) == "hello world hello"
    assert enc.encode("nope")[0] == UNK_IDX


def test_vocab_tool_and_subword_roundtrip(tmp_path):
    corpus = tmp_path / "corpus.txt"
    text = "\n".join(
        ["the cat sat on the mat", "the dog sat on the log", "cats and dogs", "the the the"]
    )
    corpus.write_text(text)
    model = tmp_path / "bpe.json"
    subprocess.run(
        [sys.executable, str(REPO / "util" / "generate_vocab_file.py"),
         "--input_file", str(corpus), "--mode", "subword",
         "--output_file", str(model), "--vocab_size", "40"],
        check=True,
    )
    enc = load_text_encoder("subword", str(model))
    assert enc.vocab_size <= 40
    ids = enc.encode("the cat sat")
    assert ids[-1] == EOS_IDX
    assert enc.decode(ids) == "the cat sat"
    # unseen word should still encode (chars seen) and round-trip
    assert enc.decode(enc.encode("dog cat")) == "dog cat"


def test_vocab_tool_character(tmp_path):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("abc abd\nxyz")
    out = tmp_path / "vocab.txt"
    subprocess.run(
        [sys.executable, str(REPO / "util" / "generate_vocab_file.py"),
         "--input_file", str(corpus), "--mode", "character", "--output_file", str(out)],
        check=True,
    )
    enc = load_text_encoder("character", str(out))
    assert enc.decode(enc.encode("abc xyz")) == "abc xyz"


def test_native_bpe_matches_python(tmp_path):
    from end_to_end_asr_pytorch_tpu.utils import native
    if not native.available():
        pytest.skip("native lib not built")
    corpus = tmp_path / "c.txt"
    corpus.write_text("\n".join(
        ["the quick brown fox", "the lazy dog", "quick quick fox",
         "jumps over the lazy dog", "unicode café naïve"]))
    model = tmp_path / "bpe.json"
    subprocess.run(
        [sys.executable, str(REPO / "util" / "generate_vocab_file.py"),
         "--input_file", str(corpus), "--mode", "subword",
         "--output_file", str(model), "--vocab_size", "60"], check=True)
    enc = load_text_encoder("subword", str(model))
    assert enc._native is not None
    for text in ["the quick brown fox", "lazy dog jumps", "zzz unseen",
                 "café naïve", ""]:
        assert enc.encode(text) == enc.encode_py(text), text
        if text:
            # round-trip through decode still works on the native ids
            assert enc.decode(enc.encode(text)) == enc.decode(
                enc.encode_py(text))
