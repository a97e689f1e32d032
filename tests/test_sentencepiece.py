"""Binary sentencepiece ``.model`` compatibility (VERDICT round-1 item 5).

The fixture is a hand-encoded protobuf binary (via serialize_model_proto,
itself covered by a byte-level round-trip against a manually packed message),
so the parser is tested against the real wire format, not against itself.
"""
import struct
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.utils.sentencepiece_model import (
    TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN, SentencePieceVocab,
    parse_model_proto, serialize_model_proto)
from end_to_end_asr_pytorch_tpu.utils.text import (
    SentencePieceTextEncoder, load_text_encoder)

PIECES = [
    ("<pad>", 0.0, TYPE_CONTROL),
    ("</s>", 0.0, TYPE_CONTROL),
    ("<unk>", 0.0, TYPE_UNKNOWN),
    ("▁hello", -1.0, TYPE_NORMAL),
    ("▁he", -2.0, TYPE_NORMAL),
    ("llo", -2.5, TYPE_NORMAL),
    ("▁world", -1.2, TYPE_NORMAL),
    ("▁w", -3.0, TYPE_NORMAL),
    ("orld", -3.5, TYPE_NORMAL),
    ("▁", -4.0, TYPE_NORMAL),
    ("h", -5.0, TYPE_NORMAL),
    ("e", -5.0, TYPE_NORMAL),
    ("l", -5.0, TYPE_NORMAL),
    ("o", -5.0, TYPE_NORMAL),
]


def test_wire_format_hand_packed():
    """Parse a message packed byte-by-byte from the protobuf spec."""
    piece = "▁hi".encode("utf-8")  # 5 bytes
    sub = (b"\x0a" + bytes([len(piece)]) + piece       # field 1 (piece), wt 2
           + b"\x15" + struct.pack("<f", -1.5)          # field 2 (score), wt 5
           + b"\x18\x01")                               # field 3 (type=NORMAL)
    msg = b"\x0a" + bytes([len(sub)]) + sub             # ModelProto.pieces[0]
    out = parse_model_proto(msg)
    assert out == [("▁hi", -1.5, TYPE_NORMAL)]


def test_wire_format_skips_unknown_fields():
    """Real .model files carry trainer_spec (field 2) etc. — must be skipped."""
    piece = b"x"
    sub = b"\x0a\x01" + piece
    trainer_spec = b"\x12\x03abc"     # ModelProto field 2, length-delimited
    version = b"\x28\x07"             # a varint field we don't know
    msg = trainer_spec + b"\x0a" + bytes([len(sub)]) + sub + version
    out = parse_model_proto(msg)
    assert out == [("x", 0.0, TYPE_NORMAL)]


def test_serialize_parse_roundtrip():
    data = serialize_model_proto(PIECES)
    out = parse_model_proto(data)
    assert [(p, t) for p, _, t in out] == [(p, t) for p, _, t in PIECES]
    assert [s for _, s, _ in out] == pytest.approx(
        [s for _, s, _ in PIECES], abs=1e-6)  # scores stored as float32


@pytest.fixture()
def model_file(tmp_path):
    p = tmp_path / "bpe.model"
    p.write_bytes(serialize_model_proto(PIECES))
    return str(p)


def test_load_text_encoder_sniffs_binary(model_file):
    enc = load_text_encoder("subword", model_file)
    assert isinstance(enc, SentencePieceTextEncoder)
    assert enc.vocab_size == len(PIECES)


def test_viterbi_picks_best_segmentation(model_file):
    enc = load_text_encoder("subword", model_file)
    # "hello" -> single piece ▁hello (-1.0) beats ▁he+llo (-4.5)
    assert enc.encode("hello") == [3, 1]
    # "world" -> ▁world; both words + eos
    assert enc.encode("hello world") == [3, 6, 1]
    # force the split path: "helloo" has no single piece
    assert enc.encode("helloo") == [3, 13, 1]


def test_decode_roundtrip(model_file):
    enc = load_text_encoder("subword", model_file)
    for text in ("hello world", "hello", "world hello hello"):
        assert enc.decode(enc.encode(text)) == text


def test_unknown_char_maps_to_unk(model_file):
    enc = load_text_encoder("subword", model_file)
    ids = enc.encode("hez")  # 'z' has no piece
    assert enc.unk_idx in ids


def test_bad_index_contract_raises(tmp_path):
    bad = [("a", -1.0, TYPE_NORMAL)] + PIECES
    p = tmp_path / "bad.model"
    p.write_bytes(serialize_model_proto(bad))
    with pytest.raises(ValueError, match="0=<pad>"):
        load_text_encoder("subword", str(p))


def test_json_bpe_still_loads(tmp_path):
    import json
    model = {"vocab": ["<pad>", "<eos>", "<unk>", "▁a", "b"],
             "merges": []}
    p = tmp_path / "bpe.json"
    p.write_text(json.dumps(model))
    enc = load_text_encoder("subword", str(p))
    assert enc.vocab_size == 5
    assert enc.encode("a b")[-1] == 1


def test_vocab_tool_emits_spm_binary(tmp_path):
    """`generate_vocab_file.py --format spm` output loads through the
    sentencepiece reader and round-trips training text."""
    import subprocess
    repo = Path(__file__).resolve().parent.parent
    text = tmp_path / "text.txt"
    text.write_text("the cat sat on the mat\nthe dog sat on the log\n" * 20)
    model = tmp_path / "uni.model"
    r = subprocess.run(
        [sys.executable, str(repo / "util" / "generate_vocab_file.py"),
         "--input_file", str(text), "--mode", "subword",
         "--output_file", str(model), "--vocab_size", "40",
         "--format", "spm"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    enc = load_text_encoder("subword", str(model))
    assert isinstance(enc, SentencePieceTextEncoder)
    for s in ("the cat sat", "dog on log", "the mat"):
        assert enc.decode(enc.encode(s)) == s


def test_truncation_always_valueerror():
    """Every proper prefix of a real model either parses (a whole number of
    pieces survived) or raises ValueError — never IndexError/struct.error
    from the wire-format internals (user-supplied file contract)."""
    blob = serialize_model_proto(PIECES)
    f32 = lambda s: struct.unpack("<f", struct.pack("<f", s))[0]
    expect = [(p, f32(s), t) for p, s, t in PIECES]
    for cut in range(len(blob)):
        data = blob[:cut]
        try:
            out = parse_model_proto(data)
        except ValueError:
            continue
        assert out == expect[:len(out)] and len(out) >= 1


def test_fuzz_random_bytes_valueerror_only():
    """Deterministic byte-blob fuzz: arbitrary garbage must parse or raise
    ValueError — no other exception type escapes."""
    import random
    rng = random.Random(0xA5)
    for trial in range(400):
        data = bytes(rng.getrandbits(8) for _ in range(rng.randrange(0, 96)))
        try:
            parse_model_proto(data)
        except ValueError:
            pass


def test_fuzz_bitflips_on_real_model_valueerror_only():
    """Single-byte corruptions of a real model: same exception contract,
    and any successful parse still yields (str, float, int) triples."""
    import random
    blob = serialize_model_proto(PIECES)
    rng = random.Random(0x5A)
    for trial in range(400):
        i = rng.randrange(len(blob))
        data = blob[:i] + bytes([rng.getrandbits(8)]) + blob[i + 1:]
        try:
            out = parse_model_proto(data)
        except ValueError:
            continue
        for piece, score, ptype in out:
            assert isinstance(piece, str)
            assert isinstance(score, float)
            assert isinstance(ptype, int)
