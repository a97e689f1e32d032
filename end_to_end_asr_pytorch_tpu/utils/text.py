"""Tokenizers: character / word / subword (BPE).

Capability parity with the reference's ``src/text.py`` (SURVEY.md 2.9):
``load_text_encoder(mode, vocab_file)`` returning an encoder with
``encode``/``decode``/``vocab_size``, sharing the index contract

    0 = <pad>   (also the CTC blank and the cross-entropy ignore_index)
    1 = <eos>   (doubles as the decoder's <sos> start token)
    2 = <unk>

``decode(idxs, ignore_repeat=True)`` performs CTC collapse (merge repeats,
drop blanks) exactly as the reference does for its CTC head output.

Subword mode accepts BOTH formats the ecosystem uses:
- binary sentencepiece ``.model`` files (the reference's format — parsed by
  ``utils/sentencepiece_model.py``, no sentencepiece dependency, unigram
  Viterbi segmentation), so existing reference vocab assets port over as-is;
- the self-contained JSON-BPE produced by ``util/generate_vocab_file.py``.
The file is sniffed by content (JSON starts with ``{``), not extension.
"""
from __future__ import annotations

import abc
import json
from typing import List, Sequence

PAD_IDX = 0
EOS_IDX = 1  # also used as <sos>
UNK_IDX = 2


class TextEncoder(abc.ABC):
    """Common interface for all tokenizers (mirrors reference src/text.py)."""

    RESERVED = ["<pad>", "<eos>", "<unk>"]

    @property
    @abc.abstractmethod
    def vocab_size(self) -> int: ...

    @abc.abstractmethod
    def encode(self, text: str) -> List[int]:
        """Text -> token ids, with <eos> appended."""

    @abc.abstractmethod
    def _id_to_piece(self, idx: int) -> str: ...

    @property
    def pad_idx(self) -> int:
        return PAD_IDX

    @property
    def eos_idx(self) -> int:
        return EOS_IDX

    @property
    def unk_idx(self) -> int:
        return UNK_IDX

    def decode(self, idxs: Sequence[int], ignore_repeat: bool = False) -> str:
        """Ids -> text. ``ignore_repeat=True`` applies CTC collapse:
        consecutive duplicates merged, then blanks (=pad=0) dropped."""
        crop = []
        prev = None
        for i in idxs:
            i = int(i)
            if i == EOS_IDX:
                break
            if ignore_repeat and prev is not None and i == prev:
                prev = i
                continue
            prev = i
            if i == PAD_IDX:
                continue
            crop.append(i)
        return self._join([self._id_to_piece(i) for i in crop])

    def _join(self, pieces: List[str]) -> str:
        return "".join(pieces)


class CharacterTextEncoder(TextEncoder):
    """One id per character. Vocab file: one char per line ('<space>' for ' ')."""

    def __init__(self, vocab_list: List[str]):
        assert vocab_list[:3] == self.RESERVED, "vocab must start with reserved tokens"
        self._vocab = vocab_list
        self._idx = {tok: i for i, tok in enumerate(vocab_list)}

    @classmethod
    def load_from_file(cls, vocab_file: str) -> "CharacterTextEncoder":
        with open(vocab_file, "r", encoding="utf-8") as f:
            chars = [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]
        return cls(cls.RESERVED + [c for c in chars if c not in cls.RESERVED])

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    def encode(self, text: str) -> List[int]:
        ids = [self._idx.get("<space>" if c == " " else c, UNK_IDX) for c in text]
        return ids + [EOS_IDX]

    def _id_to_piece(self, idx: int) -> str:
        tok = self._vocab[idx]
        return " " if tok == "<space>" else tok


class WordTextEncoder(TextEncoder):
    """One id per whitespace-separated word. Vocab file: one word per line."""

    def __init__(self, vocab_list: List[str]):
        assert vocab_list[:3] == self.RESERVED
        self._vocab = vocab_list
        self._idx = {tok: i for i, tok in enumerate(vocab_list)}

    @classmethod
    def load_from_file(cls, vocab_file: str) -> "WordTextEncoder":
        with open(vocab_file, "r", encoding="utf-8") as f:
            words = [ln.strip() for ln in f if ln.strip()]
        return cls(cls.RESERVED + [w for w in words if w not in cls.RESERVED])

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    def encode(self, text: str) -> List[int]:
        ids = [self._idx.get(w, UNK_IDX) for w in text.split()]
        return ids + [EOS_IDX]

    def _id_to_piece(self, idx: int) -> str:
        return self._vocab[idx]

    def _join(self, pieces: List[str]) -> str:
        return " ".join(pieces)


class SubwordTextEncoder(TextEncoder):
    """Greedy-merge BPE. Model = JSON {vocab: [...], merges: [[a,b], ...]}.

    Word-boundary convention: a leading U+2581 LOWER ONE EIGHTH BLOCK marks a
    word-initial piece (sentencepiece-style), so decode is reversible.
    """

    BOUNDARY = "▁"

    def __init__(self, vocab_list: List[str], merges: List[List[str]]):
        assert vocab_list[:3] == self.RESERVED
        self._vocab = vocab_list
        self._idx = {tok: i for i, tok in enumerate(vocab_list)}
        self._merge_rank = {tuple(m): r for r, m in enumerate(merges)}
        # native C++ encode path (the reference's sentencepiece was C++ too)
        self._native = None
        try:
            from . import native
            if native.available():
                self._native = native.BpeEncoder(vocab_list, merges, UNK_IDX)
        except Exception:
            self._native = None

    @classmethod
    def load_from_file(cls, vocab_file: str) -> "SubwordTextEncoder":
        with open(vocab_file, "r", encoding="utf-8") as f:
            model = json.load(f)
        return cls(model["vocab"], model["merges"])

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    def _bpe_word(self, word: str) -> List[str]:
        pieces = [self.BOUNDARY + word[0]] + list(word[1:]) if word else []
        while len(pieces) > 1:
            best, best_rank = None, None
            for i in range(len(pieces) - 1):
                r = self._merge_rank.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            pieces = pieces[:best] + [pieces[best] + pieces[best + 1]] + pieces[best + 2:]
        return pieces

    def encode(self, text: str) -> List[int]:
        if self._native is not None:
            return self._native.encode(text) + [EOS_IDX]
        return self.encode_py(text)

    def encode_py(self, text: str) -> List[int]:
        """Pure-Python path (reference implementation for the native one)."""
        ids: List[int] = []
        for word in text.split():
            for piece in self._bpe_word(word):
                ids.append(self._idx.get(piece, UNK_IDX))
        return ids + [EOS_IDX]

    def _id_to_piece(self, idx: int) -> str:
        return self._vocab[idx]

    def _join(self, pieces: List[str]) -> str:
        return "".join(pieces).replace(self.BOUNDARY, " ").strip()


class SentencePieceTextEncoder(TextEncoder):
    """Subword encoder over a binary sentencepiece ``.model`` file.

    Uses the model's own piece ids. Models trained for the reference carry
    the 0=<pad>/blank, 1=<eos>, 2=<unk> layout (its vocab tool trains with
    pad_id=0, eos_id=1, unk_id=2, bos_id=-1); a mismatched layout raises,
    since WER parity silently dies on a wrong index contract.
    """

    def __init__(self, vocab):
        from .sentencepiece_model import TYPE_NORMAL, TYPE_USER_DEFINED
        self._sp = vocab
        if vocab.types[0] in (TYPE_NORMAL, TYPE_USER_DEFINED) or \
                vocab.types[1] in (TYPE_NORMAL, TYPE_USER_DEFINED):
            raise ValueError(
                "sentencepiece model ids 0/1 are normal pieces; this "
                "framework (like the reference) requires 0=<pad> 1=<eos> "
                "2=<unk> — retrain with pad_id=0 eos_id=1 unk_id=2 bos_id=-1")

    @classmethod
    def load_from_file(cls, vocab_file: str) -> "SentencePieceTextEncoder":
        from .sentencepiece_model import SentencePieceVocab
        return cls(SentencePieceVocab.load(vocab_file))

    @property
    def vocab_size(self) -> int:
        return len(self._sp)

    def encode(self, text: str) -> List[int]:
        return self._sp.encode(text) + [EOS_IDX]

    def _id_to_piece(self, idx: int) -> str:
        return self._sp.pieces[idx]

    def _join(self, pieces: List[str]) -> str:
        return "".join(pieces).replace(
            SubwordTextEncoder.BOUNDARY, " ").strip()


def load_text_encoder(mode: str, vocab_file: str) -> TextEncoder:
    """Mirror of reference ``src/text.py:load_text_encoder``."""
    if mode == "character":
        return CharacterTextEncoder.load_from_file(vocab_file)
    if mode == "word":
        return WordTextEncoder.load_from_file(vocab_file)
    if mode == "subword":
        with open(vocab_file, "rb") as f:
            head = f.read(1)
        if head == b"{":  # JSON-BPE (this repo's vocab tool)
            return SubwordTextEncoder.load_from_file(vocab_file)
        return SentencePieceTextEncoder.load_from_file(vocab_file)
    raise NotImplementedError(f"unknown text mode: {mode!r}")
