"""Synthetic tone-code speech corpus for CI and benchmarking.

Generates a corpus in the LibriSpeech directory layout (so the
``corpus/librispeech.py`` walker is the single tested code path, SURVEY.md
section 4's "tiny synthetic corpus" test strategy): each character of the
transcript is rendered as a fixed-duration tone whose frequency encodes the
character, giving an exactly learnable audio->text mapping that a small model
fits in minutes on one chip.
"""
from __future__ import annotations

import string
from pathlib import Path

import numpy as np

from .audio_io import write_wav

SR = 16000
CHAR_DUR = 0.08          # seconds per character tone
WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]

# syllable pieces for the generated large word inventory (subword-scale
# corpora: enough distinct words that a ~1k BPE/sentencepiece vocab is
# meaningful, SURVEY.md section 6 realistic-vocab evidence)
SYLLABLES = [c + v for c in "bcdfghjklmnprstvwz" for v in "aeiou"]


def make_word_inventory(n: int, seed: int = 1234) -> list:
    """Deterministic list of ``n`` distinct 2-3 syllable pseudo-words.
    Fixed seed (independent of the corpus seed) so train/dev/test share
    one inventory."""
    rng = np.random.RandomState(seed)
    seen, out = set(), []
    while len(out) < n:
        w = "".join(SYLLABLES[rng.randint(len(SYLLABLES))]
                    for _ in range(rng.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def _char_freq(c: str) -> float:
    if c == " ":
        return 0.0
    idx = string.ascii_lowercase.index(c)
    return 220.0 * (2.0 ** (idx / 12.0))  # semitone ladder from A3


def render(text: str, rng: np.random.RandomState) -> np.ndarray:
    n = int(SR * CHAR_DUR)
    t = np.arange(n) / SR
    chunks = []
    for c in text.lower():
        f = _char_freq(c)
        if f == 0.0:
            chunks.append(np.zeros(n, np.float32))
        else:
            env = np.hanning(n).astype(np.float32)
            tone = 0.4 * np.sin(2 * np.pi * f * t) + 0.15 * np.sin(4 * np.pi * f * t)
            chunks.append((tone * env).astype(np.float32))
    wave = np.concatenate(chunks) if chunks else np.zeros(n, np.float32)
    wave = wave + rng.randn(len(wave)).astype(np.float32) * 0.01
    return wave


def generate_corpus(root: str, n_train: int = 64, n_dev: int = 16,
                    n_test: int = 16, seed: int = 0,
                    min_words: int = 1, max_words: int = 3,
                    word_inventory: int = 0) -> Path:
    """Writes <root>/{train,dev,test}-clean/<spk>/<chap>/*.wav + trans.txt.
    Returns the root path. Deterministic for a given seed.
    ``word_inventory > 0`` swaps the 14 NATO words for that many generated
    pseudo-words (subword-vocab-scale corpora)."""
    rng = np.random.RandomState(seed)
    words = (make_word_inventory(word_inventory) if word_inventory > 0
             else WORDS)
    root_p = Path(root)
    for split, n_utt in (("train-clean", n_train), ("dev-clean", n_dev),
                         ("test-clean", n_test)):
        chap_dir = root_p / split / "1" / "1"
        chap_dir.mkdir(parents=True, exist_ok=True)
        lines = []
        for i in range(n_utt):
            n_words = rng.randint(min_words, max_words + 1)
            text = " ".join(words[rng.randint(len(words))]
                            for _ in range(n_words))
            utt_id = f"1-1-{i:04d}"
            write_wav(str(chap_dir / f"{utt_id}.wav"), render(text, rng), SR)
            lines.append(f"{utt_id} {text.upper()}")
        (chap_dir / "1-1.trans.txt").write_text("\n".join(lines) + "\n")
    # vocab file for character mode
    chars = sorted(set(string.ascii_lowercase)) + ["<space>"]
    (root_p / "vocab.txt").write_text("\n".join(chars) + "\n")
    return root_p
