"""Bigram-grammar synthetic corpus + text-only LM dataset (the LM-fusion
demonstration data path, BASELINE.md "grammar corpus")."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.data import synthetic
from end_to_end_asr_pytorch_tpu.data.dataset import (TextBatchLoader,
                                                     TextLineDataset,
                                                     load_textset)
from end_to_end_asr_pytorch_tpu.utils.text import load_text_encoder

N_WORDS, BRANCH, HOMO = 40, 3, 8


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = tmp_path_factory.mktemp("grammar")
    synthetic.generate_corpus(
        str(r), n_train=24, n_dev=8, n_test=8, min_words=3, max_words=5,
        word_inventory=N_WORDS, grammar="bigram", branch=BRANCH,
        homophones=HOMO, text_only=200, grammar_in_train=False)
    return r


def _read_split(root, split):
    out = []
    for trans in sorted((root / split).rglob("*.trans.txt")):
        for ln in trans.read_text().splitlines():
            out.append(ln.split(" ", 1)[1].lower().split())
    return out


def test_full_homophone_inventory_rejected(tmp_path):
    """r5 self-review: homophone pairs covering the whole inventory leave
    no legal sentence-start word — reject clearly instead of crashing in
    the start sampler (rng.randint(low >= high))."""
    with pytest.raises(ValueError, match="non-homophone"):
        synthetic.generate_corpus(
            str(tmp_path / "x"), n_train=1, n_dev=1, n_test=1, min_words=2,
            max_words=3, word_inventory=16, grammar="bigram", branch=2,
            homophones=8)


def test_mixed_text_and_corpus_split_rejected(root):
    """r5 self-review: a split list mixing .txt files and transcript dirs
    must fail with a clear message, not fall through to the audio glob."""
    from end_to_end_asr_pytorch_tpu.data.dataset import _make_textset
    tok = load_text_encoder("word", str(root / "vocab.txt")) \
        if (root / "vocab.txt").exists() else None
    with pytest.raises(ValueError, match="cannot mix"):
        _make_textset({"path": str(root)},
                      ["lm_text.txt", "train-clean"], tok)


def test_grammar_governs_dev_test_and_lm_text(root):
    words = synthetic.make_word_inventory(N_WORDS)
    idx = {w: i for i, w in enumerate(words)}
    succ = synthetic.make_bigram_grammar(N_WORDS, BRANCH)
    lm_lines = [ln.split() for ln in
                (root / "lm_text.txt").read_text().splitlines()]
    assert len(lm_lines) == 200
    for sents in (_read_split(root, "dev-clean"),
                  _read_split(root, "test-clean"), lm_lines):
        for sent in sents:
            assert idx[sent[0]] >= 2 * HOMO  # non-homophone start
            for a, b in zip(sent, sent[1:]):
                assert idx[b] in succ[idx[a]]


def test_uniform_train_violates_grammar(root):
    """grammar_in_train=False: train word order must NOT follow the
    successor table (the decoder's implicit LM gets nothing to learn)."""
    words = synthetic.make_word_inventory(N_WORDS)
    idx = {w: i for i, w in enumerate(words)}
    succ = synthetic.make_bigram_grammar(N_WORDS, BRANCH)
    violations = total = 0
    for sent in _read_split(root, "train-clean"):
        for a, b in zip(sent, sent[1:]):
            total += 1
            violations += idx[b] not in succ[idx[a]]
    # uniform sampling obeys a random bigram with prob BRANCH/N_WORDS
    assert violations / total > 0.5


def test_homophone_pairs_render_identical_audio(root):
    """Pair members differ in spelling but must be acoustically identical:
    re-render both spellings with the same rng state and check the pair
    maps to the first member's audio."""
    words = synthetic.make_word_inventory(N_WORDS)
    rng_a = np.random.RandomState(0)
    rng_b = np.random.RandomState(0)
    wav_a = synthetic.render(words[0], rng_a)
    wav_b = synthetic.render(words[0], rng_b)  # spoken form of words[1]
    np.testing.assert_array_equal(wav_a, wav_b)
    # and the corpus generator actually substitutes: find a dev/test
    # sentence containing an odd pair member and confirm its audio length
    # matches the substituted (even member) spelling, when lengths differ
    pair = {2 * h + 1: 2 * h for h in range(HOMO)}
    idx = {w: i for i, w in enumerate(words)}
    checked = 0
    for split in ("dev-clean", "test-clean", "train-clean"):
        for trans in sorted((root / split).rglob("*.trans.txt")):
            for ln in trans.read_text().splitlines():
                utt, text = ln.split(" ", 1)
                sent = text.lower().split()
                ids = [idx[w] for w in sent]
                if not any(i in pair for i in ids):
                    continue
                spoken = " ".join(words[pair.get(i, i)] for i in ids)
                n_expect = int(synthetic.SR * synthetic.CHAR_DUR) * len(spoken)
                wav_file = trans.parent / f"{utt}.wav"
                import wave
                with wave.open(str(wav_file)) as wf:
                    assert wf.getnframes() == n_expect
                checked += 1
    assert checked > 0


def test_textline_dataset_and_load_textset(root):
    tok = load_text_encoder("character", str(root / "vocab.txt"))
    ds = TextLineDataset(str(root), ["lm_text.txt"], tok)
    assert len(ds) == 200
    assert ds.text_ids(0) == tok.encode(ds.text_raw(0))
    loader = TextBatchLoader(ds, 16, shuffle=False)
    batch = next(iter(loader))
    assert batch["text"].shape[0] == 16
    assert (batch["text_len"] > 0).all()
    # load_textset dispatches .txt splits to TextLineDataset and keeps
    # transcript splits on the audio-corpus path
    tr, dv, vocab, tok2, msg = load_textset(
        0, False, False,
        {"path": str(root), "train_split": ["lm_text.txt"],
         "dev_split": ["dev-clean"], "batch_size": 8},
        {"mode": "character", "vocab_file": str(root / "vocab.txt")})
    assert len(tr.ds) == 200 and len(dv.ds) == 8
