"""Error-rate metrics: edit distance + WER/CER.

Capability parity with the reference's ``src/util.py:cal_er`` (SURVEY.md
2.20): argmax -> (optional CTC collapse) -> detokenize -> Levenshtein per
pair / reference length. The reference used the C++ ``editdistance`` package;
that dependency is replaced by our own native C++ batch Levenshtein
(native/edit_distance.cc via ctypes) with this pure-Python fallback.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def _edit_distance_py(a: Sequence, b: Sequence) -> int:
    """Classic two-row Levenshtein."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance between two token sequences; uses the native C++
    implementation when built, Python otherwise."""
    try:
        from . import native
        if native.available():
            return native.edit_distance(a, b)
    except ImportError:
        pass
    return _edit_distance_py(a, b)


def cal_er(tokenizer, pred: np.ndarray, truth: np.ndarray,
           mode: str = "wer", ctc: bool = False) -> float:
    """Mirror of reference cal_er: batch error rate.

    pred: (B, U, V) logits/log-probs or (B, U) token ids.
    truth: (B, U') padded token ids.
    mode: 'wer' (word) or 'cer' (char). ctc=True applies CTC collapse.
    Returns average of per-utterance dist/ref_len.
    """
    pred = np.asarray(pred)
    if pred.ndim == 3:
        pred = pred.argmax(axis=-1)
    truth = np.asarray(truth)
    hyps, refs = [], []
    for p, t in zip(pred, truth):
        hyp = tokenizer.decode(p.tolist(), ignore_repeat=ctc)
        ref = tokenizer.decode(t.tolist())
        if mode == "wer":
            h, r = hyp.split(), ref.split()
        else:
            h, r = list(hyp), list(ref)
        if len(r) == 0:
            continue
        hyps.append(h)
        refs.append(r)
    if not refs:
        return 0.0
    try:
        from . import native
        if native.available():
            dists = native.edit_distance_batch(hyps, refs)
            return float(np.mean([d / len(r) for d, r in zip(dists, refs)]))
    except ImportError:
        pass
    return float(np.mean([edit_distance(h, r) / len(r)
                          for h, r in zip(hyps, refs)]))
