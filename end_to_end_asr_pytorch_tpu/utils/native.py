"""ctypes bindings to the native C++ runtime library (native/libasrnative.so).

Builds the library on first use if a toolchain is available; all callers have
pure-Python fallbacks, so the framework degrades gracefully without g++.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
LIB_PATH = NATIVE_DIR / "libasrnative.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(LIB_PATH))
        lib.edit_distance.restype = ctypes.c_int32
        lib.edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.edit_distance_batch.restype = None
        lib.edit_distance_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        lib.flac_decode.restype = ctypes.c_int
        lib.flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.flac_free.restype = None
        lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32, ctypes.c_int32]
        lib.bpe_encode.restype = ctypes.c_int32
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.bpe_destroy.restype = None
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def _tok_ids(seq: Sequence) -> np.ndarray:
    """Map arbitrary hashable tokens (words/chars) to int32 ids."""
    if len(seq) and isinstance(seq[0], (int, np.integer)):
        return np.asarray(seq, np.int32)
    table: dict = {}
    return np.asarray([table.setdefault(t, len(table)) for t in seq], np.int32)


def edit_distance(a: Sequence, b: Sequence) -> int:
    lib = get_lib()
    assert lib is not None
    joint = list(a) + list(b)
    ids = _tok_ids(joint)
    ia, ib = ids[:len(a)], ids[len(a):]
    pa = ia.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    pb = ib.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    return int(lib.edit_distance(pa, len(ia), pb, len(ib)))


class BpeEncoder:
    """Native BPE tokenizer handle (see native/bpe_encoder.cc)."""

    def __init__(self, vocab: Sequence[str], merges: Sequence[Sequence[str]],
                 unk_id: int):
        lib = get_lib()
        assert lib is not None
        self._lib = lib
        v_arr = (ctypes.c_char_p * len(vocab))(
            *[t.encode() for t in vocab])
        a_arr = (ctypes.c_char_p * len(merges))(
            *[m[0].encode() for m in merges])
        b_arr = (ctypes.c_char_p * len(merges))(
            *[m[1].encode() for m in merges])
        self._h = lib.bpe_create(v_arr, len(vocab), a_arr, b_arr,
                                 len(merges), unk_id)

    def encode(self, text: str) -> list:
        buf_len = max(64, 4 * len(text) + 8)
        buf = (ctypes.c_int32 * buf_len)()
        n = self._lib.bpe_encode(self._h, text.encode(), buf, buf_len)
        if n < 0:
            buf = (ctypes.c_int32 * (-n))()
            n = self._lib.bpe_encode(self._h, text.encode(), buf, -n)
        return list(buf[:n])

    def __del__(self):
        try:
            self._lib.bpe_destroy(self._h)
        except Exception:
            pass


def edit_distance_batch(hyps: Sequence[Sequence], refs: Sequence[Sequence]
                        ) -> np.ndarray:
    """Batched Levenshtein over token-id sequences; one ctypes crossing."""
    lib = get_lib()
    assert lib is not None and len(hyps) == len(refs)
    n = len(hyps)
    ids_a, ids_b, len_a, len_b = [], [], [], []
    for h, r in zip(hyps, refs):
        joint = _tok_ids(list(h) + list(r))
        ids_a.append(joint[:len(h)])
        ids_b.append(joint[len(h):])
        len_a.append(len(h))
        len_b.append(len(r))
    fa = np.concatenate(ids_a) if ids_a else np.zeros(0, np.int32)
    fb = np.concatenate(ids_b) if ids_b else np.zeros(0, np.int32)
    la = np.asarray(len_a, np.int32)
    lb = np.asarray(len_b, np.int32)
    out = np.zeros(n, np.int32)
    c = ctypes.POINTER(ctypes.c_int32)
    lib.edit_distance_batch(
        np.ascontiguousarray(fa).ctypes.data_as(c), la.ctypes.data_as(c),
        np.ascontiguousarray(fb).ctypes.data_as(c), lb.ctypes.data_as(c),
        n, out.ctypes.data_as(c))
    return out
