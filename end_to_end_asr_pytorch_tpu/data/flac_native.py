"""FLAC decoding via the native C++ decoder (native/flac_decoder.cc)."""
from __future__ import annotations

import ctypes

import numpy as np

from ..utils import native


def read_flac(path: str) -> tuple[np.ndarray, int]:
    """Returns (mono float32 waveform, sample_rate)."""
    lib = native.get_lib()
    if lib is None:
        raise RuntimeError(
            "native FLAC decoder unavailable (build native/libasrnative.so)")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    rc = lib.flac_decode(path.encode(), ctypes.byref(out), ctypes.byref(n),
                         ctypes.byref(sr), ctypes.byref(ch))
    if rc != 0:
        raise ValueError(f"flac_decode failed (rc={rc}) for {path}")
    try:
        total = n.value * ch.value
        buf = np.ctypeslib.as_array(out, shape=(total,)).copy()
    finally:
        lib.flac_free(out)
    wave = buf.reshape(-1, ch.value).mean(axis=1) if ch.value > 1 else buf
    return wave.astype(np.float32), int(sr.value)
