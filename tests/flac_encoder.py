"""Minimal FLAC encoder (TEST ONLY) — verbatim, constant, and fixed-order
subframes with Rice residuals. Exists purely to exercise the native C++
decoder; not part of the framework."""
from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits:
            self.write(0, 1)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _write_rice_residual(bw: BitWriter, resid: np.ndarray, param: int):
    bw.write(0, 2)          # coding method 0 (4-bit rice)
    bw.write(0, 4)          # partition order 0
    bw.write(param, 4)
    for v in resid:
        u = _zigzag(int(v))
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _subframe_verbatim(bw: BitWriter, x: np.ndarray, bps: int):
    bw.write(0, 1)
    bw.write(1, 6)          # type verbatim
    bw.write(0, 1)          # no wasted bits
    for v in x:
        bw.write_signed(int(v), bps)


def _subframe_constant(bw: BitWriter, x: np.ndarray, bps: int):
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(0, 1)
    bw.write_signed(int(x[0]), bps)


def _subframe_fixed2(bw: BitWriter, x: np.ndarray, bps: int, param: int = 6):
    bw.write(0, 1)
    bw.write(8 + 2, 6)      # fixed, order 2
    bw.write(0, 1)
    bw.write_signed(int(x[0]), bps)
    bw.write_signed(int(x[1]), bps)
    resid = x[2:].astype(np.int64) - 2 * x[1:-1].astype(np.int64) + x[:-2].astype(np.int64)
    _write_rice_residual(bw, resid, param)


def encode_flac(samples: np.ndarray, sr: int = 16000, bps: int = 16,
                blocksize: int = 1024, mode: str = "verbatim") -> bytes:
    """samples: (n,) or (n, ch) int array."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(0, 4)          # total samples high 4 bits
    si.write(n & 0xFFFFFFFF, 32)
    for _ in range(16):
        si.write(0, 8)      # md5
    body = si.bytes()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last block

    frame_idx = 0
    for start in range(0, n, blocksize):
        blk = samples[start:start + blocksize]
        bs = blk.shape[0]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)      # reserved
        bw.write(0, 1)      # fixed blocksize strategy
        bw.write(7, 4)      # blocksize: 16-bit value follows
        bw.write(0, 4)      # sample rate from streaminfo
        bw.write(ch - 1, 4) # independent channels
        bw.write(0, 3)      # sample size from streaminfo
        bw.write(0, 1)      # reserved
        assert frame_idx < 128
        bw.write(frame_idx, 8)   # utf8 frame number (single byte)
        bw.write(bs - 1, 16)
        bw.write(0, 8)      # crc8 (decoder ignores)
        for c in range(ch):
            x = blk[:, c]
            if mode == "verbatim":
                _subframe_verbatim(bw, x, bps)
            elif mode == "constant":
                _subframe_constant(bw, x, bps)
            elif mode == "fixed2" and bs > 2:
                _subframe_fixed2(bw, x, bps)
            else:
                _subframe_verbatim(bw, x, bps)
        bw.align()
        bw.write(0, 16)     # crc16 (decoder ignores)
        out += bw.bytes()
        frame_idx += 1
    return bytes(out)
