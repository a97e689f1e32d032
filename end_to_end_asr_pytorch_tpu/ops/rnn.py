"""Functional recurrent cores: time-major LSTM/GRU scans.

TPU-first design (replaces the reference's cuDNN nn.LSTM, SURVEY.md 2.8):
  * Input projections for ALL timesteps are hoisted out of the recurrence into
    one large (T*B, D) x (D, 4H) matmul that tiles onto the MXU; the
    ``lax.scan`` body only does the (B, H) x (H, 4H) recurrent matmul plus
    elementwise gates (VPU), which is the minimal serial work.
  * Sequences are time-major inside the scan; masks make padded steps hold
    the carry, so a reversed scan over a padded batch computes exactly the
    backward direction of a length-aware BiLSTM (the carry stays at h0 through
    the leading pad region).
  * Gate order follows torch convention (i, f, g, o for LSTM; r, z, n for GRU)
    so torch.nn.LSTM/GRU on CPU serve as golden parity oracles in tests.

Weights are plain pytrees so these cores can be wrapped by flax modules or
used directly in jitted decode loops.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class LSTMWeights(NamedTuple):
    w_ih: jnp.ndarray  # (D, 4H)
    w_hh: jnp.ndarray  # (H, 4H)
    b: jnp.ndarray     # (4H,)  == b_ih + b_hh in torch terms


class GRUWeights(NamedTuple):
    w_ih: jnp.ndarray  # (D, 3H)
    w_hh: jnp.ndarray  # (H, 3H)
    b_ih: jnp.ndarray  # (3H,)
    b_hh: jnp.ndarray  # (3H,)  kept separate: GRU's n-gate needs r*(h@W+b_hh)


def init_lstm(key, in_dim: int, hidden: int, dtype=jnp.float32,
              forget_bias: float = 1.0) -> LSTMWeights:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) like torch, with forget-gate bias init
    (the reference's util.init_gate sets LSTM forget bias to 1, SURVEY.md 2.20)."""
    k1, k2 = jax.random.split(key)
    s = 1.0 / np.sqrt(hidden)
    w_ih = jax.random.uniform(k1, (in_dim, 4 * hidden), dtype, -s, s)
    w_hh = jax.random.uniform(k2, (hidden, 4 * hidden), dtype, -s, s)
    b = jnp.zeros((4 * hidden,), dtype).at[hidden:2 * hidden].set(forget_bias)
    return LSTMWeights(w_ih, w_hh, b)


def init_gru(key, in_dim: int, hidden: int, dtype=jnp.float32) -> GRUWeights:
    k1, k2 = jax.random.split(key)
    s = 1.0 / np.sqrt(hidden)
    w_ih = jax.random.uniform(k1, (in_dim, 3 * hidden), dtype, -s, s)
    w_hh = jax.random.uniform(k2, (hidden, 3 * hidden), dtype, -s, s)
    # distinct buffers: aliased leaves break donate_argnums in the train step
    return GRUWeights(w_ih, w_hh,
                      jnp.zeros((3 * hidden,), dtype),
                      jnp.zeros((3 * hidden,), dtype))


def lstm_cell(w: LSTMWeights, h: jnp.ndarray, c: jnp.ndarray,
              x_proj: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step given the precomputed input projection x_proj = x@w_ih+b."""
    H = h.shape[-1]
    gates = x_proj + jnp.dot(h, w.w_hh, preferred_element_type=jnp.float32)
    i, f, g, o = (gates[..., :H], gates[..., H:2 * H],
                  gates[..., 2 * H:3 * H], gates[..., 3 * H:])
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    # keep the recurrent carry dtype stable under bf16 compute (gate math
    # accumulates in f32 via preferred_element_type, then casts back)
    return h_new.astype(h.dtype), c_new.astype(c.dtype)


def gru_cell(w: GRUWeights, h: jnp.ndarray, x_proj: jnp.ndarray) -> jnp.ndarray:
    """One GRU step given x_proj = x@w_ih+b_ih (torch gate order r,z,n)."""
    H = h.shape[-1]
    h_proj = jnp.dot(h, w.w_hh, preferred_element_type=jnp.float32) + w.b_hh
    r = jax.nn.sigmoid(x_proj[..., :H] + h_proj[..., :H])
    z = jax.nn.sigmoid(x_proj[..., H:2 * H] + h_proj[..., H:2 * H])
    n = jnp.tanh(x_proj[..., 2 * H:] + r * h_proj[..., 2 * H:])
    return ((1.0 - z) * n + z * h).astype(h.dtype)


USE_FUSED_SCAN = "auto"  # "auto" | True | False (tests can override)


def _fused_ok(x: jnp.ndarray) -> bool:
    if USE_FUSED_SCAN == "auto":
        return (x.dtype in (jnp.float32, jnp.bfloat16)
                and jax.default_backend() not in ("cpu",))
    return bool(USE_FUSED_SCAN)


def lstm_scan(w: LSTMWeights, x: jnp.ndarray, mask: jnp.ndarray,
              reverse: bool = False, h0=None, c0=None) -> jnp.ndarray:
    """Run an LSTM over time.

    x: (T, B, D) time-major inputs; mask: (T, B) bool, True = valid frame
    (must be a contiguous run per sequence — standard length masking).
    Returns outputs (T, B, H). Padded steps emit zeros and hold the carry.

    On TPU with f32 inputs and default (zero) initial state, dispatches to
    the fused Pallas time-scan kernel (ops/pallas/lstm_kernel.py, custom
    VJP); the lax.scan below is the reference path and fallback.
    """
    T, B, _ = x.shape
    H = w.w_hh.shape[0]
    if h0 is None and c0 is None and _fused_ok(x):
        from .pallas.lstm_kernel import lstm_scan_fused
        # input projection on the MXU; streamed to the kernel in x's dtype
        # (bf16 under amp halves the dominant (T,B,4H) HBM traffic; the
        # kernel's recurrence always accumulates f32 internally)
        x_proj = (jnp.dot(x, w.w_ih, preferred_element_type=jnp.float32)
                  + w.b).astype(x.dtype)
        w_hh = w.w_hh.astype(jnp.float32)
        ys = lstm_scan_fused(x_proj, w_hh, mask, reverse, False)
        return ys.astype(x.dtype)
    x_proj = jnp.dot(x, w.w_ih, preferred_element_type=jnp.float32) + w.b
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((B, H), x.dtype)

    def step(carry, inp):
        h, c = carry
        xp, m = inp
        h_new, c_new = lstm_cell(w, h, c, xp)
        m = m[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), jnp.where(m, h_new, jnp.zeros((), h.dtype))

    _, ys = jax.lax.scan(step, (h0, c0), (x_proj, mask), reverse=reverse)
    return ys


def gru_scan(w: GRUWeights, x: jnp.ndarray, mask: jnp.ndarray,
             reverse: bool = False, h0=None) -> jnp.ndarray:
    """GRU analogue of lstm_scan. Returns (T, B, H). Dispatches to the fused
    Pallas kernel on TPU like lstm_scan."""
    T, B, _ = x.shape
    H = w.w_hh.shape[0]
    if h0 is None and _fused_ok(x):
        from .pallas.gru_kernel import gru_scan_fused
        # streamed in x's dtype (bf16 under amp), matching lstm_scan above
        x_proj = (jnp.dot(x, w.w_ih, preferred_element_type=jnp.float32)
                  + w.b_ih).astype(x.dtype)
        ys = gru_scan_fused(x_proj, w.w_hh.astype(jnp.float32),
                            w.b_hh.astype(jnp.float32), mask, reverse, False)
        return ys.astype(x.dtype)
    x_proj = jnp.dot(x, w.w_ih, preferred_element_type=jnp.float32) + w.b_ih
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)

    def step(h, inp):
        xp, m = inp
        h_new = gru_cell(w, h, xp)
        m = m[:, None]
        h = jnp.where(m, h_new, h)
        return h, jnp.where(m, h_new, jnp.zeros((), h.dtype))

    _, ys = jax.lax.scan(step, h0, (x_proj, mask), reverse=reverse)
    return ys


def bidirectional(scan_fn, w_fwd, w_bwd, x: jnp.ndarray, mask: jnp.ndarray,
                  **kw) -> jnp.ndarray:
    """Concat forward and (length-aware) backward passes: (T, B, 2H)."""
    fwd = scan_fn(w_fwd, x, mask, reverse=False, **kw)
    bwd = scan_fn(w_bwd, x, mask, reverse=True, **kw)
    return jnp.concatenate([fwd, bwd], axis=-1)
