"""Fused LSTM time-scan Pallas kernels (the cuDNN-LSTM analog).

SURVEY.md section 7 hard-part #5: ``lax.scan`` LSTMs are serial in T and pay
XLA per-step dispatch on every recurrent step. Here the WHOLE time loop is
one Pallas kernel: the recurrent weights sit in VMEM for the entire scan
(grid iterations on TPU run sequentially, so the hidden/cell carry lives in
VMEM scratch across steps), each step is one (B, H) x (H, 4H) MXU matmul plus
VPU gates, and the per-step input projections stream in as pipelined block
DMAs.

Training support is a full custom VJP: the forward stores post-activation
gates and cell states (the standard residuals), and the backward kernel walks
time in reverse accumulating dW_hh in VMEM — no autodiff replay of the scan.

Gate order follows torch/ops.rnn convention (i, f, g, o). The jnp scan in
ops/rnn.py remains the reference implementation and non-TPU fallback.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ------------------------------------------------------------------ forward
def _fwd_kernel(xp_ref, whh_ref, mask_ref, ys_ref, cs_ref, gates_ref,
                h_scr, c_scr, *, B: int, H: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros((B, H), jnp.float32)
        c_scr[...] = jnp.zeros((B, H), jnp.float32)

    h = h_scr[...]
    c = c_scr[...]
    gates = xp_ref[0] + jnp.dot(h, whh_ref[...],
                                preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    m = mask_ref[0]                                  # (B, 1) float 0/1
    h_out = m * h_new + (1.0 - m) * h
    c_out = m * c_new + (1.0 - m) * c
    h_scr[...] = h_out
    c_scr[...] = c_out
    ys_ref[0] = m * h_new
    cs_ref[0] = c_out
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)


def _run_fwd(x_proj, mask, w_hh, interpret=False):
    T, B, G = x_proj.shape
    H = G // 4
    ys, cs, gates = pl.pallas_call(
        functools.partial(_fwd_kernel, B=B, H=H),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, w_hh, mask)
    return ys, cs, gates


# ----------------------------------------------------------------- backward
def _bwd_kernel(gates_ref, cs_ref, cs_prev_ref, hs_prev_ref, mask_ref,
                whh_t_ref, dys_ref, dxp_ref, dwhh_ref,
                dh_scr, dc_scr, dw_scr, *, B: int, H: int, T: int):
    idx = pl.program_id(0)                           # 0 .. T-1, t = T-1-idx

    @pl.when(idx == 0)
    def _():
        dh_scr[...] = jnp.zeros((B, H), jnp.float32)
        dc_scr[...] = jnp.zeros((B, H), jnp.float32)
        dw_scr[...] = jnp.zeros((H, 4 * H), jnp.float32)

    gates = gates_ref[0]
    i = gates[:, :H]
    f = gates[:, H:2 * H]
    g = gates[:, 2 * H:3 * H]
    o = gates[:, 3 * H:]
    c_t = cs_ref[0]
    c_prev = cs_prev_ref[0]
    h_prev = hs_prev_ref[0]
    m = mask_ref[0]                                  # (B, 1)

    dh_carry = dh_scr[...]
    dc_carry = dc_scr[...]
    dh = dh_carry + dys_ref[0]                       # carry + direct output

    tc = jnp.tanh(c_t)
    do = dh * tc
    dc = dc_carry + dh * o * (1.0 - tc * tc)
    di = dc * g
    dg = dc * i
    df = dc * c_prev
    dc_prev = dc * f

    dgates = jnp.concatenate([
        di * i * (1.0 - i), df * f * (1.0 - f),
        dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1)
    # masked steps: no gate gradients; carries pass straight through (dys at
    # a masked step corresponds to an identically-zero output and is dropped)
    dgates = m * dgates
    dh_prev = jnp.dot(dgates, whh_t_ref[...],
                      preferred_element_type=jnp.float32)
    dh_scr[...] = dh_prev + (1.0 - m) * dh_carry
    dc_scr[...] = m * dc_prev + (1.0 - m) * dc_carry
    dxp_ref[0] = dgates
    dw_scr[...] += jnp.dot(h_prev.T, dgates,
                           preferred_element_type=jnp.float32)

    @pl.when(idx == T - 1)
    def _():
        dwhh_ref[...] = dw_scr[...]


def _run_bwd(gates, cs, ys, mask, w_hh, dys, interpret=False):
    T, B, G = gates.shape
    H = G // 4
    # previous-step tensors (index t-1, zeros at t=0)
    zeros_bh = jnp.zeros((1, B, H), jnp.float32)
    cs_prev = jnp.concatenate([zeros_bh, cs[:-1]], axis=0)
    hs_prev = jnp.concatenate([zeros_bh, ys[:-1]], axis=0)

    rev = lambda t: (T - 1 - t, 0, 0)
    dxp, dwhh = pl.pallas_call(
        functools.partial(_bwd_kernel, B=B, H=H, T=T),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * H, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
        ],
        interpret=interpret,
    )(gates, cs, cs_prev, hs_prev, mask, w_hh.T, dys)
    return dxp, dwhh


# -------------------------------------------------------------- public API
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_scan_fused(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                    mask: jnp.ndarray, reverse: bool = False,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused LSTM over time. x_proj (T, B, 4H) = x @ w_ih + b precomputed;
    w_hh (H, 4H); mask (T, B) bool. Returns outputs (T, B, H) with padded
    steps emitting zeros and holding the carry — same contract as
    ops.rnn.lstm_scan."""
    ys, _ = _fused_fwd(x_proj, w_hh, mask, reverse, interpret)
    return ys


def _prep(x_proj, mask, reverse):
    if reverse:
        x_proj = x_proj[::-1]
        mask = mask[::-1]
    m = mask.astype(jnp.float32)[:, :, None]
    return x_proj, m


def _fused_fwd(x_proj, w_hh, mask, reverse, interpret):
    xp, m = _prep(x_proj, mask, reverse)
    ys, cs, gates = _run_fwd(xp, m, w_hh, interpret=interpret)
    out = ys[::-1] if reverse else ys
    return out, (xp, m, w_hh, ys, cs, gates)


def _fused_bwd(reverse, interpret, res, dout):
    xp, m, w_hh, ys, cs, gates = res
    dys = dout[::-1] if reverse else dout
    dxp, dwhh = _run_bwd(gates, cs, ys, m, w_hh, dys, interpret=interpret)
    if reverse:
        dxp = dxp[::-1]
    return dxp, dwhh, None


lstm_scan_fused.defvjp(_fused_fwd, _fused_bwd)
