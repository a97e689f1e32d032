"""Fused GRU time-scan Pallas kernel (companion to lstm_kernel.py).

Same design: the whole time loop in one kernel, recurrent weights and the
hidden carry resident in VMEM, custom VJP walking time in reverse, UNROLL
time steps per grid iteration (amortizes the per-iteration pipeline overhead
that dominates these latency-bound recurrent steps — same blocking as the
LSTM kernel, where it measured 1.6x). Torch gate order (r, z, n) with
separate b_ih/b_hh semantics: the kernel consumes x_proj = x @ w_ih + b_ih
and h_proj-side bias via w_hh/b_hh held in VMEM.

Residuals stored for backward: gates (r, z, n) and the n-gate's hidden
projection hp_n (needed for dr). dW_hh/db_hh are reduced in XLA from the
kernel's per-step d(h_proj) output — one big MXU matmul instead of in-kernel
accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lstm_kernel import UNROLL, _pick_b_tile


def _fwd_kernel(xp_ref, whh_ref, bhh_ref, mask_ref, ys_ref, gates_ref,
                hpn_ref, h_scr, *, B: int, H: int, U: int):
    tt = pl.program_id(1)          # time block (sequential, inner)

    @pl.when(tt == 0)
    def _():
        h_scr[...] = jnp.zeros((B, H), jnp.float32)

    h = h_scr[...]
    whh = whh_ref[...]
    bhh = bhh_ref[...]
    for u in range(U):
        # precision pinned DEFAULT (see lstm_kernel): immune to global
        # jax_default_matmul_precision overrides that OOM Mosaic's stack
        hp = jnp.dot(h, whh,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.DEFAULT) + bhh
        # xp may stream in as bf16 (amp: halves the dominant (T,B,3H) HBM
        # read, matching lstm_kernel); gate math always accumulates f32
        xp = xp_ref[u].astype(jnp.float32)
        r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
        z = jax.nn.sigmoid(xp[:, H:2 * H] + hp[:, H:2 * H])
        hp_n = hp[:, 2 * H:]
        n = jnp.tanh(xp[:, 2 * H:] + r * hp_n)
        h_new = (1.0 - z) * n + z * h

        m = mask_ref[u]                              # (B, 1) float 0/1
        h = m * h_new + (1.0 - m) * h
        ys_ref[u] = (m * h_new).astype(ys_ref.dtype)
        gates_ref[u] = jnp.concatenate([r, z, n],
                                       axis=-1).astype(gates_ref.dtype)
        hpn_ref[u] = hp_n.astype(hpn_ref.dtype)
    h_scr[...] = h


def _bwd_kernel(gates_ref, hpn_ref, hs_prev_ref, mask_ref, whh_t_ref,
                dys_ref, dxp_ref, dhp_ref, dh_scr, *, B: int, H: int, U: int):
    idx = pl.program_id(1)                      # block 0 holds the LAST U ts

    @pl.when(idx == 0)
    def _():
        dh_scr[...] = jnp.zeros((B, H), jnp.float32)

    dh_carry = dh_scr[...]
    whh_t = whh_t_ref[...]
    for u in range(U - 1, -1, -1):              # walk time downwards
        # residuals may be stored bf16 under amp; compute in f32
        gates = gates_ref[u].astype(jnp.float32)
        r = gates[:, :H]
        z = gates[:, H:2 * H]
        n = gates[:, 2 * H:]
        hp_n = hpn_ref[u].astype(jnp.float32)
        # ys (and so hs_prev / dys) may be bf16 under amp; compute in f32
        h_prev = hs_prev_ref[u].astype(jnp.float32)
        m = mask_ref[u]

        dh = dh_carry + dys_ref[u].astype(jnp.float32)

        dz = dh * (h_prev - n)
        dn = dh * (1.0 - z)
        dh_direct = dh * z
        dan = dn * (1.0 - n * n)
        dr = dan * hp_n
        dhp_n = dan * r
        dar = dr * r * (1.0 - r)
        daz = dz * z * (1.0 - z)

        dxp = jnp.concatenate([dar, daz, dan], axis=-1)
        dhp = jnp.concatenate([dar, daz, dhp_n], axis=-1)
        dxp = m * dxp
        dhp = m * dhp
        dh_prev = (jnp.dot(dhp, whh_t,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
                   + m * dh_direct)
        dh_carry = dh_prev + (1.0 - m) * dh_carry
        dxp_ref[u] = dxp.astype(dxp_ref.dtype)  # matches primal x_proj dtype
        dhp_ref[u] = dhp
    dh_scr[...] = dh_carry


def _run_fwd(x_proj, mask, w_hh, b_hh, interpret=False):
    T, B, G = x_proj.shape
    H = G // 3
    U = UNROLL if T % UNROLL == 0 else 1
    TB = _pick_b_tile(B)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, B=TB, H=H, U=U),
        grid=(B // TB, T // U),
        in_specs=[
            pl.BlockSpec((U, TB, 3 * H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, 1), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, TB, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, 3 * H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # ys AND the saved residuals (gates, hp_n) in the input dtype:
            # under amp the bf16 residual store/reload halves the (T,B,4H)
            # fwd->bwd HBM round-trip (lstm_kernel symmetry); backward
            # casts to f32 on read, f32 runs keep exact f32 residuals
            jax.ShapeDtypeStruct((T, B, H), x_proj.dtype),
            jax.ShapeDtypeStruct((T, B, 3 * H), x_proj.dtype),
            jax.ShapeDtypeStruct((T, B, H), x_proj.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((TB, H), jnp.float32)],
        interpret=interpret,
    )(x_proj, w_hh, b_hh.reshape(1, -1), mask)


def _run_bwd(gates, hpn, ys, mask, w_hh, dys, interpret=False):
    T, B, G = gates.shape
    H = G // 3
    U = UNROLL if T % UNROLL == 0 else 1
    NB = T // U
    zeros_bh = jnp.zeros((1, B, H), ys.dtype)
    hs_prev = jnp.concatenate([zeros_bh, ys[:-1]], axis=0)
    TB = _pick_b_tile(B)
    rev = lambda b, t: (NB - 1 - t, b, 0)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, B=TB, H=H, U=U),
        grid=(B // TB, NB),
        in_specs=[
            pl.BlockSpec((U, TB, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, TB, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, 3 * H), rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # dxp must match the primal x_proj dtype (bf16 under amp);
            # dhp stays f32 (feeds the dW_hh/db_hh reductions)
            jax.ShapeDtypeStruct((T, B, 3 * H), ys.dtype),
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((TB, H), jnp.float32)],
        interpret=interpret,
    )(gates, hpn, hs_prev, mask, w_hh.T, dys)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gru_scan_fused(x_proj, w_hh, b_hh, mask, reverse: bool = False,
                   interpret: bool = False):
    """Fused GRU over time. x_proj (T,B,3H) = x @ w_ih + b_ih; w_hh (H,3H);
    b_hh (3H,); mask (T,B) bool (contiguous validity). Same contract as
    ops.rnn.gru_scan."""
    ys, _ = _g_fwd(x_proj, w_hh, b_hh, mask, reverse, interpret)
    return ys


def _g_fwd(x_proj, w_hh, b_hh, mask, reverse, interpret):
    if reverse:
        x_proj = x_proj[::-1]
        mask = mask[::-1]
    m = mask.astype(jnp.float32)[:, :, None]
    ys, gates, hpn = _run_fwd(x_proj, m, w_hh, b_hh, interpret=interpret)
    out = ys[::-1] if reverse else ys
    return out, (m, w_hh, ys, gates, hpn)


def _g_bwd(reverse, interpret, res, dout):
    m, w_hh, ys, gates, hpn = res
    dys = dout[::-1] if reverse else dout
    dxp, dhp = _run_bwd(gates, hpn, ys, m, w_hh, dys, interpret=interpret)
    zeros = jnp.zeros_like(ys[:1])
    hs_prev = jnp.concatenate([zeros, ys[:-1]], axis=0)
    T, B, H = ys.shape
    dwhh = jnp.einsum("tbi,tbj->ij", hs_prev, dhp,
                      preferred_element_type=jnp.float32)
    dbhh = jnp.sum(dhp, axis=(0, 1))
    if reverse:
        dxp = dxp[::-1]
    return dxp, dwhh, dbhh, None


gru_scan_fused.defvjp(_g_fwd, _g_bwd)
