"""Fused LSTM time-scan Pallas kernels (the cuDNN-LSTM analog).

SURVEY.md section 7 hard-part #5: ``lax.scan`` LSTMs are serial in T and pay
XLA per-step dispatch on every recurrent step. Here the WHOLE time loop is
one Pallas kernel: the recurrent weights sit in VMEM for the entire scan
(grid iterations on TPU run sequentially, so the hidden/cell carry lives in
VMEM scratch across steps), each step is one (B, H) x (H, 4H) MXU matmul plus
VPU gates, and the per-step input projections stream in as pipelined block
DMAs.

Training support is a full custom VJP: the forward stores post-activation
gates and cell states (the standard residuals); the backward kernel walks
time in reverse emitting gate gradients (dW_hh is then one large MXU matmul
in XLA) — no autodiff replay of the scan. UNROLL time steps are processed
per grid iteration to amortize the per-iteration pipeline overhead that
dominates these latency-bound recurrent steps (measured 1.6x).

Gate order follows torch/ops.rnn convention (i, f, g, o). The jnp scan in
ops/rnn.py remains the reference implementation and non-TPU fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# time steps per grid iteration: amortizes the per-iteration pipeline
# overhead that dominates these latency-bound tiny recurrent steps
UNROLL = 4

# batch rows per grid iteration: bounds VMEM (the U-step input/gate blocks
# scale with the batch tile, and the (H, 4H) recurrent weights are resident
# twice for pipelining) — large batches OOM'd the 16 MB scoped-VMEM limit
# without this. The carry scratch is reset at each batch-tile's first time
# block, so tiles are independent.
B_TILE = 32


def _pick_b_tile(B: int) -> int:
    for tb in (B_TILE, 16, 8):
        if B % tb == 0:
            return tb
    return B


# ------------------------------------------------------------------ forward
def _fwd_kernel(xp_ref, whh_ref, mask_ref, ys_ref, cs_ref, gates_ref,
                h_scr, c_scr, *, B: int, H: int, U: int):
    tt = pl.program_id(1)          # time block (sequential, inner)

    @pl.when(tt == 0)
    def _():
        h_scr[...] = jnp.zeros((B, H), jnp.float32)
        c_scr[...] = jnp.zeros((B, H), jnp.float32)

    h = h_scr[...]
    c = c_scr[...]
    whh = whh_ref[...]
    for u in range(U):
        # precision pinned DEFAULT: the recurrent matmul runs bf16-multiply
        # + f32-accumulate by design (cuDNN-tensor-core-style numerics). A
        # global jax_default_matmul_precision='highest' would otherwise leak
        # in here and blow Mosaic's scoped-VMEM stack (compile OOM at
        # small T) while 6x-ing the serial step cost.
        # xp may stream in as bf16 (amp: halves the dominant (T,B,4H) HBM
        # read); the gate math always accumulates f32.
        gates = xp_ref[u].astype(jnp.float32) + jnp.dot(
            h, whh, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)

        m = mask_ref[u]                              # (B, 1) float 0/1
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        ys_ref[u] = (m * h_new).astype(ys_ref.dtype)
        cs_ref[u] = c.astype(cs_ref.dtype)
        gates_ref[u] = jnp.concatenate([i, f, g, o],
                                       axis=-1).astype(gates_ref.dtype)
    h_scr[...] = h
    c_scr[...] = c


def _run_fwd(x_proj, mask, w_hh, interpret=False):
    T, B, G = x_proj.shape
    H = G // 4
    U = UNROLL if T % UNROLL == 0 else 1
    TB = _pick_b_tile(B)
    ys, cs, gates = pl.pallas_call(
        functools.partial(_fwd_kernel, B=TB, H=H, U=U),
        grid=(B // TB, T // U),
        in_specs=[
            pl.BlockSpec((U, TB, 4 * H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, 1), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, TB, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, 4 * H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # ys AND the saved residuals (cell states, gates) in the input
            # dtype: under amp the bf16 residual store/reload halves the
            # (T, B, 5H) HBM round-trip between forward and backward; the
            # gate math itself always accumulates f32 (gradients recompute
            # tanh/sigmoid-derivative terms from bf16-rounded activations,
            # the same numerics class as bf16 matmul inputs). f32 runs
            # keep exact f32 residuals.
            jax.ShapeDtypeStruct((T, B, H), x_proj.dtype),
            jax.ShapeDtypeStruct((T, B, H), x_proj.dtype),
            jax.ShapeDtypeStruct((T, B, 4 * H), x_proj.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, w_hh, mask)
    return ys, cs, gates


# ----------------------------------------------------------------- backward
def _bwd_kernel(gates_ref, cs_ref, cs_prev_ref, mask_ref,
                whh_t_ref, dys_ref, dxp_ref,
                dh_scr, dc_scr, *, B: int, H: int, NB: int, U: int):
    idx = pl.program_id(1)                      # block 0 holds the LAST U ts

    @pl.when(idx == 0)
    def _():
        dh_scr[...] = jnp.zeros((B, H), jnp.float32)
        dc_scr[...] = jnp.zeros((B, H), jnp.float32)

    dh_carry = dh_scr[...]
    dc_carry = dc_scr[...]
    whh_t = whh_t_ref[...]
    for u in range(U - 1, -1, -1):              # walk time downwards
        gates = gates_ref[u].astype(jnp.float32)
        i = gates[:, :H]
        f = gates[:, H:2 * H]
        g = gates[:, 2 * H:3 * H]
        o = gates[:, 3 * H:]
        c_t = cs_ref[u].astype(jnp.float32)
        c_prev = cs_prev_ref[u].astype(jnp.float32)
        m = mask_ref[u]                         # (B, 1)

        dh = dh_carry + dys_ref[u].astype(jnp.float32)
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
        # masked steps: no gate grads; carries pass through (dys at a masked
        # step corresponds to an identically-zero output and is dropped)
        dgates = m * dgates
        dh_prev = jnp.dot(dgates, whh_t,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
        dh_carry = dh_prev + (1.0 - m) * dh_carry
        dc_carry = m * dc_prev + (1.0 - m) * dc_carry
        dxp_ref[u] = dgates.astype(dxp_ref.dtype)
    dh_scr[...] = dh_carry
    dc_scr[...] = dc_carry

def _run_bwd(gates, cs, ys, mask, w_hh, dys, interpret=False):
    T, B, G = gates.shape
    H = G // 4
    U = UNROLL if T % UNROLL == 0 else 1
    NB = T // U
    TB = _pick_b_tile(B)
    # previous-step tensors (index t-1, zeros at t=0)
    cs_prev = jnp.concatenate(
        [jnp.zeros((1, B, H), cs.dtype), cs[:-1]], axis=0)
    hs_prev = jnp.concatenate(
        [jnp.zeros((1, B, H), ys.dtype), ys[:-1]], axis=0)

    rev = lambda b, t: (NB - 1 - t, b, 0)
    dxp = pl.pallas_call(
        functools.partial(_bwd_kernel, B=TB, H=H, NB=NB, U=U),
        grid=(B // TB, NB),
        in_specs=[
            pl.BlockSpec((U, TB, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * H, H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, TB, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((U, TB, 4 * H), rev,
                               memory_space=pltpu.VMEM),
        # dxp must match the primal x_proj dtype (bf16 under amp)
        out_shape=jax.ShapeDtypeStruct((T, B, 4 * H), dys.dtype),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        interpret=interpret,
    )(gates, cs, cs_prev, mask, w_hh.T, dys)
    # dW_hh as ONE large MXU matmul in XLA (GRU-kernel pattern): frees 8 MB
    # of kernel VMEM (accumulator + output block) that OOM'd at UNROLL=4
    dwhh = jnp.einsum("tbi,tbj->ij", hs_prev, dxp,
                      preferred_element_type=jnp.float32)
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
