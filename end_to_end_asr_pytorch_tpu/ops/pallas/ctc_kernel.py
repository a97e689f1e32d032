"""Pallas CTC forward-backward kernel (loss + analytic gradient).

BASELINE.json names this: CTC as a Pallas kernel rather than autodiff through
a lax.scan. The jnp path (ops/ctc.py) differentiates the forward scan, which
replays the whole recursion on the backward pass and keeps scan residuals;
here ONE kernel computes the alpha lattice (kept entirely in VMEM), then the
beta pass fused with the posterior, emitting the analytic gradient
d(-logZ)/d(emit) = -exp(alpha + beta - logZ) directly — no residuals, no
replay, wrapped in jax.custom_vjp.

Shape strategy: the kernel is vocab-independent. XLA precomputes the
emission lattice emit (B, T, S) = log_probs[t, ext_label[s]] (S = 2U+1 padded
to the 128-lane width) and scatters the (B, T, S) gradient back to (B, T, V)
with a one-hot matmul (MXU). Grid = batch; lattice rows live in lanes, time
in sublanes; the skip-transition mask and both lane-shifts are vectorized
with pltpu.roll.

Time padding follows ops/ctc.py: frames >= logit_len hold alpha (carry) and
pass beta through unchanged, contributing zero gradient.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ctc import extend_labels

NEG_INF = -1e30
LANE = 128


def _row_shift(row, n):
    """Shift (1, S) lanes right by n, filling with NEG_INF."""
    S = row.shape[-1]
    rolled = pltpu.roll(row, n, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane < n, NEG_INF, rolled)


def _row_unshift(row, n):
    """Shift (1, S) lanes left by n, filling with NEG_INF (pltpu.roll only
    accepts non-negative shifts, so left-by-n = circular right-by-(S-n))."""
    S = row.shape[-1]
    rolled = pltpu.roll(row, S - n, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane >= S - n, NEG_INF, rolled)


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)
    s = (jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe))
    return jnp.where(m <= NEG_INF / 2, NEG_INF,
                     m_safe + jnp.log(jnp.maximum(s, 1e-37)))


def _kernel(emit_ref, skip_ref, len_ref, eidx_ref, loss_ref, grad_ref,
            alpha_ref, *, T: int, S: int, BT: int):
    """One grid cell processes a (BT, S) sublane-tile of batch rows so the
    whole 8x128 VPU tile is busy each time step. emit/grad blocks are
    (BT, T, S); alpha history (T, BT, S) lives in VMEM."""
    g = pl.program_id(0)
    skip = skip_ref[...]                       # (BT, S)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BT, S), 1)

    # per-row scalars -> (BT, 1) columns (static unroll over the tile)
    lens = jnp.concatenate(
        [jnp.full((1, 1), len_ref[g * BT + i, 0]) for i in range(BT)])
    e_last = jnp.concatenate(
        [jnp.full((1, 1), eidx_ref[g * BT + i, 0]) for i in range(BT)])
    e_prev = jnp.concatenate(
        [jnp.full((1, 1), eidx_ref[g * BT + i, 1]) for i in range(BT)])

    # ---------------- forward: alpha (BT, S) per step into VMEM history
    emit0 = emit_ref[:, 0, :]                  # (BT, S)
    init = jnp.where(lane < 2, emit0, NEG_INF)
    alpha_ref[0] = init

    def fwd(t, prev):
        emit_t = emit_ref[:, t, :]
        a1 = _row_shift(prev, 1)
        a2 = jnp.where(skip > 0, _row_shift(prev, 2), NEG_INF)
        new = _lse3(prev, a1, a2) + emit_t
        new = jnp.where(t < lens, new, prev)
        alpha_ref[t] = new
        return new

    jax.lax.fori_loop(1, T, fwd, init)

    # ---------------- loss (per row)
    last = alpha_ref[T - 1]                    # (BT, S)
    sel = jnp.logical_or(lane == e_last,
                         jnp.logical_and(lane == e_prev, e_prev >= 0))
    ending = jnp.where(sel, last, NEG_INF)
    m = jnp.max(ending, axis=1, keepdims=True)
    m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)
    z = jnp.sum(jnp.where(sel, jnp.exp(ending - m_safe), 0.0), axis=1,
                keepdims=True)
    logz = jnp.where(m <= NEG_INF / 2, NEG_INF,
                     m_safe + jnp.log(jnp.maximum(z, 1e-37)))  # (BT, 1)
    for i in range(BT):
        loss_ref[g * BT + i, 0] = -logz[i, 0]

    # ---------------- backward: beta + gradient, walking t downward
    # infeasible rows (no alignment reaches an end state, logz == NEG_INF)
    # must emit ZERO gradient: alpha+beta-logz otherwise cancels the two
    # -1e30 absorptions to 0 wherever exactly one of alpha/beta is finite,
    # scattering dense -exp(0) = -1 garbage across the lattice.
    feas = logz > NEG_INF / 2                  # (BT, 1)
    beta_last = jnp.where(sel, 0.0, NEG_INF)
    grad_ref[:, T - 1, :] = jnp.where(
        jnp.logical_and((T - 1) < lens, feas),
        -jnp.exp(last + beta_last - logz), 0.0)

    # transition s -> s+2 requires skip_ok at the destination lane s+2
    skip_src = _row_unshift(jnp.where(skip > 0, 0.0, NEG_INF), 2)

    def bwd(i, beta_next):
        t = T - 2 - i
        contrib = beta_next + emit_ref[:, t + 1, :]
        b1 = _row_unshift(contrib, 1)
        b2 = _row_unshift(contrib, 2) + jnp.where(skip_src <= NEG_INF / 2,
                                                  NEG_INF, 0.0)
        beta = _lse3(contrib, b1, b2)
        beta = jnp.where(t + 1 < lens, beta, beta_next)
        alpha_t = alpha_ref[t]
        grad_ref[:, t, :] = jnp.where(
            jnp.logical_and(t < lens, feas),
            -jnp.exp(alpha_t + beta - logz), 0.0)
        return beta

    jax.lax.fori_loop(0, T - 1, bwd, beta_last)


def _pick_tile(B: int, T: int, S: int) -> int:
    """Largest batch tile (<=8, divides padded B) keeping the three VMEM
    residents (emit, alpha, grad) under ~12 MB."""
    bt = 8
    while bt > 1 and 3 * bt * T * S * 4 > 12 * 1024 * 1024:
        bt //= 2
    return bt


def _run_kernel(emit, skip, logit_lengths, end_idx, interpret=False):
    B, T, S = emit.shape
    BT = _pick_tile(B, T, S)
    B_pad = ((B + BT - 1) // BT) * BT
    if B_pad != B:
        pad = B_pad - B
        emit = jnp.pad(emit, ((0, pad), (0, 0), (0, 0)),
                       constant_values=NEG_INF)
        skip = jnp.pad(skip, ((0, pad), (0, 0)))
        logit_lengths = jnp.pad(logit_lengths, ((0, pad), (0, 0)))
        end_idx = jnp.pad(end_idx, ((0, pad), (0, 0)))

    loss, grad = pl.pallas_call(
        functools.partial(_kernel, T=T, S=S, BT=BT),
        grid=(B_pad // BT,),
        in_specs=[
            pl.BlockSpec((BT, T, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, S), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_pad, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B_pad, 2), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((B_pad, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BT, T, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, T, S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((T, BT, S), jnp.float32)],
        interpret=interpret,
    )(emit, skip, logit_lengths, end_idx)
    return loss[:B, 0], grad[:B]


def _prepare(log_probs, logit_lengths, labels, label_lengths, blank):
    B, T, V = log_probs.shape
    U = labels.shape[1]
    S = 2 * U + 1
    S_pad = ((S + LANE - 1) // LANE) * LANE
    ext = extend_labels(labels, blank)                       # (B, S)
    ext = jnp.pad(ext, ((0, 0), (0, S_pad - S)))
    ext_len = 2 * label_lengths + 1

    lane = jnp.arange(S_pad)[None, :]
    skip = jnp.zeros((B, S_pad))
    skip = skip.at[:, 2:].set(jnp.where(
        (ext[:, 2:] != blank) & (ext[:, 2:] != ext[:, :-2]), 1.0, 0.0))
    # lattice states beyond ext_len are unreachable: kill their emissions
    emit = jnp.take_along_axis(log_probs, ext[:, None, :].astype(jnp.int32),
                               axis=2)                       # (B, T, S_pad)
    emit = jnp.where((lane < ext_len[:, None])[:, None, :], emit, NEG_INF)
    end_idx = jnp.stack([ext_len - 1, ext_len - 2], axis=1).astype(jnp.int32)
    return emit, skip.astype(jnp.float32), end_idx, ext, S_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(log_probs, logit_lengths, labels, label_lengths,
                    blank: int = 0, interpret: bool = False):
    """Drop-in for ops.ctc.ctc_loss: per-utterance NLL (B,), fused Pallas
    forward-backward with analytic gradient."""
    nll, _ = _ctc_fwd(log_probs, logit_lengths, labels, label_lengths,
                      blank, interpret)
    return nll


def _ctc_fwd(log_probs, logit_lengths, labels, label_lengths, blank,
             interpret):
    emit, skip, end_idx, ext, S_pad = _prepare(
        log_probs, logit_lengths, labels, label_lengths, blank)
    nll, grad_emit = _run_kernel(emit, skip,
                                 logit_lengths.astype(jnp.int32)[:, None],
                                 end_idx, interpret=interpret)
    return nll, (grad_emit, ext, log_probs.shape)


def _ctc_bwd(blank, interpret, res, g):
    grad_emit, ext, lp_shape = res
    B, T, V = lp_shape
    # scatter (B, T, S) -> (B, T, V): one-hot matmul on the MXU
    onehot = jax.nn.one_hot(ext, V, dtype=grad_emit.dtype)   # (B, S, V)
    grad_lp = jnp.einsum("bts,bsv->btv", grad_emit, onehot,
                         preferred_element_type=jnp.float32)
    grad_lp = grad_lp * g[:, None, None]
    return grad_lp, None, None, None


ctc_loss_pallas.defvjp(_ctc_fwd, _ctc_bwd)
