"""Fused location-attention TRAIN step with a hand-written VJP (Pallas).

MEASURED NEGATIVE RESULT — default OFF (attention.use_pallas_train).
On-chip A/B at the flagship B=128/U=96 bf16 train shape
(util/bench_train_att.py, 20-iter trials, round 3):

    XLA step (jax.checkpoint label scan)          70.5 ms/step  (baseline)
    kernel, 1 row/grid cell                       97.2 ms/step
    kernel, 8 rows/cell (this file)               90.3 ms/step
    kernel, 8 rows/cell + label_scan_remat=False  88.9 ms/step

Why it loses: the 206 us/step delta (remat config) matches the kernel's
own HBM traffic — each launch must stream keys/f/vals blocks in and
align/ctx/dtarg/dvals out (~48 MB fwd, ~80 MB bwd at these shapes), and
under remat the fwd kernel runs twice. XLA pays the same tensor floor but
pipelines it through its fused emitters while ALSO overlapping the
neighboring scan ops; the kernel additionally eats M=1 MXU dots (per-row
energy/outer products) that XLA phrases as batched reductions. Same
economics as the beam mega-step kernel negative result
(beam_step_kernel.py): at LAS shapes the attention chain is
bandwidth/latency-bound and XLA's fusions are already near the floor —
hand fusion only removes op-dispatch overhead it doesn't have.

The kernel is kept (parity-tested, compiled-tested) as the engineering
record and for shapes where the balance could flip (much larger d, where
residual streaming dominates); the design intent was:

The training label scan's per-step cost is dominated by the attention
energy chain: XLA materializes the (B, T, d) tanh argument and tanh output
in HBM in the forward pass, AGAIN in the rematerialized forward
(jax.checkpoint save-nothing, NOTES.md round-2 train log), and reloads
them in the backward — plus a ~15-op dispatch tail per direction. This
kernel keeps the whole chain (query+key+location-feature sum, tanh, energy
reduction, masked softmax, context matmul) in VMEM, and its custom VJP
recomputes tanh IN-KERNEL from the step inputs, so the only per-step HBM
tensors are the step inputs themselves and the (B,T,d)-sized gradient
outputs the scan must accumulate anyway.

Scope: single-head location attention with v_proj (the reference's default
configuration); the jnp path in models/attention.py remains for every
other shape. The location CONV stays outside (its XLA VJP accumulates only
the (ks,1,F) kernel gradient — the measured-good train configuration);
this kernel takes the already-projected f = conv_features @ w_f.

Mosaic notes (learned the hard way, on-chip): batched ``dot_general``
(#tpu.dot_dimension_numbers with batch dims) does NOT compile, and 3-D
broadcasts that relayout a lane axis into sublanes
(``align[:, :, None] * vals``) hit "infer-vector-layout: unsupported
shape cast". So the kernel phrases every product as a plain 2-D
``dot_general`` per batch row: ``A @ B^T`` contractions for energy / dal /
dv, and K=1 outer products for dth / dvals. A first cut ran ONE row per
grid cell (the proven decode-time ``att_kernel.py`` structure) and
measured 97 ms/step vs XLA's 70 at B=128/U=96 — 128 sequential cells x 3
launches/step of per-cell overhead swamp the small per-row work. This
version keeps the known-good per-row 2-D ops but processes ``BB = 8``
rows per cell as an unrolled loop, cutting cell count (and DMA
setup/drain) 8x while keeping block sizes VMEM-friendly (~1 MB each).

In-kernel dots use DEFAULT precision (bf16 multiply, f32 accumulate) —
the designed numerics for every kernel in this package (NOTES.md round-2
compiled-kernel log); under --amp the inputs are bf16 anyway.

Backward math (per batch row; th_t = tanh(q + k_t + f_t)):
    energy_t = (th_t . v) / tau          align = softmax(energy) masked
    ctx = sum_t align_t * vals_t
    dal = dalign + dctx . vals_t                       (per t)
    dener = align * (dal - sum_t(dal * align)) / tau
    dtarg_t = dener_t * v * (1 - th_t^2)       == dkeys_t == df_t
    dq = sum_t dtarg_t         dv = sum_t dener_t * th_t   (grid-summed)
    dvals_t = align_t * dctx   (outer product)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bb(B: int) -> int:
    return 8 if B % 8 == 0 else 1


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(len_ref, q_ref, keys_ref, f_ref, v_ref, vals_ref,
                ctx_ref, align_ref, *, BB: int, T: int, d: int, vdim: int,
                temperature: float):
    i = pl.program_id(0)
    v = v_ref[0]                                         # (1, d)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    for j in range(BB):
        keys = keys_ref[j]                               # (T, d)
        targ = q_ref[j] + keys + f_ref[j]                # (1,d)+(T,d)+(T,d)
        th = jnp.tanh(targ)                              # (T, d)
        # energy (1, T) = v @ th^T — row layout so the softmax reduces lanes
        energy = _dot(v.astype(th.dtype), th,
                      (((1,), (1,)))) * (1.0 / temperature)
        energy = jnp.where(t_ids < len_ref[i * BB + j, 0], energy, -1e30)
        m = jnp.max(energy, axis=1, keepdims=True)
        e = jnp.exp(energy - m)
        align = e / jnp.sum(e, axis=1, keepdims=True)    # (1, T) f32
        align_ref[j] = align
        vals = vals_ref[j]                               # (T, vdim)
        ctx_ref[j] = _dot(align.astype(vals.dtype), vals,
                          (((1,), (0,))))                # (1, vdim)


def _bwd_kernel(len_ref, q_ref, keys_ref, f_ref, v_ref, vals_ref,
                align_ref, dctx_ref, dalign_ref,
                dq_ref, dtarg_ref, dvals_ref, dv_ref, *, BB: int, T: int,
                d: int, vdim: int, temperature: float):
    i = pl.program_id(0)
    v32 = v_ref[0].astype(jnp.float32)                   # (1, d)
    dv_acc = None
    for j in range(BB):
        keys = keys_ref[j]
        targ = q_ref[j] + keys + f_ref[j]
        th = jnp.tanh(targ)                              # (T, d)
        align = align_ref[j]                             # (1, T) f32
        dctx = dctx_ref[j]                               # (1, vdim) f32
        dalign = dalign_ref[j]                           # (1, T) f32
        vals = vals_ref[j]                               # (T, vdim)

        # dal (1,T) = dalign + dctx @ vals^T
        dal = dalign + _dot(dctx.astype(vals.dtype), vals, (((1,), (1,))))
        s = jnp.sum(dal * align, axis=1, keepdims=True)  # (1, 1)
        dener = align * (dal - s) * (1.0 / temperature)  # (1, T) f32

        thf = th.astype(jnp.float32)
        # dth (T,d) = dener^T @ v — K=1 outer product on the MXU
        dth = _dot(dener, v32, (((0,), (0,))))
        dtarg = dth * (1.0 - thf * thf)                  # (T, d) f32
        dtarg_ref[j] = dtarg.astype(dtarg_ref.dtype)
        dq_ref[j] = jnp.sum(dtarg, axis=0,
                            keepdims=True).astype(dq_ref.dtype)

        # dvals (T,vdim) = align^T @ dctx — K=1 outer product
        dvals = _dot(align, dctx, (((0,), (0,))))
        dvals_ref[j] = dvals.astype(dvals_ref.dtype)

        # dv (1,d) = dener @ th, accumulated across rows and grid cells
        dv = _dot(dener.astype(th.dtype), th, (((1,), (0,))))
        dv_acc = dv if dv_acc is None else dv_acc + dv

    @pl.when(i == 0)
    def _init():
        dv_ref[0] = dv_acc

    @pl.when(i > 0)
    def _acc():
        dv_ref[0] += dv_acc


def _fwd_call(q, keys, f, v, vals, enc_len, temperature, interpret):
    B, T, d = keys.shape
    vdim = vals.shape[-1]
    BB = _bb(B)
    ctx, align = pl.pallas_call(
        functools.partial(_fwd_kernel, BB=BB, T=T, d=d, vdim=vdim,
                          temperature=temperature),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BB, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, vdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BB, 1, vdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, vdim), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, T), jnp.float32),
        ],
        interpret=interpret,
    )(enc_len.astype(jnp.int32)[:, None], q[:, None, :], keys, f,
      v.reshape(1, 1, -1), vals)
    return ctx[:, 0, :], align[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def loc_att_train(q, keys, f, v, vals, enc_len, temperature: float,
                  interpret: bool = False):
    """Fused train attention step. q (B,d) [w_q applied + bias], keys
    (B,T,d), f (B,T,d) [location features @ w_f], v (d,) energy vector,
    vals (B,T,vdim); enc_len int32 (B,) [zero cotangent — int arrays
    cannot ride nondiff_argnums under jit]; temperature/interpret are
    static. Returns (ctx (B,vdim) f32, align (B,T) f32)."""
    return _fwd_call(q, keys, f, v, vals, enc_len, temperature, interpret)


def _vjp_fwd(q, keys, f, v, vals, enc_len, temperature, interpret):
    ctx, align = _fwd_call(q, keys, f, v, vals, enc_len, temperature,
                           interpret)
    return (ctx, align), (q, keys, f, v, vals, enc_len, align)


def _vjp_bwd(temperature, interpret, res, cts):
    q, keys, f, v, vals, enc_len, align = res
    dctx, dalign = cts
    B, T, d = keys.shape
    vdim = vals.shape[-1]
    BB = _bb(B)
    dq, dtarg, dvals, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, BB=BB, T=T, d=d, vdim=vdim,
                          temperature=temperature),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BB, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, vdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, vdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BB, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, vdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, d), q.dtype),
            jax.ShapeDtypeStruct((B, T, d), keys.dtype),
            jax.ShapeDtypeStruct((B, T, vdim), vals.dtype),
            jax.ShapeDtypeStruct((1, 1, d), jnp.float32),
        ],
        interpret=interpret,
    )(enc_len.astype(jnp.int32)[:, None], q[:, None, :], keys, f,
      v.reshape(1, 1, -1), vals, align[:, None, :],
      dctx.astype(jnp.float32)[:, None, :],
      dalign.astype(jnp.float32)[:, None, :])
    d_len = np.zeros(enc_len.shape, jax.dtypes.float0)
    return (dq[:, 0, :], dtarg, dtarg.astype(f.dtype),
            dv.reshape(v.shape).astype(v.dtype), dvals, d_len)


loc_att_train.defvjp(_vjp_fwd, _vjp_bwd)
