"""Fused location-attention TRAIN step with a hand-written VJP (Pallas).

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB = 8  # batch rows per grid cell (sublane-friendly tanh shapes)


def _fwd_kernel(len_ref, q_ref, keys_ref, f_ref, v_ref, vals_ref,
                ctx_ref, align_ref, *, T: int, d: int, vdim: int,
                temperature: float):
    i = pl.program_id(0)
    targ = q_ref[...][:, None, :] + keys_ref[...] + f_ref[...]  # (BB, T, d)
    th = jnp.tanh(targ)
    v = v_ref[...].astype(th.dtype)                      # (1, d)
    energy = jax.lax.dot_general(
        th.reshape(BB * T, d), v.reshape(d, 1), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(BB, T)
    energy = energy * (1.0 / temperature)

    t_ids = jax.lax.broadcasted_iota(jnp.int32, (BB, T), 1)
    enc_len = jnp.stack(
        [len_ref[i * BB + j, 0] for j in range(BB)])[:, None]   # (BB, 1)
    energy = jnp.where(t_ids < enc_len, energy, -1e30)
    m = jnp.max(energy, axis=1, keepdims=True)
    e = jnp.exp(energy - m)
    align = e / jnp.sum(e, axis=1, keepdims=True)        # (BB, T) f32
    align_ref[...] = align

    # ctx[b, :] = align[b, :] @ vals[b, :, :] — batched over BB
    ctx_ref[...] = jax.lax.dot_general(
        align.astype(vals_ref.dtype), vals_ref[...],
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (BB, vdim)


def _bwd_kernel(len_ref, q_ref, keys_ref, f_ref, v_ref, vals_ref,
                align_ref, dctx_ref, dalign_ref,
                dq_ref, dtarg_ref, dvals_ref, dv_ref, *, T: int, d: int,
                vdim: int, temperature: float):
    i = pl.program_id(0)
    targ = q_ref[...][:, None, :] + keys_ref[...] + f_ref[...]
    th = jnp.tanh(targ)                                  # (BB, T, d)
    align = align_ref[...]                               # (BB, T) f32
    dctx = dctx_ref[...]                                 # (BB, vdim) f32
    dalign = dalign_ref[...]                             # (BB, T) f32

    # dal[b,t] = dalign[b,t] + dctx[b,:] . vals[b,t,:]
    dal = dalign + jax.lax.dot_general(
        dctx.astype(vals_ref.dtype), vals_ref[...],
        (((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (BB, T)
    s = jnp.sum(dal * align, axis=1, keepdims=True)
    dener = align * (dal - s) * (1.0 / temperature)      # (BB, T) f32

    thf = th.astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)                   # (1, d)
    dth = dener[:, :, None] * v[None, :, :]              # (BB, T, d) f32
    dtarg = dth * (1.0 - thf * thf)
    dtarg_ref[...] = dtarg.astype(dtarg_ref.dtype)
    dq_ref[...] = jnp.sum(dtarg, axis=1).astype(dq_ref.dtype)

    # dvals[b,t,:] = align[b,t] * dctx[b,:]  (outer product per row)
    dvals_ref[...] = (align[:, :, None] * dctx[:, None, :]
                      ).astype(dvals_ref.dtype)

    dv = jax.lax.dot_general(
        dener.reshape(1, BB * T).astype(th.dtype),
        th.reshape(BB * T, d), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (1, d)

    @pl.when(i == 0)
    def _init():
        dv_ref[...] = dv

    @pl.when(i > 0)
    def _acc():
        dv_ref[...] += dv


def _fwd_call(q, keys, f, v, vals, enc_len, temperature, interpret):
    B, T, d = keys.shape
    vdim = vals.shape[-1]
    assert B % BB == 0, f"batch {B} must be a multiple of {BB}"
    return pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, d=d, vdim=vdim,
                          temperature=temperature),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BB, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, vdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BB, vdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, vdim), jnp.float32),
            jax.ShapeDtypeStruct((B, T), jnp.float32),
        ],
        interpret=interpret,
    )(enc_len.astype(jnp.int32)[:, None], q, keys, f,
      v.reshape(1, -1), vals)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def loc_att_train(q, keys, f, v, vals, enc_len, temperature: float,
                  interpret: bool = False):
    """Fused train attention step. q (B,d) [w_q applied + bias], keys
    (B,T,d), f (B,T,d) [location features @ w_f], v (d,) energy vector,
    vals (B,T,vdim); enc_len/temperature/interpret nondiff. Returns
    (ctx (B,vdim) f32, align (B,T) f32)."""
    return _fwd_call(q, keys, f, v, vals, enc_len, temperature, interpret)


def _vjp_fwd(q, keys, f, v, vals, enc_len, temperature, interpret):
    ctx, align = _fwd_call(q, keys, f, v, vals, enc_len, temperature,
                           interpret)
    return (ctx, align), (q, keys, f, v, vals, align)


def _vjp_bwd(enc_len, temperature, interpret, res, cts):
    q, keys, f, v, vals, align = res
    dctx, dalign = cts
    B, T, d = keys.shape
    vdim = vals.shape[-1]
    dq, dtarg, dvals, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, d=d, vdim=vdim,
                          temperature=temperature),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BB, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, vdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, vdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BB, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, T, vdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, d), q.dtype),
            jax.ShapeDtypeStruct((B, T, d), keys.dtype),
            jax.ShapeDtypeStruct((B, T, vdim), vals.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(enc_len.astype(jnp.int32)[:, None], q, keys, f,
      v.reshape(1, -1), vals, align, dctx.astype(jnp.float32),
      dalign.astype(jnp.float32))
    return (dq, dtarg, dtarg.astype(f.dtype),
            dv.reshape(v.shape).astype(v.dtype), dvals)


loc_att_train.defvjp(_vjp_fwd, _vjp_bwd)
