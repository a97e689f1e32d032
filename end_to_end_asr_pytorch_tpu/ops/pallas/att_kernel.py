"""Fused location-aware attention step (Pallas).

The per-step energy tanh over (B, K, T, d) is the beam decoder's largest
non-CTC cost (SURVEY.md section 7 'stretch' kernel). XLA materializes the
(B, K, T, d) tanh argument and energy intermediates in HBM every decode
step; this kernel keeps the whole chain — location-feature projection,
query+key+feature sum, tanh, energy reduction, masked softmax, and the
context matmul — inside VMEM, one grid cell per utterance with its K beam
queries sharing one read of the keys/values.

Single-head only (the reference's default configs use num_head=1); the jnp
path in models/attention.py handles multi-head and other modes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qb_ref, keys_ref, fsm_ref, wf_ref, v_ref, vals_ref, len_ref,
            ctx_ref, align_ref, *, K: int, T: int, d: int, F: int,
            vdim: int, temperature: float):
    b = pl.program_id(0)
    keys = keys_ref[0]                                  # (T, d)
    vals = vals_ref[0]                                  # (T, vdim)
    w_f = wf_ref[...]                                   # (F, d)
    v = v_ref[...]                                      # (1, d)
    enc_len = len_ref[b, 0]

    fsm = fsm_ref[0].reshape(K * T, F)                  # (K*T, F)
    f = jnp.dot(fsm, w_f, preferred_element_type=jnp.float32)  # (K*T, d)
    f = f.reshape(K, T, d)

    qb = qb_ref[0]                                      # (K, d)
    targ = qb[:, None, :] + keys[None, :, :] + f        # (K, T, d)
    energy = jnp.sum(jnp.tanh(targ) * v[None, :, :], axis=-1)  # (K, T)
    energy = energy * (1.0 / temperature)

    t_ids = jax.lax.broadcasted_iota(jnp.int32, (K, T), 1)
    energy = jnp.where(t_ids < enc_len, energy, -1e30)
    m = jnp.max(energy, axis=1, keepdims=True)
    e = jnp.exp(energy - m)
    align = e / jnp.sum(e, axis=1, keepdims=True)       # (K, T)
    align_ref[0] = align

    ctx_ref[0] = jnp.dot(align, vals,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT)  # (K, vdim)


@functools.partial(jax.jit,
                   static_argnames=("temperature", "interpret"))
def loc_attention_fused(qb: jnp.ndarray, keys: jnp.ndarray, fsm: jnp.ndarray,
                        w_f: jnp.ndarray, v: jnp.ndarray, vals: jnp.ndarray,
                        enc_len: jnp.ndarray, *, temperature: float,
                        interpret: bool = False):
    """qb (B,K,d) query-proj+bias; keys (B,T,d); fsm (B,K,T,F) conv loc
    features; w_f (F,d); v (d,) energy vector; vals (B,T,vdim);
    enc_len (B,). Returns (ctx (B,K,vdim), align (B,K,T))."""
    B, K, d = qb.shape
    T = keys.shape[1]
    F = fsm.shape[-1]
    vdim = vals.shape[-1]

    ctx, align = pl.pallas_call(
        functools.partial(_kernel, K=K, T=T, d=d, F=F, vdim=vdim,
                          temperature=temperature),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, T, F), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, vdim), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, vdim), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, T), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, vdim), jnp.float32),
            jax.ShapeDtypeStruct((B, K, T), jnp.float32),
        ],
        interpret=interpret,
    )(qb, keys, fsm, w_f, v.reshape(1, -1), vals,
      enc_len.astype(jnp.int32)[:, None])
    return ctx, align
