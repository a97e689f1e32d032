"""Fused CTC phase-1 psi kernel (Pallas) for subword-scale beam decode.

MEASURED NEGATIVE RESULT — default OFF (decode_cfg['psi_kernel']=True
opts in). At subword vocabs the beam loop's dominant HBM traffic is
phase-1 psi: one probability-domain matmul per step that re-reads the
whole (B, T, V) probs tensor (bench_vocab: V=5120 psi einsum 445 us/step
= ~40% of the read's bandwidth roofline; reference behavior: src/ctc.py
CTCPrefixScore per-candidate scores, SURVEY.md 2.16). This kernel fuses
the einsum with its log/last-token/blank epilogues (which XLA runs as
extra (B,K,V) passes), yet the FULL V=5120 decode measured 787 -> 567
utts/sec with it on (round 3, bench_vocab): standalone the kernel ties
the einsum (2.34 vs 2.62 ms at V=5120 incl. dispatch), but inside the
lax.scan body XLA overlaps the einsum + epilogue with neighboring beam
ops while a pallas_call is a scheduling barrier — the third independent
measurement of this economics (beam_step_kernel.py mega-step,
att_kernel.py in-beam). Kept exact, tested (interpret + compiled), and
opt-in for non-scan callers.

The kernel streams each probs block once and finishes psi in VMEM:

    psi[b,k,v] = v == blank     ? NEG_INF
               : v == last[b,k] ? psi_same[b,k]
               : md[b,k] + log(dot(wd[b,k,:], probs[b,:,v]) + 1e-38)

i.e. the full-vocab psi the beam's selection consumes directly (the
`where` merges were previously extra (B,K,V) passes). bf16 multiply +
f32 accumulate exactly like the einsum it replaces (DEFAULT precision:
a global highest-precision default would blow Mosaic's scoped VMEM —
see NOTES.md round-2 log).

Amp-path only: the non-amp (exact f32) decode keeps the original XLA op
sequence, per the repo's decode-numerics policy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_VMEM_BUDGET = 4 * 1024 * 1024  # probs-block bytes per grid cell


def pick_block(V: int, T: int, itemsize: int = 2) -> int | None:
    """Largest vocab block in {1024, 512, 256, 128} that divides V and keeps
    the (T, BV) probs block within the VMEM budget; None if V unsupported."""
    for bv in (1024, 512, 256, 128):
        if V % bv == 0 and T * bv * itemsize <= _VMEM_BUDGET:
            return bv
    return None


def _kernel(wd_ref, probs_ref, md_ref, ps_ref, last_ref, out_ref,
            *, K: int, BV: int, blank: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    wd = wd_ref[0].astype(probs_ref.dtype)            # (K, T)
    pb = probs_ref[0]                                 # (T, BV)
    acc = jnp.dot(wd, pb, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)  # (K, BV)
    col = j * BV + jax.lax.broadcasted_iota(jnp.int32, (1, BV), 1)
    rows = []
    for k in range(K):  # K <= 8: unrolled scalar-prefetch loop (SMEM reads)
        r = md_ref[b, k] + jnp.log(acc[k:k + 1, :] + 1e-38)   # (1, BV)
        r = jnp.where(col == last_ref[b, k], ps_ref[b, k], r)
        rows.append(r)
    psi = jnp.concatenate(rows, axis=0)               # (K, BV)
    out_ref[0] = jnp.where(col == blank, NEG_INF, psi)


@functools.partial(jax.jit, static_argnames=("blank", "interpret"))
def psi_fused(wd: jnp.ndarray, probs: jnp.ndarray, md: jnp.ndarray,
              psi_same: jnp.ndarray, last_tok: jnp.ndarray, *,
              blank: int = 0, interpret: bool = False) -> jnp.ndarray:
    """wd (B,K,T) f32 = exp(phi_diff - md); probs (B,T,V) bf16 = exp(ctc_lp);
    md (B,K) f32 row max-shifts; psi_same (B,K) f32 score of repeating the
    last token; last_tok (B,K) int32. Returns psi (B,K,V) f32."""
    B, K, T = wd.shape
    V = probs.shape[-1]
    BV = pick_block(V, T, probs.dtype.itemsize)
    assert BV is not None, f"V={V} not blockable (T={T})"

    return pl.pallas_call(
        functools.partial(_kernel, K=K, BV=BV, blank=blank),
        grid=(B, V // BV),
        in_specs=[
            pl.BlockSpec((1, K, T), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, BV), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, K), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, K), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, K, BV), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, V), jnp.float32),
        interpret=interpret,
    )(wd, probs, md.astype(jnp.float32), psi_same.astype(jnp.float32),
      last_tok.astype(jnp.int32))
