"""Fused beam-search score/select/recompute step (Pallas, TPU).

STATUS: built, parity-tested (tests/test_beam_step_kernel.py, interpret and
compiled), and measured — NOT wired into decode/beam.py. In a 107-step
lax.scan at the flagship shapes (B=128, K=8, V=31, Tp=256) the kernel costs
~145 us/step (TB=64) while the XLA op-by-op block it replaces costs ~77
us/step: XLA's fusions are already near-roofline for this tail, and the
kernel's unrolled small-K/V where-selects plus per-call overhead lose more
than the op-count reduction saves. Kept (with its tests) as the measured
record of the "mega-step" design point; re-evaluate if Mosaic's batched-dot
or short-vector issue costs improve. Findings that transfer: batched tiny
dot_generals are ~10x slower than unrolled where-selects in Mosaic;
multi-axis reductions crash the layout pass (chain single-axis reduces);
i1 minor-dim inserts are unsupported (round-trip bool masks through int32).

One kernel replaces the ~20 small XLA ops between the model matmuls and the
next beam iteration (profiled at >100 us/step of op overhead at B=128, K=8):

  log-softmax of the attention/LM heads -> eos finalization scores ->
  finished-set top-K merge -> continuation scores (+ CTC prefix psi via the
  probability-domain matmul) -> joint top-K selection -> winner CTC state
  recompute (the two-phase scheme of decode/beam.py, SURVEY.md 2.15/2.16).

Scope (the flagship decode configuration; decode/beam.py falls back to the
XLA op-by-op path otherwise): joint CTC scoring over the FULL vocabulary
(ctc_candidates >= V), no embedding-plugin fusion, B divisible by 8.

Numerics: everything is float32 in-kernel. Selections are EXACT (unrolled
where/accumulate over the small K and V axes — no gathers, no dot-rounding);
the phase-2 recurrences use the same Hillis-Steele doubling as
ops/ctc_prefix (same summation order); the psi matmuls run on the MXU like
the XLA path's einsums. Tie-breaks in top-K pick the lowest flat index,
matching jax.lax.top_k.

Layout contract (caller prepares once per decode):
  * vocab axis padded to 128 lanes with NEG_INF (pad the head weights/bias
    once — the matmul then emits aligned logits for free);
  * CTC log-probs/probs transposed to (B, V, T) with T padded to a 128
    multiple using the standard 'blank with prob 1' rows (pad_ctc_log_probs
    semantics: mass-preserving, so scores at the padded horizon equal the
    true-T scores).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
CLIP = -1e5          # ops/ctc_prefix.CLIP
def _pick_tb(B: int) -> int:
    # one long-vector program beats many short-vector grid cells (the kernel
    # is VPU-issue-bound): largest tile that keeps blocks under ~12 MB VMEM
    for tb in (64, 32, 16, 8):
        if B % tb == 0:
            return tb
    return B


class FusedStepOut(NamedTuple):
    v_idx: jnp.ndarray      # (B, K) int32 winner tokens
    k_idx: jnp.ndarray      # (B, K) int32 winner parent slots
    new_valid: jnp.ndarray  # (B, K) int32 0/1
    new_base: jnp.ndarray   # (B, K) f32  carried base score
    fin_norm: jnp.ndarray   # (B, K) f32  merged finished scores
    fin_meta: jnp.ndarray   # (B, K) int32 packed (step<<8|slot)
    r_nb: jnp.ndarray       # (B, K, Tp) f32 winner CTC states
    r_b: jnp.ndarray        # (B, K, Tp) f32


def _b3(m):
    """bool (A,B) -> bool (A,B,1): Mosaic can't minor-insert i1, so round-trip
    through int32."""
    return jnp.expand_dims(m.astype(jnp.int32), -1) > 0


def _logsumexp_lanes(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))


def _log_softmax(x):
    return x - _logsumexp_lanes(x)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    return m + jnp.log1p(jnp.exp(mn - m))


def _shift1(x, fill):
    """x[..., t] -> x[..., t-1], first lane = fill (static shift by 1)."""
    pad = jnp.full_like(x[..., :1], fill)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _cumsum_d(x):
    """Inclusive cumsum along lanes via doubling (ops/ctc_prefix._cumsum)."""
    T = x.shape[-1]
    s = 1
    while s < T:
        z = jnp.zeros_like(x[..., :s])
        x = x + jnp.concatenate([z, x[..., :-s]], axis=-1)
        s *= 2
    return x


def _cumlse_d(x):
    """Inclusive cumulative logsumexp along lanes via doubling
    (ops/ctc_prefix._cumlogsumexp: same pass structure/order)."""
    T = x.shape[-1]
    s = 1
    while s < T:
        z = jnp.full_like(x[..., :s], NEG_INF)
        x = _logaddexp(x, jnp.concatenate([z, x[..., :-s]], axis=-1))
        s *= 2
    return x


def _kernel(t_ref, att_ref, lm_ref, base_ref, valid_ref, last_ref,
            fnorm_ref, fmeta_ref, rnb_ref, rb_ref, lp_ref,
            minl_ref, maxl_ref,
            vidx_o, kidx_o, valid_o, base_o, fnorm_o, fmeta_o,
            rnb_o, rb_o, *,
            K: int, V: int, Vp: int, Tp: int, TB: int,
            aw: float, cw: float, lw: float,
            eos: int, padt: int, blank: int, use_lm: bool):
    t = t_ref[0, 0]
    att = att_ref[...]                                   # (TB, K, Vp)
    logp_att = _log_softmax(att)
    if use_lm:
        logp_lm = _log_softmax(lm_ref[...])
    else:
        logp_lm = jnp.zeros_like(logp_att)
    base = base_ref[...]                                 # (TB, K)
    valid = valid_ref[...] > 0
    last = last_ref[...]                                 # (TB, K) int32
    r_nb = rnb_ref[...]                                  # (TB, K, Tp)
    r_b = rb_ref[...]
    minl = minl_ref[...]                                 # (TB, 1) int32
    maxl = maxl_ref[...]

    lane_v = jax.lax.broadcasted_iota(jnp.int32, (TB, K, Vp), 2)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)

    # ---------------- eos / finalization ----------------
    ctc_eos = _logaddexp(r_nb[..., Tp - 1], r_b[..., Tp - 1])    # (TB, K)
    tot_eos = (base + aw * logp_att[:, :, eos] + cw * ctc_eos
               + lw * logp_lm[:, :, eos])
    eos_ok = jnp.logical_and(
        valid, jnp.logical_or(t + 1 >= minl, t + 1 >= maxl))
    tot_eos = jnp.where(eos_ok, tot_eos, NEG_INF)
    norm_eos = tot_eos / jnp.maximum(t + 1, 1).astype(jnp.float32)

    # finished-set merge: top-K of (old K, new K) by iterative max-extract
    # (ties -> lowest index, like lax.top_k)
    val2 = jnp.concatenate([fnorm_ref[...], norm_eos], axis=1)   # (TB, 2K)
    meta2 = jnp.concatenate(
        [fmeta_ref[...], (t << 8) + lane_k], axis=1)             # int32
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * K), 1)
    for k in range(K):
        m = jnp.max(val2, axis=1, keepdims=True)                 # (TB, 1)
        pick = jnp.min(jnp.where(val2 == m, iota2, 2 * K),
                       axis=1, keepdims=True)
        chosen = iota2 == pick
        fnorm_o[:, k:k + 1] = m
        fmeta_o[:, k:k + 1] = jnp.sum(jnp.where(chosen, meta2, 0),
                                      axis=1, keepdims=True)
        val2 = jnp.where(chosen, NEG_INF, val2)

    # ---------------- continuation scores ----------------
    cont_keep = (lane_v != eos) & (lane_v != padt) & (lane_v < V)
    masked = jnp.where(cont_keep, aw * logp_att + lw * logp_lm, NEG_INF)

    phi_m1 = jnp.where(t == 0, 0.0, NEG_INF)
    ra = _logaddexp(r_b, r_nb)                                    # (TB,K,Tp)
    phi_diff = _shift1(ra, phi_m1)
    phi_same = _shift1(r_b, phi_m1)

    probs = jnp.exp(lp_ref[...])                                  # (TB,V,Tp)
    md = jnp.maximum(jnp.max(phi_diff, -1, keepdims=True), NEG_INF / 2)
    wd = jnp.exp(phi_diff - md)
    dot_d = jax.lax.dot_general(
        wd, probs, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                       # (TB,K,V)
    psi_diff = md + jnp.log(dot_d + 1e-38)
    ms = jnp.maximum(jnp.max(phi_same, -1, keepdims=True), NEG_INF / 2)
    ws = jnp.exp(phi_same - ms)
    dot_s = jax.lax.dot_general(
        ws, probs, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                       # (TB,K,V)
    # psi_same[b,k] = dot_s[b,k,last[b,k]] — exact unrolled lane select
    psi_same = jnp.zeros((TB, K), jnp.float32)
    for j in range(V):
        psi_same = jnp.where(last == j, dot_s[:, :, j], psi_same)
    psi_same = ms[..., 0] + jnp.log(psi_same + 1e-38)

    psi_pad = jnp.pad(psi_diff, ((0, 0), (0, 0), (0, Vp - V)),
                      constant_values=NEG_INF)
    same_m = lane_v == last[..., None]
    psi_full = jnp.where(same_m, psi_same[..., None], psi_pad)
    psi_full = jnp.where(lane_v == blank, NEG_INF, psi_full)
    psi_full = jnp.where(lane_v >= V, NEG_INF, psi_full)

    tot = base[..., None] + masked + cw * psi_full
    alive = jnp.logical_and(valid, t < maxl)
    tot = jnp.where(_b3(alive), tot, NEG_INF)

    # ---------------- joint top-K selection ----------------
    enc = lane_k[..., None] * Vp + lane_v                         # flat idx
    BIG = K * Vp + 1
    kstars, vstars = [], []
    for k in range(K):
        # chained single-axis reductions: multi-axis reduce crashes the
        # Mosaic layout pass (Check failed: arr.size() >= layout_rank)
        m2 = jnp.max(jnp.max(tot, axis=2, keepdims=True),
                     axis=1, keepdims=True)                       # (TB,1,1)
        pick = jnp.where(tot == m2, enc, BIG)
        pick = jnp.min(jnp.min(pick, axis=2, keepdims=True),
                       axis=1, keepdims=True)                     # (TB,1,1)
        kst = (pick // Vp)[..., 0]                                # (TB,1)
        vst = (pick - (pick // Vp) * Vp)[..., 0]
        chosen = enc == pick
        psi_pick = jnp.sum(jnp.sum(jnp.where(chosen, psi_full, 0.0),
                                   axis=2, keepdims=True),
                           axis=1, keepdims=True)[..., 0]         # (TB,1)
        vidx_o[:, k:k + 1] = vst
        kidx_o[:, k:k + 1] = kst
        base_o[:, k:k + 1] = m2[..., 0] - cw * psi_pick
        valid_o[:, k:k + 1] = (m2[..., 0] > NEG_INF / 2).astype(jnp.int32)
        kstars.append(kst)
        vstars.append(vst)
        tot = jnp.where(chosen, NEG_INF, tot)
    k_sel = jnp.concatenate(kstars, axis=1)                       # (TB, K)
    v_sel = jnp.concatenate(vstars, axis=1)

    # ---------------- phase 2: winner CTC state recompute ----------------
    # exact unrolled selects (no gathers, no dot rounding)
    zt = jnp.zeros((TB, K, Tp), jnp.float32)
    r_nb_sel, r_b_sel = zt, zt
    last_sel = jnp.zeros((TB, K), jnp.int32)
    for j in range(K):
        pickj = _b3(k_sel == j)
        r_nb_sel = jnp.where(pickj, r_nb[:, j][:, None, :], r_nb_sel)
        r_b_sel = jnp.where(pickj, r_b[:, j][:, None, :], r_b_sel)
        last_sel = jnp.where(k_sel == j, last[:, j][:, None], last_sel)
    xs = jnp.full((TB, K, Tp), NEG_INF)
    lp = lp_ref[...]                                              # (TB,V,Tp)
    for j in range(V):
        xs = jnp.where(_b3(v_sel == j), lp[:, j][:, None, :], xs)

    same2 = _b3(v_sel == last_sel)
    phi2 = jnp.where(same2, r_b_sel, _logaddexp(r_b_sel, r_nb_sel))
    phi2_s = _shift1(phi2, phi_m1)
    xs = jnp.maximum(xs, CLIP)
    bl = jnp.maximum(lp[:, blank, :], CLIP)                       # (TB, Tp)

    scum = _cumsum_d(xs)
    scum_s = _shift1(scum, 0.0)
    r_nb_new = scum + _cumlse_d(phi2_s - scum_s)

    bcum = _cumsum_d(bl)                                          # (TB, Tp)
    # NOTE split indexing: a mixed None+slice subscript lowers to a Mosaic
    # gather (unsupported shape); separate expand_dims + slice stay vector ops
    bcum_prev = _shift1(bcum, 0.0)[:, 1:]                         # bcum[:-1]
    bcum_prev = jnp.expand_dims(bcum_prev, 1)                     # (TB,1,·)
    u = jnp.concatenate(
        [jnp.full_like(r_nb_new[..., :1], NEG_INF),
         r_nb_new[..., :-1] - bcum_prev], axis=-1)
    r_b_new = jnp.expand_dims(bcum, 1) + _cumlse_d(u)

    rnb_o[...] = r_nb_new
    rb_o[...] = r_b_new


def fused_score_select(t, att_logits, lm_logits, base, valid, last,
                       fin_norm, fin_meta, r_nb, r_b, ctc_lp_vt,
                       min_len, max_len, *, aw, cw, lw, V, eos_idx, pad_idx,
                       blank=0, interpret=False) -> FusedStepOut:
    """One fused beam step (see module docstring).

    att_logits/lm_logits (B, K, Vp=128·n) with NEG_INF pad lanes;
    lm_logits may be None. r_nb/r_b (B, K, Tp); ctc_lp_vt/probs_vt
    (B, V, Tp); min_len/max_len (B, 1) int32; t scalar int32.
    """
    B, K, Vp = att_logits.shape
    Tp = r_nb.shape[-1]
    TB = _pick_tb(B)
    use_lm = lm_logits is not None
    if not use_lm:
        lm_logits = att_logits          # placeholder ref, never read
    t_arr = jnp.asarray(t, jnp.int32).reshape(1, 1)

    grid = (B // TB,)
    row = lambda b: (b, 0)
    row3 = lambda b: (b, 0, 0)
    bk = pl.BlockSpec((TB, K), row, memory_space=pltpu.VMEM)
    bkt = pl.BlockSpec((TB, K, Tp), row3, memory_space=pltpu.VMEM)
    bvt = pl.BlockSpec((TB, V, Tp), row3, memory_space=pltpu.VMEM)
    bkv = pl.BlockSpec((TB, K, Vp), row3, memory_space=pltpu.VMEM)
    b1 = pl.BlockSpec((TB, 1), row, memory_space=pltpu.VMEM)
    sm = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)

    f32, i32 = jnp.float32, jnp.int32
    outs = pl.pallas_call(
        functools.partial(_kernel, K=K, V=V, Vp=Vp, Tp=Tp, TB=TB,
                          aw=float(aw), cw=float(cw), lw=float(lw),
                          eos=int(eos_idx), padt=int(pad_idx),
                          blank=int(blank), use_lm=use_lm),
        grid=grid,
        in_specs=[sm, bkv, bkv, bk, bk, bk, bk, bk, bkt, bkt, bvt,
                  b1, b1],
        out_specs=[bk, bk, bk, bk, bk, bk, bkt, bkt],
        out_shape=[
            jax.ShapeDtypeStruct((B, K), i32),   # v_idx
            jax.ShapeDtypeStruct((B, K), i32),   # k_idx
            jax.ShapeDtypeStruct((B, K), i32),   # new_valid
            jax.ShapeDtypeStruct((B, K), f32),   # new_base
            jax.ShapeDtypeStruct((B, K), f32),   # fin_norm
            jax.ShapeDtypeStruct((B, K), i32),   # fin_meta
            jax.ShapeDtypeStruct((B, K, Tp), f32),
            jax.ShapeDtypeStruct((B, K, Tp), f32),
        ],
        interpret=interpret,
    )(t_arr, att_logits, lm_logits, base,
      valid.astype(i32), last.astype(i32), fin_norm,
      fin_meta.astype(i32), r_nb, r_b, ctc_lp_vt,
      min_len.astype(i32), max_len.astype(i32))
    return FusedStepOut(*outs)
