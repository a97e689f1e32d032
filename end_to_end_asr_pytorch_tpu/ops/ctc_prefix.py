"""Vectorized label-synchronous CTC prefix scoring (ESPnet-style).

Capability parity with the reference's ``src/ctc.py:CTCPrefixScore``
(SURVEY.md 2.16), which scores ONE prefix at a time with a numpy time loop
inside the per-hypothesis Python beam. Here the recursion is batched over
(batch, beam, vocab) and PARALLEL over encoder time — psi selection scores
come from a probability-domain matmul on the MXU, and the per-winner state
recursion is solved with O(log T) Hillis-Steele cumulative-logsumexp passes
(the key to fully on-device beam search; SURVEY.md 3.2's "decode
bottleneck"). See score_candidates for the derivations.

State convention: ``r`` (B, K, T, 2) holds log-probs of emitting the prefix
by time t with the last frame non-blank (index 0) / blank (index 1).
Padded frames beyond ``enc_len`` must be preprocessed to emit blank with
probability 1 (see ``pad_ctc_log_probs``), which freezes the recursion.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def pad_ctc_log_probs(ctc_lp: jnp.ndarray, enc_len: jnp.ndarray,
                      blank: int = 0) -> jnp.ndarray:
    """Force padded frames to 'blank with prob 1' so the prefix recursion is
    invariant to padding. ctc_lp (B, T, V), enc_len (B,)."""
    B, T, V = ctc_lp.shape
    pad = (jnp.arange(T)[None, :] >= enc_len[:, None])[..., None]  # (B,T,1)
    blank_row = jnp.full((V,), NEG_INF).at[blank].set(0.0)
    return jnp.where(pad, blank_row[None, None, :], ctc_lp)


def init_state(ctc_lp: jnp.ndarray, beam: int, blank: int = 0
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Empty-prefix state for K beam slots.

    Returns (r (B, K, T, 2), psi0 (B, K)): r_nb = -inf, r_b(t) = cumulative
    blank log-prob; psi(empty) = 0 by convention (scores are differenced).
    """
    B, T, V = ctc_lp.shape
    r_b = jnp.cumsum(ctc_lp[:, :, blank], axis=1)          # (B, T)
    r_nb = jnp.full((B, T), NEG_INF)
    r = jnp.stack([r_nb, r_b], axis=-1)                    # (B, T, 2)
    r = jnp.broadcast_to(r[:, None], (B, beam, T, 2))
    psi0 = jnp.zeros((B, beam))
    return r, psi0


CLIP = -1e5  # 'effectively impossible' floor that keeps cumsums finite


def quantize_probs_q8(probs: jnp.ndarray) -> jnp.ndarray:
    """Quantize probabilities in [0, 1] to int8 with the scale the q8 psi
    matmul inverts (round(p * 127); see the probs_q8 branch below). The
    single definition keeps the producer (beam.py) and consumer in sync."""
    return jnp.clip(jnp.round(probs * 127.0), 0.0, 127.0).astype(jnp.int8)


def _cumlogsumexp(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive cumulative logsumexp via Hillis-Steele doubling:
    ceil(log2 T) shifted logaddexp passes. jax.lax.cumlogsumexp lowers to a
    slow path on TPU (measured ~20x slower than this in the beam loop)."""
    T = x.shape[axis]
    x = jnp.moveaxis(x, axis, -1)
    shift = 1
    while shift < T:
        shifted = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(shift, 0)],
                          constant_values=NEG_INF)[..., :T]
        x = jnp.logaddexp(x, shifted)
        shift *= 2
    return jnp.moveaxis(x, -1, axis)


def _cumsum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive cumsum via the same doubling trick: jnp.cumsum lowers to
    reduce-window on TPU, which profiled as the single largest op in the
    beam loop (45us/step at (B,K,1,T))."""
    T = x.shape[axis]
    x = jnp.moveaxis(x, axis, -1)
    shift = 1
    while shift < T:
        shifted = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(shift, 0)])[..., :T]
        x = x + shifted
        shift *= 2
    return jnp.moveaxis(x, -1, axis)


def score_candidates(ctc_lp: jnp.ndarray | None, r_prev: jnp.ndarray,
                     last_tok: jnp.ndarray, prefix_len: jnp.ndarray,
                     blank: int = 0, cand_ids: jnp.ndarray | None = None,
                     with_state: bool = True,
                     probs: jnp.ndarray | None = None,
                     lp_vt: jnp.ndarray | None = None,
                     probs_vt: jnp.ndarray | None = None,
                     blank_lp: jnp.ndarray | None = None,
                     psi_pallas: bool | str = False,
                     probs_q8: jnp.ndarray | None = None,
                     window: int = 0,
                     max_nb_lp: jnp.ndarray | None = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """Score vocab extensions of every hypothesis — PARALLEL-in-T form.

    The candidate recursions
        r_nb(t) = logaddexp(r_nb(t-1), phi(t-1)) + xs(t)
        r_b(t)  = logaddexp(r_b(t-1), r_nb(t-1)) + bl(t)
    are first-order linear recurrences in the (logaddexp, +) semiring, so
    substituting A(t) = r_nb(t) - cumsum(xs) turns them into cumulative
    log-sum-exps (Hillis-Steele doubling, O(log T) passes) instead of a
    T-step sequential scan — measured 7.5x faster end-to-end beam decode on
    TPU vs the lax.scan form at T=704/K=8/V=31.
    Emission log-probs are floored at CLIP so the cumsums stay finite; the
    floor is far below any reachable path score.

    ctc_lp (B, T, V) padded log-probs; r_prev (B, K, T, 2); last_tok (B, K)
    last emitted token of each prefix; prefix_len (B, K) number of emitted
    tokens (0 = empty prefix). When ``cand_ids`` (B, K, C) is given, only
    those extensions are scored (the reference's cheap_compute, SURVEY.md
    2.16); otherwise all V.

    ``probs`` (= exp(ctc_lp)), ``lp_vt`` (= moveaxis(ctc_lp, 1, 2)),
    ``probs_vt`` (= exp(lp_vt)), ``probs_q8`` (= round(exp(ctc_lp)*127) as
    int8; opt-in quantized psi-matmul operand, see beam.py `psi_quant`) and
    ``blank_lp`` (= max(ctc_lp[:,:,blank],
    CLIP)) are loop-invariant (B, T, V)- / (B, T)-sized tensors: callers
    scoring many steps (the beam loop) should precompute them ONCE outside
    the step — XLA does not hoist them out of the while body, and at subword
    vocab sizes recomputing/relayouting ~92 MB per step dominated the decode
    (measured 504 -> 1464 utts/sec at V=1024, B=128 after hoisting). When
    every needed companion is supplied, ``ctc_lp`` itself may be None (so
    the (B, T, V) f32 tensor is not kept live through the decode scan).

    When BOTH ``cand_ids`` and ``probs_vt`` are given in psi-only mode, the
    scorer row-gathers the C candidate emission rows from ``probs_vt``
    (B, V, T) instead of computing the full-vocab (B,K,V) einsum, so HBM
    reads scale with C rather than V. MEASURED NEGATIVE on TPU inside the
    decode scan (bench_vocab round 3): axis-1 row gathers serialize
    (V=1024/C=32: 621 utts/s vs 2022 for the full matmul; V=16k: 67 vs
    255) — the beam always uses the full-vocab matmul. The path is kept,
    exact and tested, for callers outside hot TPU loops (CPU scoring,
    offline rescoring) where the C<<V compute saving is real.

    ``window`` > 0 (beam.py ``ctc_window``; psi-only full-vocab path only)
    restricts the phase-1 psi reduction to a ``window``-frame slice of the
    probs tensor around the per-sample alignment frontier — the argmax over
    t of [max_k phi_diff (+ ``max_nb_lp``, the loop-invariant per-frame best
    non-blank log-prob, which sharpens the frontier against the flat
    trailing-blank plateau of phi)]. For a trained (peaky, monotonic) CTC
    head the weights exp(phi - md) die off within a few frames of the
    frontier on both sides, so the windowed sum is the full sum minus
    negligible mass; HBM reads of the dominant (B,T,V) operand drop by
    T/window. Contributions outside the window are DROPPED (psi is
    underestimated; a candidate with all its mass outside degrades to the
    same finite floor class as the q8 path) — opt-in approximation, exact
    when the window covers the weight support. CAVEAT (length-divergent
    beams): the frontier is the max over all K hypotheses of a sample and
    the slice is SHARED across them, so a hypothesis whose own alignment
    trails the beam-best frontier by more than window/2 frames has its psi
    underestimated beyond the per-candidate tail case above — pick
    ``window`` large enough to span the within-beam frontier spread (a
    per-hypothesis slice would make the probs operand (B,K,W,V), K x the
    HBM traffic the window exists to save, so it is not offered).

    Returns (psi (B, K, C) full prefix log-prob of each extension,
             r_new (B, K, C, T, 2) state of each extension); C = V if
    cand_ids is None.
    """
    B, K, T, _ = r_prev.shape
    if ctc_lp is not None:
        V = ctc_lp.shape[-1]
    elif lp_vt is not None:
        V = lp_vt.shape[1]
    elif probs_vt is not None:
        V = probs_vt.shape[1]
    else:
        V = probs.shape[-1]

    if cand_ids is None:
        C = V
        cand = jax.lax.broadcasted_iota(jnp.int32, (B, K, V), 2)
    else:
        C = cand_ids.shape[-1]
        cand = cand_ids

    r_nb_prev = r_prev[..., 0]                             # (B, K, T)
    r_b_prev = r_prev[..., 1]
    empty = (prefix_len == 0)[..., None]                   # (B, K, 1)

    if not with_state:
        # -------- psi-only fast path: log-semiring matmul on the MXU ------
        # phi(t-1) has only two variants per (b,k): 'diff' (c != last) and
        # 'same' (c == last). psi(c) = logsumexp_t[phi_variant(t-1)+lp(t,c)]
        # = m + log( exp(phi-m) @ exp(lp) ) — a real matmul in probability
        # space after a per-hypothesis max shift. This avoids materializing
        # any (B,K,C,T) tensor (part of the 26 -> 782 utts/sec decode progression; see BASELINE.md).
        phi_m1_col = jnp.where(empty[..., 0], 0.0, NEG_INF)[..., None]
        phi_diff = jnp.concatenate(
            [phi_m1_col, jnp.logaddexp(r_b_prev, r_nb_prev)[..., :-1]],
            axis=-1)                                        # (B, K, T)
        phi_same = jnp.concatenate(
            [phi_m1_col, r_b_prev[..., :-1]], axis=-1)      # (B, K, T)

        if cand_ids is not None and probs_vt is not None:
            # ------ candidate-restricted psi: row-gather from (B, V, T) ----
            # The full-vocab einsum below re-reads the whole (B,T,V) probs
            # tensor every step; at subword vocabs that is the decode's
            # dominant HBM traffic (V=16k, B=128, T_enc=176 bf16:
            # ~740 MB/step at the 7 s bench shapes).
            # Here only the K*C candidate rows are gathered (contiguous
            # T-length rows of probs_vt), so reads scale with C, not V.
            idx = cand.reshape(B, K * C, 1).astype(jnp.int32)
            pc = jnp.take_along_axis(probs_vt, idx, axis=1)  # (B, K*C, T)
            pc = pc.reshape(B, K, C, T)
            md = jnp.maximum(jnp.max(phi_diff, -1, keepdims=True),
                             NEG_INF / 2)
            wd = jnp.exp(phi_diff - md).astype(probs_vt.dtype)
            psi_diff = md + jnp.log(jnp.einsum(
                "bkt,bkct->bkc", wd, pc,
                preferred_element_type=jnp.float32) + 1e-38)  # (B, K, C)
            ms = jnp.maximum(jnp.max(phi_same, -1, keepdims=True),
                             NEG_INF / 2)
            ws = jnp.exp(phi_same - ms).astype(probs_vt.dtype)
            p_last = jnp.take_along_axis(
                probs_vt, last_tok[..., None].astype(jnp.int32),
                axis=1)                                       # (B, K, T)
            psi_same = ms[..., 0] + jnp.log(jnp.einsum(
                "bkt,bkt->bk", ws, p_last,
                preferred_element_type=jnp.float32) + 1e-38)  # (B, K)
            psi = jnp.where(cand == last_tok[..., None],
                            psi_same[..., None], psi_diff)
            return jnp.where(cand == blank, NEG_INF, psi), None

        if probs is None:
            probs = jnp.exp(ctc_lp)                         # (B, T, V)
        md = jnp.maximum(jnp.max(phi_diff, -1, keepdims=True), NEG_INF / 2)
        wd = jnp.exp(phi_diff - md)                         # (B, K, T) f32

        ms = jnp.maximum(jnp.max(phi_same, -1, keepdims=True), NEG_INF / 2)
        ws = jnp.exp(phi_same - ms).astype(probs.dtype)
        p_last = jnp.take_along_axis(
            probs, last_tok[:, None, :].astype(jnp.int32), axis=2)  # (B,T,K)
        psi_same = (ms[..., 0] + jnp.log(jnp.einsum(
            "bkt,btk->bk", ws, p_last,
            preferred_element_type=jnp.float32) + 1e-38))   # (B, K)

        if psi_pallas and cand_ids is None:
            # Pallas psi: streams each (T, BV) probs block once and merges
            # the log / last-token / blank epilogues in VMEM (amp path
            # only; see ops/pallas/psi_kernel.py). Same bf16-multiply +
            # f32-accumulate numerics as the einsum below, different
            # accumulation order (near-tie class).
            from .pallas.psi_kernel import psi_fused
            return psi_fused(
                wd, probs, md[..., 0], psi_same, last_tok, blank=blank,
                interpret=(psi_pallas == "interpret")), None

        if window and window < T:
            # -------- windowed phase-1 psi (see docstring): slice the
            # W-frame window per sample with vmapped dynamic_slice (W
            # CONTIGUOUS t-rows of (T, V) — not the scattered axis-1 row
            # gathers that measured catastrophic in round 3) and run the
            # same einsum on (B,K,W) x (B,W,V). md stays the full-range
            # max (a valid shift for any sub-range). psi_same above is
            # untouched: its p_last traffic is K columns, V-independent.
            W = int(window)
            sup = jnp.max(phi_diff, axis=1)                     # (B, T)
            if max_nb_lp is not None:
                sup = sup + max_nb_lp
            start = jnp.clip(
                jnp.argmax(sup, axis=-1).astype(jnp.int32) - W // 2,
                0, T - W)                                       # (B,)
            wd = jax.vmap(
                lambda a, s: jax.lax.dynamic_slice_in_dim(a, s, W, axis=1)
            )(wd, start)                                        # (B, K, W)
            slice_tv = jax.vmap(
                lambda a, s: jax.lax.dynamic_slice_in_dim(a, s, W, axis=0))
            if probs_q8 is not None:
                probs_q8 = slice_tv(probs_q8, start)            # (B, W, V)
            else:
                probs = slice_tv(probs, start)                  # (B, W, V)

        if probs_q8 is not None:
            # int8-quantized psi matmul (beam.py `psi_quant`): probs were
            # pre-quantized to round(p*127) in [0,127]; the step weights
            # exp(phi-md) are in [0,1] and quantize the same way. The s8xs8
            # dot accumulates exactly in int32 (<= T*127^2 << 2^31), so the
            # error is the two uniform quantizations. The governing term is
            # the DYNAMIC RANGE of the weights: wd spans many decades under
            # one per-hypothesis max shift, so any contribution from time
            # steps with wd below ~1/254 of the max is dropped — psi is
            # quantization-step accurate for candidates whose mass rides
            # the dominant weight steps (chip-measured at V=1024/T=112:
            # <0.06 nats within 1 nat of the per-hypothesis best, <0.16
            # within 2, <0.41 within 3 — backend-independent, q8-vs-f32
            # and q8-vs-bf16 agree to 2e-3; candidates >4-5 nats back can
            # degrade toward the md-69 floor below).
            # Halves the einsum's HBM reads vs bf16, doubles MXU s8 rate.
            qw = jnp.clip(jnp.round(wd * 127.0), 0.0, 127.0
                          ).astype(jnp.int8)
            acc = jnp.einsum("bkt,btv->bkv", qw, probs_q8,
                             preferred_element_type=jnp.int32)
            # acc == 0 means the weighted emission mass is below the
            # quantization resolution (~1/127^2): floor at md - 69 nats
            # (log 1e-30) — the same CLASS of finite floor the exact path
            # has (md + log 1e-38 when the einsum underflows), and never
            # more than ~59 nats behind the row's best candidate (whose
            # acc >= 1 gives psi >= md - 9.7). A NEG_INF here instead was
            # a live bug: a selected NEG_INF-psi candidate survives the
            # validity threshold when cw < 0.5, and the base recovery
            # top_tot - cw*psi then cancels catastrophically to ~0.0,
            # minting a score-0 garbage hypothesis that hijacks the beam.
            accf = acc.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
            psi_diff = md + jnp.log(jnp.maximum(accf, 1e-30))
        else:
            # match the small operand's dtype to probs: a mixed f32 x bf16
            # einsum upconverts the (B,T,V) operand to f32 (a 2x-sized
            # materialized copy EVERY step) instead of running the native
            # bf16 MXU path; wd/ws casts keep psi's f32 accumulation
            psi_diff = md + jnp.log(jnp.einsum(
                "bkt,btv->bkv", wd.astype(probs.dtype), probs,
                preferred_element_type=jnp.float32) + 1e-38)  # (B, K, V)

        vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (B, K, V), 2)
        psi_full = jnp.where(vocab_ids == last_tok[..., None],
                             psi_same[..., None], psi_diff)
        psi_full = psi_full.at[:, :, blank].set(NEG_INF)
        if cand_ids is not None:
            return jnp.take_along_axis(psi_full, cand, axis=2), None
        return psi_full, None

    # ---------------- with_state path: build the (B, K, C, T) tensors the
    # psi-only fast paths above never need (and which eager psi-only
    # callers would otherwise materialize for nothing)
    # phi(t) = r_b(t|g) + [c != last] r_nb(t|g) : (B, K, C, T)
    same = cand == last_tok[..., None]                     # (B, K, C)
    # c == last: only blank-terminated paths may extend; else both.
    phi = jnp.where(
        same[..., None], r_b_prev[:, :, None, :],
        jnp.logaddexp(r_b_prev, r_nb_prev)[:, :, None, :])  # (B,K,C,T)
    phi_m1 = jnp.broadcast_to(jnp.where(empty, 0.0, NEG_INF), (B, K, C))

    # per-candidate emission log-probs over time: xs (B, K, C, T)
    if cand_ids is None:
        if lp_vt is None:
            lp_vt = jnp.moveaxis(ctc_lp, 1, 2)              # (B, V, T)
        xs = jnp.broadcast_to(lp_vt[:, None], (B, K, V, T))
    elif ctc_lp is not None:
        # lane gather of the candidate COLUMNS of (B, T, V): exact (no
        # matmul rounding) and the one gather pattern that is fast on TPU
        # — this is the beam's C=1 winner-state recompute. Measured
        # history at this spot (V=1024, B=128): broadcast take_along
        # ~650 us/step -> one-hot matmul over (B,V,T) ~150 us/step (but
        # scaling with V: reads the whole tensor) -> this V-independent
        # lane gather ~25 us/step. Axis-1 ROW gathers of (B,V,T) measured
        # catastrophically slow in-loop (bench_vocab round 3, 2-9x decode
        # regression) — do not reintroduce them on the TPU path.
        idx = cand.reshape(B, 1, K * C).astype(jnp.int32)
        g = jnp.take_along_axis(ctc_lp, idx, axis=2)        # (B, T, K*C)
        xs = jnp.moveaxis(g, 1, 2).reshape(B, K, C, T)
    else:
        # row-gather fallback for lp_vt-only callers (exact; reads scale
        # with K*C instead of V; fine outside hot TPU loops)
        idx = cand.reshape(B, K * C, 1).astype(jnp.int32)
        xs = jnp.take_along_axis(lp_vt, idx, axis=1).reshape(B, K, C, T)
    xs = jnp.maximum(xs, CLIP)
    bl = (blank_lp if blank_lp is not None
          else jnp.maximum(ctc_lp[:, :, blank], CLIP))     # (B, T)

    # phi shifted: position t holds phi(t-1); phi(-1) = 0 iff empty prefix
    phi_s = jnp.concatenate([phi_m1[..., None],
                             jnp.maximum(phi[..., :-1], NEG_INF)], axis=-1)

    # psi = logsumexp_t [ phi(t-1) + xs(t) ]  — pure reduction
    psi = jax.nn.logsumexp(phi_s + xs, axis=-1)
    psi = jnp.where(cand == blank, NEG_INF, psi)

    # r_nb = Scum + cumlogsumexp(phi(t-1) - Scum(t-1))
    scum = _cumsum(xs, 3)
    scum_s = jnp.concatenate([jnp.zeros_like(scum[..., :1]),
                              scum[..., :-1]], axis=-1)
    r_nb = scum + _cumlogsumexp(phi_s - scum_s, axis=3)

    # r_b = Bcum + cumlogsumexp(r_nb(t-1) - Bcum(t-1)); r_nb(-1) = -inf
    bcum = _cumsum(bl, 1)                                  # (B, T)
    bcum_s = jnp.concatenate([jnp.zeros_like(bcum[..., :1]),
                              bcum[..., :-1]], axis=-1)
    u = jnp.concatenate(
        [jnp.full_like(r_nb[..., :1], NEG_INF),
         r_nb[..., :-1] - bcum_s[:, None, None, 1:]], axis=-1)
    r_b = bcum[:, None, None, :] + _cumlogsumexp(u, axis=3)

    r_new = jnp.stack([r_nb, r_b], axis=-1)                # (B, K, C, T, 2)
    return psi, r_new


def final_score(r_prev: jnp.ndarray, prefix_len: jnp.ndarray = None
                ) -> jnp.ndarray:
    """CTC log-prob of each prefix as a COMPLETE sequence (used for <eos>):
    logsumexp of both states at the last frame. Empty prefix scores its
    all-blank path (r_b at T-1) via the same expression, so the result is
    length-independent — ``prefix_len`` is accepted for call-site symmetry
    with score_candidates and ignored. (B, K)."""
    del prefix_len
    last = jnp.logaddexp(r_prev[..., -1, 0], r_prev[..., -1, 1])
    return last
