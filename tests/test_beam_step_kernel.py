"""Fused beam-step kernel (interpret mode) vs the XLA op-by-op reference.

The reference below mirrors decode/beam.py's in-loop math exactly (identity
CTC candidate set, C == V): eos finalization + finished merge + continuation
scoring with ctc_prefix psi + flat top-K + winner state recompute.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops import ctc_prefix
from end_to_end_asr_pytorch_tpu.ops.pallas.beam_step_kernel import (
    NEG_INF, fused_score_select)

B, K, V, Vp, Tp = 16, 4, 7, 128, 128
EOS, PAD, BLANK = 1, 0, 0
AW, CW, LW = 0.7, 0.3, 0.2


def _inputs(t, seed=0):
    rng = np.random.RandomState(seed)
    att = rng.randn(B, K, V).astype(np.float32) * 2
    lm = rng.randn(B, K, V).astype(np.float32) * 2
    base = rng.randn(B, K).astype(np.float32)
    valid = np.ones((B, K), bool)
    if t == 0:
        valid[:, 1:] = False          # step-0 convention: only slot 0 live
    else:
        valid[3, 2] = False           # a dead slot mid-decode
    last = rng.randint(2, V, (B, K)).astype(np.int32)
    fin_norm = np.full((B, K), NEG_INF, np.float32)
    fin_meta = np.zeros((B, K), np.int32)
    if t > 0:
        fin_norm[:, :2] = rng.randn(B, 2) - 5.0
        fin_meta[:, :2] = (rng.randint(1, t + 1, (B, 2)) << 8) \
            + rng.randint(0, K, (B, 2))
    # CTC log-probs with per-utt lengths, padded to Tp with blank-prob-1 rows
    enc_len = rng.randint(Tp // 2, Tp + 1, (B,)).astype(np.int32)
    lp = rng.randn(B, Tp, V).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(lp), axis=-1)
    lp = ctc_prefix.pad_ctc_log_probs(lp, jnp.asarray(enc_len))
    # a plausible r state: init, then (for t>0) one scored extension
    r, _ = ctc_prefix.init_state(lp, K)
    if t > 0:
        _, r_new = ctc_prefix.score_candidates(
            lp, r, jnp.asarray(last), jnp.zeros((B, K), jnp.int32),
            cand_ids=jnp.asarray(last)[..., None])
        r = r_new[:, :, 0]
    min_len = np.maximum((0.05 * enc_len).astype(np.int32), 0)
    max_len = np.maximum((0.6 * enc_len).astype(np.int32), 1)
    return (jnp.asarray(att), jnp.asarray(lm), jnp.asarray(base),
            jnp.asarray(valid), jnp.asarray(last), jnp.asarray(fin_norm),
            jnp.asarray(fin_meta), r, lp, jnp.asarray(min_len),
            jnp.asarray(max_len))


def _ref_step(t, att, lm, base, valid, last, fin_norm, fin_meta, r, lp,
              min_len, max_len):
    """decode/beam.py's step body, verbatim math (C == V)."""
    logp_att = jax.nn.log_softmax(att, -1)
    logp_lm = jax.nn.log_softmax(lm, -1)
    ctc_eos = ctc_prefix.final_score(r, None)
    tot_eos = (base + AW * logp_att[:, :, EOS] + CW * ctc_eos
               + LW * logp_lm[:, :, EOS])
    eos_ok = jnp.logical_and(
        valid, jnp.logical_or(t + 1 >= min_len[:, None],
                              t + 1 >= max_len[:, None]))
    tot_eos = jnp.where(eos_ok, tot_eos, NEG_INF)
    norm_eos = tot_eos / jnp.maximum(t + 1, 1).astype(jnp.float32)
    all_norm = jnp.concatenate([fin_norm, norm_eos], axis=1)
    meta_new = jnp.broadcast_to((t << 8) + jnp.arange(K, dtype=jnp.int32),
                                (B, K))
    all_meta = jnp.concatenate([fin_meta, meta_new], axis=1)
    fin_norm_o, fin_idx = jax.lax.top_k(all_norm, K)
    fin_meta_o = jnp.take_along_axis(all_meta, fin_idx, axis=1)

    ids = jnp.arange(V)
    cont_keep = (ids != EOS) & (ids != PAD)
    masked = jnp.where(cont_keep[None, None], AW * logp_att + LW * logp_lm,
                       NEG_INF)
    psi, _ = ctc_prefix.score_candidates(
        lp, r, last, jnp.full((B, K), t, jnp.int32), with_state=False)
    tot = base[..., None] + masked + CW * psi
    alive = jnp.logical_and(valid, t < max_len[:, None])
    tot = jnp.where(alive[..., None], tot, NEG_INF)
    flat = tot.reshape(B, K * V)
    top_tot, top_idx = jax.lax.top_k(flat, K)
    new_valid = top_tot > NEG_INF / 2
    k_idx = top_idx // V
    v_idx = top_idx % V
    psi_g = jnp.take_along_axis(psi.reshape(B, K * V), top_idx, axis=1)
    new_base = top_tot - CW * psi_g
    r_sel = jnp.take_along_axis(r, k_idx[..., None, None], axis=1)
    last_sel = jnp.take_along_axis(last, k_idx, axis=1)
    _, r_new = ctc_prefix.score_candidates(
        lp, r_sel, last_sel, jnp.full((B, K), t, jnp.int32),
        cand_ids=v_idx[..., None])
    return (v_idx, k_idx, new_valid, new_base, fin_norm_o, fin_meta_o,
            r_new[:, :, 0])


@pytest.mark.parametrize("t", [0, 3])
def test_fused_step_matches_reference(t):
    (att, lm, base, valid, last, fin_norm, fin_meta, r, lp, min_len,
     max_len) = _inputs(t, seed=t)
    ref = _ref_step(t, att, lm, base, valid, last, fin_norm, fin_meta, r,
                    lp, min_len, max_len)

    att_p = jnp.pad(att, ((0, 0), (0, 0), (0, Vp - V)),
                    constant_values=NEG_INF)
    lm_p = jnp.pad(lm, ((0, 0), (0, 0), (0, Vp - V)),
                   constant_values=NEG_INF)
    lp_vt = jnp.swapaxes(lp, 1, 2)                       # (B, V, Tp)
    got = fused_score_select(
        t, att_p, lm_p, base, valid, last, fin_norm, fin_meta,
        r[..., 0], r[..., 1], lp_vt,
        min_len[:, None], max_len[:, None],
        aw=AW, cw=CW, lw=LW, V=V, eos_idx=EOS, pad_idx=PAD, blank=BLANK,
        interpret=True)

    v_idx, k_idx, new_valid, new_base, fin_norm_o, fin_meta_o, r_new = [
        np.asarray(x) for x in ref]
    live = new_valid
    assert np.array_equal(np.asarray(got.v_idx)[live], v_idx[live])
    assert np.array_equal(np.asarray(got.k_idx)[live], k_idx[live])
    assert np.array_equal(np.asarray(got.new_valid).astype(bool), new_valid)
    np.testing.assert_allclose(np.asarray(got.new_base)[live],
                               new_base[live], rtol=1e-5, atol=1e-5)
    finite = fin_norm_o > NEG_INF / 2
    np.testing.assert_allclose(np.asarray(got.fin_norm)[finite],
                               fin_norm_o[finite], rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(got.fin_meta)[finite],
                          fin_meta_o[finite])
    got_r = np.stack([np.asarray(got.r_nb), np.asarray(got.r_b)], -1)
    sane = got_r[live] > NEG_INF / 2
    np.testing.assert_allclose(got_r[live][sane], r_new[live][sane],
                               rtol=1e-4, atol=1e-4)
