"""Vectorized label-synchronous CTC prefix scoring (ESPnet-style).

Capability parity with the reference's ``src/ctc.py:CTCPrefixScore``
(SURVEY.md 2.16), which scores ONE prefix at a time with a numpy time loop
inside the per-hypothesis Python beam. Here the recursion is batched over
(batch, beam, vocab) and runs as a single ``lax.scan`` over encoder time —
the shape the TPU wants and the key to fully on-device beam search
(SURVEY.md 3.2's "decode bottleneck").

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


def score_candidates(ctc_lp: jnp.ndarray, r_prev: jnp.ndarray,
                     last_tok: jnp.ndarray, prefix_len: jnp.ndarray,
                     blank: int = 0, cand_ids: jnp.ndarray | None = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score vocab extensions of every hypothesis.

    ctc_lp (B, T, V) padded log-probs; r_prev (B, K, T, 2); last_tok (B, K)
    last emitted token of each prefix; prefix_len (B, K) number of emitted
    tokens (0 = empty prefix). When ``cand_ids`` (B, K, C) is given, only
    those extensions are scored (the reference's cheap_compute, SURVEY.md
    2.16); otherwise all V.

    Returns (psi (B, K, C) full prefix log-prob of each extension,
             r_new (B, K, C, T, 2) state of each extension); C = V if
    cand_ids is None.
    """
    B, K, T, _ = r_prev.shape
    V = ctc_lp.shape[-1]

    if cand_ids is None:
        C = V
        cand = jax.lax.broadcasted_iota(jnp.int32, (B, K, V), 2)
    else:
        C = cand_ids.shape[-1]
        cand = cand_ids

    # phi(t) = r_b(t|g) + [c != last] r_nb(t|g) : (B, K, C, T)
    r_nb_prev = r_prev[..., 0]                             # (B, K, T)
    r_b_prev = r_prev[..., 1]
    same = cand == last_tok[..., None]                     # (B, K, C)
    # c == last: only blank-terminated paths may extend; else both.
    phi = jnp.where(
        same[..., None], r_b_prev[:, :, None, :],
        jnp.logaddexp(r_b_prev, r_nb_prev)[:, :, None, :])  # (B,K,C,T)

    empty = (prefix_len == 0)[..., None]                   # (B, K, 1)
    phi_m1 = jnp.broadcast_to(jnp.where(empty, 0.0, NEG_INF), (B, K, C))

    lp_tok = jnp.moveaxis(ctc_lp, 1, 0)                    # (T, B, V)
    lp_blank = jnp.moveaxis(ctc_lp[:, :, blank], 1, 0)     # (T, B)
    phi_tm = jnp.moveaxis(phi, 3, 0)                       # (T, B, K, C)

    def step(carry, inp):
        r_nb, r_b, psi = carry                             # (B,K,C) each
        lp_t, lp_blank_t, phi_prev = inp                   # (B,V),(B,),(B,K,C)
        if cand_ids is None:
            xs = lp_t[:, None, :]                          # (B,1,V)
        else:
            xs = jnp.take_along_axis(
                jnp.broadcast_to(lp_t[:, None, :], (B, K, V)), cand, axis=2)
        new_nb = jnp.logaddexp(r_nb, phi_prev) + xs
        new_b = jnp.logaddexp(r_b, r_nb) + lp_blank_t[:, None, None]
        new_psi = jnp.logaddexp(psi, phi_prev + xs)
        return (new_nb, new_b, new_psi), (new_nb, new_b)

    init_nb = jnp.full((B, K, C), NEG_INF)
    init_b = jnp.full((B, K, C), NEG_INF)
    init_psi = jnp.full((B, K, C), NEG_INF)
    # shift phi by one step: inputs at scan index t use phi(t-1)
    phi_shifted = jnp.concatenate([phi_m1[None], phi_tm[:-1]], axis=0)
    (_, _, psi), (nb_seq, b_seq) = jax.lax.scan(
        step, (init_nb, init_b, init_psi), (lp_tok, lp_blank, phi_shifted))
    r_new = jnp.stack([nb_seq, b_seq], axis=-1)            # (T, B, K, C, 2)
    r_new = jnp.moveaxis(r_new, 0, 3)                      # (B, K, C, T, 2)
    # a blank 'extension' is not a valid label
    psi = jnp.where(cand == blank, NEG_INF, psi)
    return psi, r_new


def final_score(r_prev: jnp.ndarray, prefix_len: jnp.ndarray) -> jnp.ndarray:
    """CTC log-prob of each prefix as a COMPLETE sequence (used for <eos>):
    logsumexp of both states at the last frame. Empty prefix scores its
    all-blank path (r_b at T-1). (B, K)."""
    last = jnp.logaddexp(r_prev[..., -1, 0], r_prev[..., -1, 1])
    return last
