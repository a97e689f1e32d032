"""CTC prefix scorer vs brute-force path enumeration on a tiny vocab
(SURVEY.md section 4: 'CTC prefix score vs brute-force enumeration')."""
import itertools
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops.ctc_prefix import (
    pad_ctc_log_probs, init_state, score_candidates, final_score)

BLANK = 0


def _collapse(path):
    out = []
    prev = None
    for s in path:
        if s != prev and s != BLANK:
            out.append(s)
        prev = s
    return tuple(out)


def _brute_force(probs):
    """probs (T, V) -> dict: prefix_prob[g] = P(output starts with g),
    exact_prob[g] = P(output == g)."""
    T, V = probs.shape
    prefix, exact = {}, {}
    for path in itertools.product(range(V), repeat=T):
        p = float(np.prod([probs[t, s] for t, s in enumerate(path)]))
        y = _collapse(path)
        exact[y] = exact.get(y, 0.0) + p
        for l in range(len(y) + 1):
            g = y[:l]
            prefix[g] = prefix.get(g, 0.0) + p
    return prefix, exact


def _padded_lp(probs):
    """(T, V) prob matrix -> padded (1, T, V) log-probs for the scorer."""
    T, V = probs.shape
    lp = jnp.log(jnp.asarray(probs))[None]           # (1, T, V)
    return pad_ctc_log_probs(lp, jnp.array([T]))


def test_prefix_scores_match_brute_force():
    rng = np.random.RandomState(0)
    T, V = 5, 3
    probs = rng.dirichlet(np.ones(V), size=T)        # (T, V) rows sum to 1
    pref_bf, exact_bf = _brute_force(probs)
    lp = _padded_lp(probs)

    # empty prefix, first extensions
    r, psi0 = init_state(lp, beam=1)
    last = jnp.array([[BLANK]])                      # no last token
    plen = jnp.array([[0]])
    psi, r_new = score_candidates(lp, r, last, plen)
    for c in range(1, V):
        np.testing.assert_allclose(float(psi[0, 0, c]),
                                   np.log(pref_bf.get((c,), 1e-300)),
                                   rtol=1e-4)
    # empty-prefix complete-sequence score = P(output == ())
    np.testing.assert_allclose(float(final_score(r, plen)[0, 0]),
                               np.log(exact_bf.get((), 1e-300)), rtol=1e-4)

    # extend prefix (1,), then (1,2) and the repeat (1,1)
    r1 = r_new[:, :, 1]                              # state of prefix (1,)
    psi2, r_new2 = score_candidates(lp, r1, jnp.array([[1]]),
                                    jnp.array([[1]]))
    for c in range(1, V):
        np.testing.assert_allclose(
            float(psi2[0, 0, c]), np.log(pref_bf.get((1, c), 1e-300)),
            rtol=1e-4, err_msg=f"prefix (1,{c})")
    np.testing.assert_allclose(float(final_score(r1, None)[0, 0]),
                               np.log(exact_bf.get((1,), 1e-300)), rtol=1e-4)

    # depth 3 with a repeat: (1, 1, c)
    r11 = r_new2[:, :, 1]
    psi3, _ = score_candidates(lp, r11, jnp.array([[1]]), jnp.array([[2]]))
    for c in range(1, V):
        np.testing.assert_allclose(
            float(psi3[0, 0, c]), np.log(pref_bf.get((1, 1, c), 1e-300)),
            rtol=1e-4, err_msg=f"prefix (1,1,{c})")


def test_padding_invariance():
    """Scores must be identical whether computed at true length or padded."""
    rng = np.random.RandomState(1)
    T, V, PAD = 4, 3, 9
    probs = rng.dirichlet(np.ones(V), size=T)
    lp_short = pad_ctc_log_probs(jnp.log(jnp.asarray(probs))[None],
                                 jnp.array([T]))
    padded = np.concatenate([probs, rng.dirichlet(np.ones(V), size=PAD - T)])
    lp_pad = pad_ctc_log_probs(jnp.log(jnp.asarray(padded))[None],
                               jnp.array([T]))

    r_s, _ = init_state(lp_short, 1)
    r_p, _ = init_state(lp_pad, 1)
    last, plen = jnp.array([[BLANK]]), jnp.array([[0]])
    psi_s, _ = score_candidates(lp_short, r_s, last, plen)
    psi_p, _ = score_candidates(lp_pad, r_p, last, plen)
    np.testing.assert_allclose(np.asarray(psi_s)[..., 1:],
                               np.asarray(psi_p)[..., 1:], rtol=1e-4)
    np.testing.assert_allclose(float(final_score(r_s, plen)[0, 0]),
                               float(final_score(r_p, plen)[0, 0]), rtol=1e-4)


def test_batched_beam_shapes():
    rng = np.random.RandomState(2)
    B, K, T, V = 2, 3, 6, 4
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(B, T, V)), -1)
    lp = pad_ctc_log_probs(lp, jnp.array([6, 4]))
    r, psi0 = init_state(lp, K)
    assert r.shape == (B, K, T, 2)
    psi, r_new = score_candidates(lp, r, jnp.zeros((B, K), jnp.int32),
                                  jnp.zeros((B, K), jnp.int32))
    assert psi.shape == (B, K, V)
    assert r_new.shape == (B, K, V, T, 2)
    assert np.all(np.asarray(psi)[:, :, 0] < -1e29)  # blank ext invalid


def test_candidate_gather_psi_matches_full_vocab():
    """The candidate-restricted row-gather path (probs_vt + cand_ids) must
    reproduce the full-vocab psi at the candidate positions — including
    same-token extensions and blank masking."""
    rng = np.random.RandomState(11)
    B, K, T, V, C = 2, 3, 9, 12, 4
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(B, T, V)), -1)
    lp = pad_ctc_log_probs(lp, jnp.array([9, 6]))
    r, _ = init_state(lp, K)
    last = jnp.asarray(rng.randint(1, V, (B, K)), jnp.int32)
    psi0, r_all = score_candidates(lp, r, jnp.zeros((B, K), jnp.int32),
                                   jnp.zeros((B, K), jnp.int32))
    r1 = jnp.take_along_axis(
        r_all, last[:, :, None, None, None], axis=2)[:, :, 0]
    plen = jnp.ones((B, K), jnp.int32)

    psi_full, _ = score_candidates(lp, r1, last, plen, with_state=False)
    # candidates: include blank (0), each hyp's own last token, and others
    cand = jnp.stack([jnp.zeros((B, K), jnp.int32), last,
                      (last + 1) % V, (last + 2) % V], axis=-1)  # (B,K,C)
    probs_vt = jnp.exp(jnp.moveaxis(lp, 1, 2))
    psi_cand, none = score_candidates(
        None, r1, last, plen, cand_ids=cand, with_state=False,
        probs_vt=probs_vt)
    assert none is None and psi_cand.shape == (B, K, C)
    want = np.take_along_axis(np.asarray(psi_full), np.asarray(cand), axis=2)
    np.testing.assert_allclose(np.asarray(psi_cand), want,
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(psi_cand)[:, :, 0] < -1e29)  # blank masked


def test_candidate_state_paths_match_full_vocab_and_companions():
    """with_state candidate scoring must be identical whether xs comes from
    the ctc_lp lane-gather path, the lp_vt row-gather fallback (precomputed
    companions with ctc_lp=None), or the full-vocab scorer restricted
    afterwards — the three with_state xs sources in score_candidates."""
    rng = np.random.RandomState(13)
    B, K, T, V = 2, 2, 7, 9
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(B, T, V)), -1)
    lp = pad_ctc_log_probs(lp, jnp.array([7, 5]))
    r, _ = init_state(lp, K)
    last = jnp.asarray(rng.randint(1, V, (B, K)), jnp.int32)
    plen = jnp.ones((B, K), jnp.int32)
    cand = jnp.asarray(rng.randint(1, V, (B, K, 9)), jnp.int32)

    # reference = full-vocab with_state scorer, then gather the candidates
    psi_all, r_all = score_candidates(lp, r, last, plen)
    psi_g, r_g = score_candidates(lp, r, last, plen, cand_ids=cand)
    np.testing.assert_allclose(
        np.asarray(psi_g),
        np.take_along_axis(np.asarray(psi_all), np.asarray(cand), axis=2),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_g),
        np.take_along_axis(np.asarray(r_all),
                           np.asarray(cand)[..., None, None], axis=2),
        rtol=1e-5, atol=1e-6)

    # companions + ctc_lp=None must be bit-compatible with the direct call
    from end_to_end_asr_pytorch_tpu.ops.ctc_prefix import CLIP
    lp_vt = jnp.moveaxis(lp, 1, 2)
    blank_lp = jnp.maximum(lp[:, :, 0], CLIP)
    psi_c, r_c = score_candidates(None, r, last, plen, cand_ids=cand,
                                  lp_vt=lp_vt, blank_lp=blank_lp)
    np.testing.assert_array_equal(np.asarray(psi_g), np.asarray(psi_c))
    np.testing.assert_array_equal(np.asarray(r_g), np.asarray(r_c))


def test_psi_only_matmul_path_matches_state_path():
    rng = np.random.RandomState(7)
    B, K, T, V = 2, 3, 9, 5
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(B, T, V)), -1)
    lp = pad_ctc_log_probs(lp, jnp.array([9, 6]))
    r, _ = init_state(lp, K)
    last = jnp.asarray(rng.randint(1, V, (B, K)), jnp.int32)
    # grow one step so r/last are a real mid-decode state
    psi0, r_all = score_candidates(lp, r, jnp.zeros((B, K), jnp.int32),
                                   jnp.zeros((B, K), jnp.int32))
    r1 = jnp.take_along_axis(
        r_all, last[:, :, None, None, None], axis=2)[:, :, 0]
    plen = jnp.ones((B, K), jnp.int32)

    psi_ref, _ = score_candidates(lp, r1, last, plen)
    psi_fast, none = score_candidates(lp, r1, last, plen, with_state=False)
    assert none is None
    np.testing.assert_allclose(np.asarray(psi_fast)[..., 1:],
                               np.asarray(psi_ref)[..., 1:],
                               rtol=1e-4, atol=1e-4)
    # empty-prefix case too
    psi_e_ref, _ = score_candidates(lp, r, jnp.zeros((B, K), jnp.int32),
                                    jnp.zeros((B, K), jnp.int32))
    psi_e_fast, _ = score_candidates(lp, r, jnp.zeros((B, K), jnp.int32),
                                     jnp.zeros((B, K), jnp.int32),
                                     with_state=False)
    np.testing.assert_allclose(np.asarray(psi_e_fast)[..., 1:],
                               np.asarray(psi_e_ref)[..., 1:],
                               rtol=1e-4, atol=1e-4)
