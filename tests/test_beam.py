"""Batched beam search vs exhaustive enumeration on a tiny model
(SURVEY.md section 4: parity via brute-force cross-checks on tiny vocabs)."""
import itertools
import math
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.models.asr import ASR
from end_to_end_asr_pytorch_tpu.models.lm import RNNLM
from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
from end_to_end_asr_pytorch_tpu.utils.text import EOS_IDX

V = 5  # pad, eos, unk, a, b
T_ENC = 4


def _model(ctc_weight=0.5):
    cfg = {
        "ctc_weight": ctc_weight,
        "encoder": {"prenet": "", "module": "LSTM", "bidirection": False,
                    "dim": [8], "sample_rate": [1], "sample_style": "drop"},
        "attention": {"mode": "dot", "dim": 8, "num_head": 1,
                      "temperature": 1.0, "v_proj": True},
        "decoder": {"module": "LSTM", "dim": 8, "layer": 1},
    }
    model = ASR(6, V, cfg)
    params = model.init(jax.random.PRNGKey(7))
    return model, params


def _feat(B=1, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, T_ENC, 6), jnp.float32)


def _ctc_exact_probs(ctc_lp):
    """Brute-force P(output == y) for every y, from (T, V) log-probs."""
    probs = np.exp(np.asarray(ctc_lp))
    exact = {}
    for path in itertools.product(range(V), repeat=T_ENC):
        p = float(np.prod([probs[t, s] for t, s in enumerate(path)]))
        out, prev = [], None
        for s in path:
            if s != prev and s != 0:
                out.append(s)
            prev = s
        y = tuple(out)
        exact[y] = exact.get(y, 0.0) + p
    return exact


def _att_logps(model, params, enc, enc_len, seq):
    """Sequential attention log-probs for sequence `seq` + eos."""
    cache, state, align = model.init_decode(params, enc, enc_len)
    prev = jnp.full((1,), EOS_IDX, jnp.int32)
    lps = []
    for tok in list(seq) + [EOS_IDX]:
        logits, state, align, _ = model.decode_step(params, cache, state,
                                                    align, prev)
        lp = jax.nn.log_softmax(logits, -1)
        lps.append(float(lp[0, tok]))
        prev = jnp.full((1,), tok, jnp.int32)
    return lps


def _lm_logps(lm, lm_params, seq):
    state = lm.init_state(1)
    prev = jnp.full((1,), EOS_IDX, jnp.int32)
    lps = []
    for tok in list(seq) + [EOS_IDX]:
        logits, state = lm.step(lm_params, state, prev)
        lp = jax.nn.log_softmax(logits, -1)
        lps.append(float(lp[0, tok]))
        prev = jnp.full((1,), tok, jnp.int32)
    return lps


def _enumerate_best(model, params, feat, feat_len, cw, lm=None, lm_params=None,
                    lw=0.0, max_len=2):
    aw = 1.0 - cw
    enc, enc_len = model.encode(params, feat, feat_len)
    if cw > 0:
        ctc_lp = model.ctc_output(params, enc)[0]
        exact = _ctc_exact_probs(ctc_lp)
    best = (None, -1e30)
    for n in range(0, max_len + 1):
        for seq in itertools.product([2, 3, 4], repeat=n):
            att = sum(_att_logps(model, params, enc, enc_len, seq))
            tot = aw * att
            if cw > 0:
                tot += cw * math.log(exact.get(tuple(seq), 1e-300))
            if lw > 0:
                tot += lw * sum(_lm_logps(lm, lm_params, seq))
            norm = tot / (n + 1)
            if norm > best[1]:
                best = (seq, norm)
    return best


@pytest.mark.parametrize("cw", [0.0, 0.5, 1.0])
def test_beam_matches_enumeration(cw):
    # model needs both heads for decode-time reweighting
    model, params = _model(ctc_weight=0.5)
    enc_feat = _feat(seed=3)
    feat_len = jnp.array([T_ENC])
    dec = BeamDecoder(model, {"beam_size": 9, "min_len_ratio": 0.0,
                              "max_len_ratio": 0.5, "ctc_weight": cw})
    out = dec.forward(params, enc_feat, feat_len)
    got_seq = tuple(out.tokens[0, 0, :out.lengths[0, 0]].tolist())
    got_score = float(out.scores[0, 0])

    ref_seq, ref_score = _enumerate_best(model, params, enc_feat, feat_len,
                                         cw, max_len=2)
    assert got_seq == tuple(ref_seq), f"cw={cw}: {got_seq} vs {ref_seq}"
    np.testing.assert_allclose(got_score, ref_score, rtol=1e-3)


def test_beam_with_lm_fusion_matches_enumeration():
    model, params = _model()
    lm = RNNLM(V, {"module": "LSTM", "dim": 8, "emb_dim": 8, "layer": 1})
    lm_params = lm.init(jax.random.PRNGKey(11))
    enc_feat = _feat(seed=5)
    feat_len = jnp.array([T_ENC])
    dec = BeamDecoder(model, {"beam_size": 9, "min_len_ratio": 0.0,
                              "max_len_ratio": 0.5, "ctc_weight": 0.3,
                              "lm_weight": 0.4}, lm=lm)
    out = dec.forward(params, enc_feat, feat_len, lm_params=lm_params)
    got_seq = tuple(out.tokens[0, 0, :out.lengths[0, 0]].tolist())
    got_score = float(out.scores[0, 0])
    ref_seq, ref_score = _enumerate_best(model, params, enc_feat, feat_len,
                                         0.3, lm=lm, lm_params=lm_params,
                                         lw=0.4, max_len=2)
    assert got_seq == tuple(ref_seq)
    np.testing.assert_allclose(got_score, ref_score, rtol=1e-3)


def test_beam_batch_matches_single():
    """Batched decode must equal per-utterance decode (padding invariance)."""
    model, params = _model()
    rng = np.random.RandomState(9)
    f1 = rng.randn(1, T_ENC, 6).astype(np.float32)
    f2 = rng.randn(1, T_ENC, 6).astype(np.float32)
    f2[:, 2:] = 0.0  # utterance 2 only 2 frames long
    dec = BeamDecoder(model, {"beam_size": 4, "min_len_ratio": 0.0,
                              "max_len_ratio": 0.5, "ctc_weight": 0.5})
    batch_feat = np.concatenate([f1, f2], axis=0)
    out_b = dec.forward(params, jnp.asarray(batch_feat), jnp.array([4, 2]))
    out_1 = dec.forward(params, jnp.asarray(f1), jnp.array([4]))
    out_2 = dec.forward(params, jnp.asarray(f2), jnp.array([2]))
    for k in range(4):
        assert out_b.tokens[0, k].tolist() == out_1.tokens[0, k].tolist()
        assert out_b.tokens[1, k].tolist() == out_2.tokens[0, k].tolist()
    np.testing.assert_allclose(np.asarray(out_b.scores[0]),
                               np.asarray(out_1.scores[0]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_b.scores[1]),
                               np.asarray(out_2.scores[0]), rtol=1e-4)


def test_beam_jits_and_candidate_pruning():
    model, params = _model()
    dec = BeamDecoder(model, {"beam_size": 3, "min_len_ratio": 0.0,
                              "max_len_ratio": 0.5, "ctc_weight": 0.5,
                              "ctc_candidates": 2})
    fwd = jax.jit(dec.forward)
    out = fwd(params, _feat(seed=1), jnp.array([T_ENC]))
    assert out.tokens.shape[2] == 2
    assert np.isfinite(np.asarray(out.scores)).any()


def test_candidate_mode_covering_all_tokens_matches_full_vocab():
    """With ctc_candidates >= the number of expandable tokens (V minus
    eos/pad, which the continuation mask always excludes), candidate mode
    prunes nothing — tokens, lengths and scores must equal the full-vocab
    path exactly. This pins the candidate-gather psi path (probs_vt row
    gathers) against the full (B,K,V) einsum path through the whole beam
    program, LM fusion included."""
    model, params = _model()
    lm = RNNLM(V, {"module": "LSTM", "dim": 8, "emb_dim": 8, "layer": 1})
    lm_params = lm.init(jax.random.PRNGKey(3))
    feat, flen = _feat(B=2, seed=5), jnp.array([T_ENC, 3])
    base_cfg = {"beam_size": 3, "min_len_ratio": 0.0, "max_len_ratio": 0.75,
                "ctc_weight": 0.4, "lm_weight": 0.3}
    full = BeamDecoder(model, base_cfg, lm=lm).forward(
        params, feat, flen, lm_params=lm_params)
    cand = BeamDecoder(model, dict(base_cfg, ctc_candidates=V - 2),
                       lm=lm).forward(params, feat, flen,
                                      lm_params=lm_params)
    np.testing.assert_array_equal(np.asarray(full.tokens),
                                  np.asarray(cand.tokens))
    np.testing.assert_array_equal(np.asarray(full.lengths),
                                  np.asarray(cand.lengths))
    np.testing.assert_allclose(np.asarray(full.scores),
                               np.asarray(cand.scores), rtol=1e-5)


def test_unfilled_finished_slots_stay_neg_inf():
    """Regression: masked (eos_ok=False / dead-slot) finalization scores
    were NEG_INF *before* length normalization, so NEG_INF/(t+1) ranked
    above the finished-set NEG_INF placeholders and garbage rows filled
    the n-best whenever fewer than K real finalizations existed. With
    V=5 (3 continuation tokens) and max_len=2 only 1+3+9=13 real
    finalizations can ever occur; the remaining beam_size-13 slots must
    keep the NEG_INF sentinel and zero-length token rows."""
    model, params = _model(ctc_weight=0.5)
    dec = BeamDecoder(model, {"beam_size": 16, "min_len_ratio": 0.0,
                              "max_len_ratio": 0.5, "ctc_weight": 0.4})
    out = dec.forward(params, _feat(B=2, seed=3),
                      jnp.array([T_ENC, T_ENC]))
    scores = np.asarray(out.scores)
    lengths = np.asarray(out.lengths)
    real = scores > -1e29
    assert real.sum(axis=1).max() <= 13
    assert real[:, 0].all(), "top-1 must be a real hypothesis"
    # unfilled slots: sentinel score, zero-length backtrace
    assert np.all(lengths[~real] == 0)
    assert np.all(np.asarray(out.tokens)[~real] == 0)


def test_approx_topk_wiring_matches_exact_on_cpu():
    """approx_topk is an opt-in large-V pruning knob; the CPU lowering of
    lax.approx_max_k is exact, so on this backend the full BeamOutput must
    be identical to the exact decoder — pinning the index/value wiring
    (k_idx/c_idx/psi gathers) deterministically. The recall<1 behavior is
    a TPU-only property measured on-chip."""
    model, params = _model(ctc_weight=0.5)
    feat = _feat(B=2, seed=9)
    flen = jnp.array([T_ENC, T_ENC - 1])
    cfg = {"beam_size": 4, "min_len_ratio": 0.0, "max_len_ratio": 1.0,
           "ctc_weight": 0.4, "lm_weight": 0.0}
    a = BeamDecoder(model, cfg).forward(params, feat, flen)
    b = BeamDecoder(model, dict(cfg, approx_topk=0.95)).forward(
        params, feat, flen)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.lengths),
                                  np.asarray(b.lengths))
    np.testing.assert_array_equal(np.asarray(a.scores), np.asarray(b.scores))


def test_combined_q8_approx_topk_matches_q8_on_cpu():
    """The combined production large-V config (psi_quant=int8 +
    approx_topk): on CPU approx_max_k is exact, so the combined decode
    must be bit-identical to the q8-only decode — pinning that the two
    knobs compose without interfering (the atk path must consume the
    SAME quantized psi values it would without pruning)."""
    model, params = _model(ctc_weight=0.5)
    feat = _feat(B=2, seed=11)
    flen = jnp.array([T_ENC, T_ENC - 1])
    cfg = {"beam_size": 4, "min_len_ratio": 0.0, "max_len_ratio": 1.0,
           "ctc_weight": 0.4, "lm_weight": 0.0, "psi_quant": "int8"}
    a = BeamDecoder(model, cfg).forward(params, feat, flen)
    b = BeamDecoder(model, dict(cfg, approx_topk=0.95)).forward(
        params, feat, flen)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.lengths),
                                  np.asarray(b.lengths))
    np.testing.assert_array_equal(np.asarray(a.scores), np.asarray(b.scores))


def test_approx_topk_rejects_bad_value():
    model, params = _model()
    with pytest.raises(ValueError):
        BeamDecoder(model, {"beam_size": 2, "approx_topk": 1.5})


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_beam_structural_invariants_fuzz(seed):
    """Random config fuzz over the knob space: whatever the combination
    (beam size, length ratios, CTC/LM weights, amp, early_stop,
    psi_quant, approx_topk — the latter two exact on CPU), BeamOutput
    must satisfy the structural contract: scores sorted descending with
    real entries first, sentinel slots empty, token rows zero-padded past
    their length, lengths within [0, max_len]."""
    rng = np.random.RandomState(1000 + seed)
    cw = float(rng.choice([0.0, 0.3, 0.7]))
    lw = float(rng.choice([0.0, 0.4]))
    model, params = _model(ctc_weight=0.5 if cw > 0 else 0.0)
    lm = lm_params = None
    if lw > 0:
        lm = RNNLM(V, {"module": "LSTM", "dim": 8, "emb_dim": 8, "layer": 1})
        lm_params = lm.init(jax.random.PRNGKey(seed))
    cfg = {
        "beam_size": int(rng.choice([2, 5, 9])),
        "min_len_ratio": float(rng.choice([0.0, 0.3])),
        "max_len_ratio": float(rng.choice([0.4, 0.9])),
        "ctc_weight": cw, "lm_weight": lw,
        "amp": bool(rng.randint(2)),
        "early_stop": bool(rng.randint(2)),
    }
    if rng.randint(2):
        cfg["psi_quant"] = "int8"
    if rng.randint(2):
        cfg["approx_topk"] = 0.95
    if rng.randint(2):
        cfg["ctc_window"] = int(rng.choice([4, 8, 64]))
    B = 3
    feat = jnp.asarray(rng.randn(B, T_ENC, 6), jnp.float32)
    flen = jnp.asarray(rng.randint(2, T_ENC + 1, (B,)), jnp.int32)
    out = BeamDecoder(model, cfg, lm=lm).forward(params, feat, flen,
                                                 lm_params=lm_params)
    scores = np.asarray(out.scores)
    lengths = np.asarray(out.lengths)
    tokens = np.asarray(out.tokens)
    K = cfg["beam_size"]
    assert scores.shape == (B, K) and tokens.shape[0:2] == (B, K)
    # sorted descending
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
    real = scores > -1e29
    # at least one real hypothesis per utterance; real entries lead
    assert real[:, 0].all()
    assert np.all(real[:, 1:] <= real[:, :-1])  # no real after sentinel
    max_len = np.maximum(np.ceil(cfg["max_len_ratio"]
                                 * np.asarray(flen)), 1).astype(int)
    assert np.all(lengths <= max_len[:, None])
    assert np.all(lengths[~real] == 0)
    # zero padding past each row's length
    for b in range(B):
        for k in range(K):
            assert np.all(tokens[b, k, lengths[b, k]:] == 0)
            assert np.all(tokens[b, k, :lengths[b, k]] != 0) or lengths[b, k] == 0
