"""The beam decoder's amp-only fast paths, exercised on CPU.

CPU parity tests run with decode amp OFF (exact f32), so the table-lookup
input projections (ASR.precompute_decode_tables / RNNLM.emb_proj_table), the
one-hot state reorder, and the bf16 whole-forward cast would otherwise ship
untested off-TPU. Here:

  * the table paths are validated EXACTLY in f32 against the plain step
    (same math, different association -> fp32-rounding tolerance);
  * a full amp=True BeamDecoder run on CPU (bf16 via XLA) checks the whole
    fast-path program end-to-end against the amp=False decode.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.models.asr import ASR
from end_to_end_asr_pytorch_tpu.models.lm import RNNLM
from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder

V = 7
T_ENC = 8
B, K = 4, 3


def _model(ctc_weight=0.5):
    cfg = {
        "ctc_weight": ctc_weight,
        "encoder": {"prenet": "", "module": "LSTM", "bidirection": False,
                    "dim": [16], "sample_rate": [1], "sample_style": "drop"},
        "attention": {"mode": "loc", "dim": 8, "num_head": 1,
                      "temperature": 1.0, "v_proj": True,
                      "loc_kernel_size": 3, "loc_kernel_num": 2},
        "decoder": {"module": "LSTM", "dim": 16, "layer": 2},
    }
    model = ASR(6, V, cfg)
    params = model.init(jax.random.PRNGKey(3))
    return model, params


def _enc(model, params, seed=0):
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.randn(B, T_ENC, 6), jnp.float32)
    feat_len = jnp.asarray([T_ENC, T_ENC, 6, 5], jnp.int32)
    return model.encode(params, feat, feat_len)


def test_decode_step_beam_tables_match_plain():
    model, params = _model()
    enc, enc_len = _enc(model, params)
    cache = model.attention.precompute(params.attention, enc, enc_len)
    state = model.decoder.init_state(B * K, enc.dtype)
    align0 = model.attention.init_align(cache)
    align = jnp.broadcast_to(align0[:, None], (B, K) + align0.shape[1:])
    tok = jnp.asarray(np.random.RandomState(1).randint(0, V, (B * K,)),
                      jnp.int32)

    ref = model.decode_step_beam(params, cache, state, align, tok, K)
    tables = model.precompute_decode_tables(params)
    got = model.decode_step_beam(params, cache, state, align, tok, K,
                                 tables=tables)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)       # logits
    for a, b in zip(jax.tree_util.tree_leaves(got[1]),
                    jax.tree_util.tree_leaves(ref[1])):    # decoder state
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_lm_step_emb_proj_matches_plain():
    lm = RNNLM(V, {"module": "LSTM", "dim": 16, "emb_dim": 16, "layer": 2})
    p = lm.init(jax.random.PRNGKey(5))
    st = lm.init_state(B * K)
    tok = jnp.asarray(np.random.RandomState(2).randint(0, V, (B * K,)),
                      jnp.int32)
    ref_logits, ref_st = lm.step(p, st, tok)
    got_logits, got_st = lm.step(p, st, tok, emb_proj=lm.emb_proj_table(p))
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got_st),
                    jax.tree_util.tree_leaves(ref_st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_full_amp_decode_runs_and_tracks_f32():
    """amp=True end-to-end on CPU (bf16): same program the TPU runs."""
    model, params = _model()
    lm = RNNLM(V, {"module": "LSTM", "dim": 16, "emb_dim": 16, "layer": 1})
    lmp = lm.init(jax.random.PRNGKey(9))
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.randn(B, T_ENC, 6), jnp.float32)
    feat_len = jnp.asarray([T_ENC, T_ENC, 6, 5], jnp.int32)
    cfg = {"beam_size": K, "min_len_ratio": 0.0, "max_len_ratio": 1.0,
           "ctc_weight": 0.3, "lm_weight": 0.2}
    out = {}
    for amp in (False, True):
        dec = BeamDecoder(model, dict(cfg, amp=amp), lm=lm)
        out[amp] = jax.device_get(
            dec.forward(params, feat, feat_len, lm_params=lmp))
    assert out[True].tokens.shape == out[False].tokens.shape
    assert np.all(np.isfinite(out[True].scores))
    assert np.all((out[True].tokens >= 0) & (out[True].tokens < V))
    # bf16 noise may reorder near-ties on random weights; demand the top-1
    # sequences agree for most utterances and scores stay close
    same = sum(
        out[True].tokens[i, 0, :out[True].lengths[i, 0]].tolist()
        == out[False].tokens[i, 0, :out[False].lengths[i, 0]].tolist()
        for i in range(B))
    assert same >= B - 1, f"only {same}/{B} top-1 sequences match f32"
    np.testing.assert_allclose(out[True].scores[:, 0], out[False].scores[:, 0],
                               rtol=0.05, atol=0.05)


def test_fold_logp_matches_plain_amp():
    """Normalizer folding (auto only at V>=1024) forced ON at tiny V must
    track the materialized-log_softmax amp decode: same scores up to f32
    association."""
    model, params = _model()
    lm = RNNLM(V, {"module": "LSTM", "dim": 16, "emb_dim": 16, "layer": 1})
    lmp = lm.init(jax.random.PRNGKey(9))
    rng = np.random.RandomState(6)
    feat = jnp.asarray(rng.randn(B, T_ENC, 6), jnp.float32)
    feat_len = jnp.asarray([T_ENC, T_ENC, 6, 5], jnp.int32)
    cfg = {"beam_size": K, "min_len_ratio": 0.0, "max_len_ratio": 1.0,
           "ctc_weight": 0.3, "lm_weight": 0.2, "amp": True}
    out = {}
    for fold in (False, True):
        dec = BeamDecoder(model, dict(cfg, fold_logp=fold), lm=lm)
        out[fold] = jax.device_get(
            dec.forward(params, feat, feat_len, lm_params=lmp))
        # candidate-restricted CTC scoring must rank identically under the
        # fold (the per-row shift is constant, so top-C sets are unchanged)
        dec_c = BeamDecoder(model, dict(cfg, fold_logp=fold,
                                        ctc_candidates=4), lm=lm)
        out[("cand", fold)] = jax.device_get(
            dec_c.forward(params, feat, feat_len, lm_params=lmp))
    ca, cb = out[("cand", False)], out[("cand", True)]
    same_c = sum(
        ca.tokens[i, 0, :ca.lengths[i, 0]].tolist()
        == cb.tokens[i, 0, :cb.lengths[i, 0]].tolist() for i in range(B))
    assert same_c >= B - 1, f"candidate mode: only {same_c}/{B} match"
    np.testing.assert_allclose(cb.scores[:, 0], ca.scores[:, 0],
                               rtol=1e-4, atol=1e-4)
    a, b = out[False], out[True]
    same = sum(
        a.tokens[i, 0, :a.lengths[i, 0]].tolist()
        == b.tokens[i, 0, :b.lengths[i, 0]].tolist() for i in range(B))
    assert same >= B - 1, f"only {same}/{B} top-1 sequences match"
    np.testing.assert_allclose(b.scores[:, 0], a.scores[:, 0],
                               rtol=1e-4, atol=1e-4)
