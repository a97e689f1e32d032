"""Exact early-exit beam decode: outputs must be bit-identical to the
full-length loop, and the exit must actually trigger when transcripts end
early (decode/beam.py early_stop; the admissible bound is tot/(max_len+1)
for tot < 0 since per-step score increments are <= 0 and the largest
reachable normalization divisor is max_len+1)."""
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

V = 6
T_ENC = 12


def _model(seed=7, ctc_weight=0.5):
    cfg = {
        "ctc_weight": ctc_weight,
        "encoder": {"prenet": "", "module": "LSTM", "bidirection": False,
                    "dim": [8], "sample_rate": [1], "sample_style": "drop"},
        "attention": {"mode": "dot", "dim": 8, "num_head": 1,
                      "temperature": 1.0, "v_proj": True},
        "decoder": {"module": "LSTM", "dim": 8, "layer": 1},
    }
    model = ASR(6, V, cfg)
    return model, model.init(jax.random.PRNGKey(seed))


def _feat(B, seed):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, T_ENC, 6), jnp.float32)


def _assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.lengths),
                                  np.asarray(b.lengths))
    np.testing.assert_array_equal(np.asarray(a.scores), np.asarray(b.scores))


@pytest.mark.parametrize("cw,lw", [(0.0, 0.0), (0.5, 0.0), (0.3, 0.4)])
def test_early_stop_outputs_identical(cw, lw):
    """early_stop on/off must produce bit-identical BeamOutput on random
    models (batch of unequal lengths, CTC and LM fusion variants)."""
    model, params = _model()
    lm = lm_params = None
    if lw > 0:
        lm = RNNLM(V, {"module": "LSTM", "dim": 8, "emb_dim": 8, "layer": 1})
        lm_params = lm.init(jax.random.PRNGKey(3))
    feat = _feat(B=3, seed=11)
    flen = jnp.array([T_ENC, T_ENC - 3, 5])
    cfg = {"beam_size": 4, "min_len_ratio": 0.0, "max_len_ratio": 0.8,
           "ctc_weight": cw, "lm_weight": lw}
    out_full = BeamDecoder(model, dict(cfg, early_stop=False),
                           lm=lm).forward(params, feat, flen,
                                          lm_params=lm_params)
    out_es = BeamDecoder(model, dict(cfg, early_stop=True),
                         lm=lm).forward(params, feat, flen,
                                        lm_params=lm_params)
    _assert_same(out_full, out_es)


def test_early_stop_triggers_on_biased_model():
    """With the output bias pushed hard toward eos, every hypothesis
    finalizes almost immediately and continuations pay a huge per-step
    penalty — the loop must exit long before max_len, with outputs still
    identical to the full-length run."""
    model, params = _model(ctc_weight=0.0)  # att-only: bias fully controls
    bias = np.zeros((V,), np.float32)
    bias[EOS_IDX] = 25.0          # eos ~certain; continuations ~ -25/step
    params = params._replace(char_b=jnp.asarray(bias))
    feat = _feat(B=2, seed=4)
    flen = jnp.array([T_ENC, T_ENC])
    cfg = {"beam_size": 3, "min_len_ratio": 0.0, "max_len_ratio": 1.0,
           "ctc_weight": 0.0}
    dec_es = BeamDecoder(model, dict(cfg, early_stop=True))
    out_es = dec_es.forward(params, feat, flen)   # eager: records steps
    S = T_ENC + 1
    assert dec_es._last_steps is not None
    assert dec_es._last_steps < S, (
        f"early exit never triggered: ran {dec_es._last_steps} of {S}")
    out_full = BeamDecoder(model, dict(cfg, early_stop=False)).forward(
        params, feat, flen)
    _assert_same(out_full, out_es)


def test_early_stop_safe_when_beam_never_fills():
    """A max_len too small to ever finalize K hypotheses must not exit
    early into garbage: the finished set (and NEG_INF backstops) must
    match the full run exactly."""
    model, params = _model()
    feat = _feat(B=2, seed=8)
    flen = jnp.array([T_ENC, 2])
    # min_len == max_len == 1 label step: only single finalization chance
    cfg = {"beam_size": 5, "min_len_ratio": 0.0, "max_len_ratio": 0.1,
           "ctc_weight": 0.5}
    out_full = BeamDecoder(model, dict(cfg, early_stop=False)).forward(
        params, feat, flen)
    out_es = BeamDecoder(model, dict(cfg, early_stop=True)).forward(
        params, feat, flen)
    _assert_same(out_full, out_es)


@pytest.mark.parametrize("t_enc", [7, 8, 9])
def test_early_stop_final_step_finalization(t_enc):
    """Regression: with continuations ~free and eos expensive, the best
    hypothesis only finalizes at the LAST chance (step max_len, normalized
    by max_len+1). The early-exit cond must keep the loop alive through
    that finalize-only step — including when max_len is a multiple of the
    unroll factor 4 (t_enc=8), where the old `t < max_len` liveness gate
    exited one block early and dropped the longest hypothesis."""
    model, params = _model(ctc_weight=0.0)
    bias = np.zeros((V,), np.float32)
    bias[EOS_IDX] = -20.0         # continuations ~free, eos ~ -20
    params = params._replace(char_b=jnp.asarray(bias))
    rng = np.random.RandomState(t_enc)
    feat = jnp.asarray(rng.randn(2, t_enc, 6), jnp.float32)
    flen = jnp.array([t_enc, t_enc])
    cfg = {"beam_size": 4, "min_len_ratio": 0.0, "max_len_ratio": 1.0,
           "ctc_weight": 0.0}
    out_full = BeamDecoder(model, dict(cfg, early_stop=False)).forward(
        params, feat, flen)
    out_es = BeamDecoder(model, dict(cfg, early_stop=True)).forward(
        params, feat, flen)
    _assert_same(out_full, out_es)
    # the winning hypothesis really is full-length (the scenario bites)
    assert int(np.asarray(out_full.lengths)[0, 0]) == t_enc


def test_early_stop_bound_divisor():
    """Regression for the admissible bound's divisor: a live hypothesis
    with strongly negative tot can still finalize at step max_len with
    divisor max_len+1, so the bound must use max_len+1 — tot/max_len
    underestimates the reachable score by |tot|/(max_len*(max_len+1)),
    which exceeds the default 0.05 slack once |tot| is large. A model
    whose per-step scores are uniformly ~log(1/V) (flat logits at V=6:
    ~-1.8/step) makes every live tot strongly negative while eos remains
    competitive only at the very end."""
    model, params = _model(ctc_weight=0.0)
    # scale weights way down -> logits ~0 -> flat log_softmax ~ -log V;
    # eos slightly penalized so finalization prefers the last steps
    params = jax.tree_util.tree_map(lambda x: x * 0.01, params)
    bias = np.zeros((V,), np.float32)
    bias[EOS_IDX] = -1.0
    params = params._replace(char_b=jnp.asarray(bias))
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(2, T_ENC, 6), jnp.float32)
    flen = jnp.array([T_ENC, T_ENC])
    cfg = {"beam_size": 4, "min_len_ratio": 0.0, "max_len_ratio": 1.0,
           "ctc_weight": 0.0}
    out_full = BeamDecoder(model, dict(cfg, early_stop=False)).forward(
        params, feat, flen)
    out_es = BeamDecoder(model, dict(cfg, early_stop=True)).forward(
        params, feat, flen)
    _assert_same(out_full, out_es)


def test_early_stop_jits():
    model, params = _model()
    dec = BeamDecoder(model, {"beam_size": 3, "min_len_ratio": 0.0,
                              "max_len_ratio": 0.5, "ctc_weight": 0.5,
                              "early_stop": True})
    out = jax.jit(dec.forward)(params, _feat(B=2, seed=1),
                               jnp.array([T_ENC, T_ENC]))
    assert np.isfinite(np.asarray(out.scores)).any()
