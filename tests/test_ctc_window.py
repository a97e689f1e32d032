"""Windowed phase-1 psi (decode/beam.py `ctc_window`, ops/ctc_prefix.py
`window`): an opt-in bandwidth knob that restricts the psi reduction to a
W-frame slice around the alignment frontier.

Properties pinned here:
- scorer-level: when the emission mass is concentrated (trained-model
  regime), windowed psi matches the full reduction for every competitive
  candidate; window >= T is a structural no-op (bit-identical);
- frontier placement: the max_nb_lp companion steers the window onto the
  emission band even when the trailing-blank phi plateau is flat;
- beam-level: search quality matches the exact decode on a peaky model
  (same contract as psi_quant — selection-only approximation), the knob
  composes with psi_quant, and early_stop 'auto' turns off with it.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops import ctc_prefix
from end_to_end_asr_pytorch_tpu.models.asr import ASR
from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder


def _banded_lp(B, T, V, band, seed=0, peak=6.0):
    """Log-probs that are ~blank-certain outside ``band`` = (t0, t1) and
    random-peaky inside — the trained-CTC shape the window targets."""
    rng = np.random.RandomState(seed)
    lp = rng.randn(B, T, V) * peak
    blanky = np.full((V,), -peak * 4.0)
    blanky[0] = 0.0
    t = np.arange(T)
    outside = (t < band[0]) | (t >= band[1])
    lp[:, outside, :] = blanky[None, None, :] + rng.randn(
        B, outside.sum(), V) * 0.1
    return jax.nn.log_softmax(jnp.asarray(lp, jnp.float32), -1)


def _score(lp, window=0, q8=False, plen_val=1, seed=3):
    B, T, V = lp.shape
    K = 4
    rng = np.random.RandomState(seed)
    lp = ctc_prefix.pad_ctc_log_probs(lp, jnp.full((B,), T - 2, jnp.int32))
    r, _ = ctc_prefix.init_state(lp, K)
    last = jnp.asarray(rng.randint(1, V, (B, K)), jnp.int32)
    plen = jnp.full((B, K), plen_val, jnp.int32)
    probs = jnp.exp(lp)
    kw = {}
    if q8:
        kw["probs_q8"] = ctc_prefix.quantize_probs_q8(probs)
    if window:
        kw["max_nb_lp"] = jnp.max(lp[:, :, 1:], axis=-1)
    psi, _ = ctc_prefix.score_candidates(
        lp, r, last, plen, with_state=False, probs=probs,
        window=window, **kw)
    return np.asarray(psi)


def test_window_ge_T_is_identity():
    lp = _banded_lp(2, 24, 32, (4, 12))
    full = _score(lp, window=0)
    same = _score(lp, window=24)   # window == T: structural no-op
    np.testing.assert_array_equal(full, same)
    big = _score(lp, window=48)
    np.testing.assert_array_equal(full, big)


@pytest.mark.parametrize("band", [(2, 10), (10, 18), (14, 22)])
def test_windowed_psi_matches_full_on_banded_mass(band):
    """Mass concentrated in an 8-frame band anywhere in T=24: a 16-frame
    window centred by the frontier signal must reproduce the full psi for
    every candidate within 4 nats of its hypothesis best (the selection-
    relevant set)."""
    lp = _banded_lp(2, 24, 32, band, seed=band[0])
    full = _score(lp, window=0)
    win = _score(lp, window=16)
    best = full.max(-1, keepdims=True)
    m = full >= best - 4.0
    err = np.abs(win - full)[m]
    assert err.max() < 1e-3, err.max()


def test_windowed_psi_composes_with_q8():
    lp = _banded_lp(2, 24, 32, (8, 16), seed=9)
    q8 = _score(lp, q8=True)
    q8w = _score(lp, window=16, q8=True)
    best = q8.max(-1, keepdims=True)
    m = q8 >= best - 2.0
    # window drops only below-quantization-resolution tail mass here
    assert np.abs(q8w - q8)[m].max() < 0.05


def test_window_under_jit_matches_eager():
    lp = _banded_lp(1, 20, 16, (5, 12), seed=4)

    def f(lp_):
        return _score(lp_, window=12)

    # _score builds everything from lp deterministically; jit the psi call
    lp2 = ctc_prefix.pad_ctc_log_probs(lp, jnp.array([18]))
    r, _ = ctc_prefix.init_state(lp2, 4)
    last = jnp.asarray(np.random.RandomState(3).randint(1, 16, (1, 4)),
                       jnp.int32)
    plen = jnp.ones((1, 4), jnp.int32)
    probs = jnp.exp(lp2)
    nb = jnp.max(lp2[:, :, 1:], axis=-1)

    def g(lp_, r_, p_, nb_):
        psi, _ = ctc_prefix.score_candidates(
            lp_, r_, last, plen, with_state=False, probs=p_,
            window=12, max_nb_lp=nb_)
        return psi

    np.testing.assert_allclose(
        np.asarray(jax.jit(g)(lp2, r, probs, nb)),
        np.asarray(g(lp2, r, probs, nb)), rtol=1e-6, atol=1e-6)


def _peaky_model(seed=5):
    V = 12
    cfg = {
        "ctc_weight": 0.5,
        "encoder": {"prenet": "", "module": "LSTM", "bidirection": False,
                    "dim": [8], "sample_rate": [1], "sample_style": "drop"},
        "attention": {"mode": "dot", "dim": 8, "num_head": 1,
                      "temperature": 1.0, "v_proj": True},
        "decoder": {"module": "LSTM", "dim": 8, "layer": 1},
    }
    model = ASR(6, V, cfg)
    params = model.init(jax.random.PRNGKey(seed))
    params = jax.tree_util.tree_map(lambda x: x * 1.5, params)
    return model, params


def test_beam_ctc_window_search_quality_matches_exact():
    """Same contract as psi_quant's beam test: selection-only
    approximation, so the top-1 REPORTED score (exact arithmetic) must
    closely match the exact decode's top-1. Token-level equality on a
    trained model is asserted by the on-chip WER A/B in BASELINE.md."""
    model, params = _peaky_model()
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(3, 12, 6), jnp.float32)
    flen = jnp.array([12, 9, 12])
    cfg = {"beam_size": 4, "min_len_ratio": 0.0, "max_len_ratio": 0.7,
           "ctc_weight": 0.5, "amp": True}
    out_exact = BeamDecoder(model, cfg).forward(params, feat, flen)
    out_w = BeamDecoder(model, dict(cfg, ctc_window=8)).forward(
        params, feat, flen)
    se, sw = np.asarray(out_exact.scores), np.asarray(out_w.scores)
    assert np.isfinite(se[:, 0]).all() and np.isfinite(sw[:, 0]).all()
    np.testing.assert_allclose(sw[:, 0], se[:, 0], atol=0.05)
    assert (np.asarray(out_w.lengths) >= 0).all()


def test_beam_ctc_window_identity_when_covering():
    """window >= encoder T: the decode must be bit-identical to exact
    (the scorer skips the slice entirely)."""
    model, params = _peaky_model(seed=11)
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.randn(2, 10, 6), jnp.float32)
    flen = jnp.array([10, 7])
    cfg = {"beam_size": 3, "min_len_ratio": 0.0, "max_len_ratio": 0.8,
           "ctc_weight": 0.4, "amp": False, "early_stop": False}
    a = BeamDecoder(model, cfg).forward(params, feat, flen)
    b = BeamDecoder(model, dict(cfg, ctc_window=64)).forward(
        params, feat, flen)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               rtol=0, atol=0)


def test_ctc_window_disables_auto_early_stop_and_validates():
    model, _ = _peaky_model()
    dec = BeamDecoder(model, {"beam_size": 2, "ctc_weight": 0.5,
                              "ctc_window": 16})
    assert dec.early_stop is False          # auto composes conservatively
    dec2 = BeamDecoder(model, {"beam_size": 2, "ctc_weight": 0.5,
                               "ctc_window": 16, "early_stop": True})
    assert dec2.early_stop is True          # explicit force still allowed
    with pytest.raises(ValueError):
        BeamDecoder(model, {"beam_size": 2, "ctc_weight": 0.5,
                            "ctc_window": -3})


def test_psi_kernel_neutralizes_ctc_window():
    """r5 self-review: the Pallas psi path streams full T and returns
    BEFORE the window slice, so ctc_window with psi_kernel would be a
    silent no-op that still cost the exact early exit — the decoder must
    neutralize the window and keep early_stop 'auto' = True."""
    model, _ = _peaky_model()
    dec = BeamDecoder(model, {"beam_size": 2, "ctc_weight": 0.5,
                              "ctc_window": 16, "psi_kernel": "interpret"})
    assert dec.ctc_window == 0
    assert dec.early_stop is True
