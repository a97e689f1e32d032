"""int8-quantized phase-1 psi matmul (decode/beam.py `psi_quant`,
ops/ctc_prefix.py `probs_q8`): a selection-only accuracy/bandwidth knob.

Properties pinned here:
- scorer-level: psi from the s8xs8 matmul tracks the exact psi tightly
  wherever the candidate is competitive (error ~ (0.5/127)/avg emission
  prob along the prefix paths), and never reports a *better* score than
  ~the quantization bound allows;
- beam-level: on a peaky (trained-like) model the quantized decode's
  output is identical to the exact amp decode — quantization error never
  accumulates into carried scores (base is recovered as top_tot - cw*psi
  with the same quantized psi), it can only flip near-tied selections.
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


# the SAME helper the beam decoder uses to build the operand — pins the
# producer/consumer quantization convention together
_quantize = ctc_prefix.quantize_probs_q8


@pytest.mark.parametrize("peak", [3.0, 6.0])
def test_psi_int8_tracks_exact(peak):
    B, K, T, V = 2, 4, 24, 64
    rng = np.random.RandomState(int(peak))
    ctc_lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, T, V) * peak, jnp.float32), -1)
    enc_len = jnp.array([T, T - 5])
    ctc_lp = ctc_prefix.pad_ctc_log_probs(ctc_lp, enc_len)
    r, _ = ctc_prefix.init_state(ctc_lp, K)
    last = jnp.asarray(rng.randint(1, V, size=(B, K)), jnp.int32)
    plen = jnp.ones((B, K), jnp.int32)
    probs = jnp.exp(ctc_lp)

    psi_exact, _ = ctc_prefix.score_candidates(
        ctc_lp, r, last, plen, with_state=False, probs=probs)
    psi_q, _ = ctc_prefix.score_candidates(
        ctc_lp, r, last, plen, with_state=False, probs=probs,
        probs_q8=_quantize(probs))
    pe = np.asarray(psi_exact)
    pq = np.asarray(psi_q)
    assert not np.isnan(pq).any()
    best = pe.max(axis=-1, keepdims=True)
    # below-resolution candidates sit on the finite md-69 floor, NEVER at
    # a NEG_INF-class sentinel: a selected NEG_INF psi would survive the
    # validity threshold at cw<0.5 and cancel catastrophically in the
    # beam's base recovery (see the q8 branch comment)
    nonblank = np.ones(pq.shape, bool)
    nonblank[:, :, 0] = False
    assert pq[nonblank].min() > -1e4
    floored = pq <= pe - 1.0  # candidates clobbered toward the floor
    # no candidate near its hypothesis's best may be floored, and the
    # error shrinks with competitiveness (the selection-relevant regime):
    # ~quantization-step-level within 2 nats of the best, degrading with
    # the gap (contributions from the weight tail below 1/254 of the
    # per-hypothesis max are dropped — see the q8 branch comment).
    assert not (floored & (pe >= best - 4.0)).any()
    for gap, tol in ((2.0, 0.03), (3.0, 0.15)):
        m = (pe >= best - gap)
        err = np.abs(pq - pe)[m]
        assert err.max() < tol, (
            f"max quantized-psi error {err.max():.4f} within {gap} nats")
    # blank stays masked either way
    assert np.all(pq[:, :, 0] <= ctc_prefix.NEG_INF / 2)


def test_psi_int8_under_jit_matches_eager():
    B, K, T, V = 1, 3, 16, 32
    rng = np.random.RandomState(0)
    ctc_lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, T, V) * 4.0, jnp.float32), -1)
    ctc_lp = ctc_prefix.pad_ctc_log_probs(ctc_lp, jnp.array([T]))
    r, _ = ctc_prefix.init_state(ctc_lp, K)
    last = jnp.zeros((B, K), jnp.int32)
    plen = jnp.zeros((B, K), jnp.int32)
    probs = jnp.exp(ctc_lp)
    q8 = _quantize(probs)

    def f(lp, rr, p, q):
        psi, _ = ctc_prefix.score_candidates(
            lp, rr, last, plen, with_state=False, probs=p, probs_q8=q)
        return psi

    np.testing.assert_allclose(np.asarray(jax.jit(f)(ctc_lp, r, probs, q8)),
                               np.asarray(f(ctc_lp, r, probs, q8)),
                               rtol=1e-6, atol=1e-6)


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
    # sharpen every output head so per-step distributions are peaky
    # (trained-model regime): scale the final projections up
    params = jax.tree_util.tree_map(lambda x: x * 1.5, params)
    return model, params


def test_beam_psi_quant_search_quality_matches_exact():
    """Random untrained models produce near-tied hypothesis sets, so exact
    token equality is not the contract (quantized selection may pick a
    different member of a tie class); the contract is SEARCH QUALITY: the
    reported score of the quantized decode's top-1 must match the exact
    decode's top-1 closely, because finished-hypothesis scoring (base +
    eos terms + final ranking) is exact arithmetic in both paths — only
    candidate selection sees quantized psi. Token-level equality on a
    TRAINED (peaky) model is asserted by the on-chip subword CLI check
    recorded in BASELINE.md."""
    model, params = _peaky_model()
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(3, 12, 6), jnp.float32)
    flen = jnp.array([12, 9, 12])
    cfg = {"beam_size": 4, "min_len_ratio": 0.0, "max_len_ratio": 0.7,
           "ctc_weight": 0.5, "amp": True}
    out_exact = BeamDecoder(model, cfg).forward(params, feat, flen)
    out_q = BeamDecoder(model, dict(cfg, psi_quant="int8")).forward(
        params, feat, flen)
    se = np.asarray(out_exact.scores)
    sq = np.asarray(out_q.scores)
    assert np.isfinite(se[:, 0]).all() and np.isfinite(sq[:, 0]).all()
    np.testing.assert_allclose(sq[:, 0], se[:, 0], atol=0.02)
    # both decodes emit structurally valid hypotheses
    assert (np.asarray(out_q.lengths) >= 0).all()


def test_beam_psi_quant_rejects_bad_value():
    model, params = _peaky_model()
    with pytest.raises(ValueError):
        BeamDecoder(model, {"beam_size": 2, "psi_quant": "fp8",
                            "ctc_weight": 0.5})
