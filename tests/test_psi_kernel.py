"""Parity tests for the Pallas phase-1 psi kernel (interpret mode on CPU).

The kernel must reproduce ops/ctc_prefix.score_candidates' full-vocab
psi-only path (bf16 probs, f32 accumulation) including the last-token and
blank epilogue merges; a full amp BeamDecoder run with psi_kernel=
'interpret' must track the plain amp decode.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops import ctc_prefix


def _inputs(B=3, K=4, T=18, V=256, seed=0):
    rng = np.random.RandomState(seed)
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, T, V) * 2.0, jnp.float32), axis=-1)
    enc_len = jnp.asarray(rng.randint(T // 2, T + 1, (B,)), jnp.int32)
    lp = ctc_prefix.pad_ctc_log_probs(lp, enc_len)
    r, _ = ctc_prefix.init_state(lp, K)
    # advance the state once so r is a generic mid-decode state
    last = jnp.asarray(rng.randint(1, V, (B, K)), jnp.int32)
    plen = jnp.asarray(rng.randint(0, 3, (B, K)), jnp.int32)
    _, r2 = ctc_prefix.score_candidates(lp, r, last, plen,
                                        cand_ids=last[..., None])
    r = r2[:, :, 0]
    last2 = jnp.asarray(rng.randint(1, V, (B, K)), jnp.int32)
    plen2 = plen + 1
    return lp, r, last2, plen2


def test_psi_kernel_matches_plain_path():
    lp, r, last, plen = _inputs()
    probs = jnp.exp(lp).astype(jnp.bfloat16)
    ref, _ = ctc_prefix.score_candidates(lp, r, last, plen,
                                         with_state=False, probs=probs)
    got, _ = ctc_prefix.score_candidates(lp, r, last, plen,
                                         with_state=False, probs=probs,
                                         psi_pallas="interpret")
    assert got.shape == ref.shape and got.dtype == ref.dtype
    # identical bf16-multiply/f32-accumulate math, blocked accumulation
    ref_n, got_n = np.asarray(ref), np.asarray(got)
    mask = ref_n > ctc_prefix.NEG_INF / 2
    np.testing.assert_allclose(got_n[mask], ref_n[mask],
                               rtol=2e-5, atol=2e-5)
    # blank and last-token columns are exact merges
    assert np.all(got_n[:, :, 0] == ctc_prefix.NEG_INF)
    same = np.take_along_axis(got_n, np.asarray(last)[..., None], axis=2)
    ref_same = np.take_along_axis(ref_n, np.asarray(last)[..., None], axis=2)
    np.testing.assert_array_equal(same, ref_same)


def test_psi_kernel_multiblock_grid():
    """V=256 with a forced 128-block exercises the j-grid column offsets."""
    lp, r, last, plen = _inputs(V=256, T=9, seed=3)
    probs = jnp.exp(lp).astype(jnp.bfloat16)
    from end_to_end_asr_pytorch_tpu.ops.pallas import psi_kernel
    ref, _ = ctc_prefix.score_candidates(lp, r, last, plen,
                                         with_state=False, probs=probs)
    old = psi_kernel._VMEM_BUDGET
    try:
        psi_kernel._VMEM_BUDGET = 9 * 128 * 2  # only BV=128 fits
        assert psi_kernel.pick_block(256, 9) == 128
        got, _ = ctc_prefix.score_candidates(lp, r, last, plen,
                                             with_state=False, probs=probs,
                                             psi_pallas="interpret")
    finally:
        psi_kernel._VMEM_BUDGET = old
    mask = np.asarray(ref) > ctc_prefix.NEG_INF / 2
    np.testing.assert_allclose(np.asarray(got)[mask], np.asarray(ref)[mask],
                               rtol=2e-5, atol=2e-5)


def test_full_amp_decode_with_psi_kernel_tracks_plain():
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    V, B, K, T_in = 128, 3, 3, 12
    cfg = {
        "ctc_weight": 0.5,
        "encoder": {"prenet": "", "module": "LSTM", "bidirection": False,
                    "dim": [16], "sample_rate": [1], "sample_style": "drop"},
        "attention": {"mode": "loc", "dim": 8, "num_head": 1,
                      "temperature": 1.0, "v_proj": True,
                      "loc_kernel_size": 3, "loc_kernel_num": 2},
        "decoder": {"module": "LSTM", "dim": 16, "layer": 1},
    }
    model = ASR(6, V, cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(B, T_in, 6), jnp.float32)
    feat_len = jnp.asarray([T_in, T_in, 9], jnp.int32)
    dcfg = {"beam_size": K, "min_len_ratio": 0.0, "max_len_ratio": 1.0,
            "ctc_weight": 0.4, "amp": True}
    out = {}
    for pk in (False, "interpret"):
        dec = BeamDecoder(model, dict(dcfg, psi_kernel=pk))
        out[pk] = jax.device_get(dec.forward(params, feat, feat_len))
    # same program numerics up to blocked-psi accumulation order: demand
    # identical top-1 sequences and near-identical scores
    a, b = out[False], out["interpret"]
    for i in range(B):
        assert (a.tokens[i, 0, :a.lengths[i, 0]].tolist()
                == b.tokens[i, 0, :b.lengths[i, 0]].tolist())
    np.testing.assert_allclose(b.scores[:, 0], a.scores[:, 0],
                               rtol=1e-4, atol=1e-4)
