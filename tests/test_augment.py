"""SpecAugment: masking statistics, bounds, train-step integration."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops.augment import spec_augment
from end_to_end_asr_pytorch_tpu.data import synthetic
from tests.test_e2e_train import _paras, _asr_config


def test_spec_augment_masks_within_bounds():
    B, T, F = 3, 50, 40
    feat = jnp.ones((B, T, F))
    feat_len = jnp.array([50, 30, 10])
    cfg = {"freq_mask_n": 2, "freq_mask_width": 8,
           "time_mask_n": 2, "time_mask_width": 10, "time_mask_ratio": 0.3}
    out = np.asarray(spec_augment(feat, feat_len, jax.random.PRNGKey(0), cfg))
    assert out.shape == (B, T, F)
    assert ((out == 0) | (out == 1)).all()
    # something masked, but not everything
    frac = (out == 0).mean()
    assert 0.0 < frac < 0.9
    # per-utterance time-mask budget: masked full-time-columns bounded
    for b in range(B):
        col_masked = (out[b] == 0).all(axis=1)  # (T,) fully-masked frames
        assert col_masked.sum() <= int(0.3 * feat_len[b]) + 1


def test_spec_augment_disabled_keeps_features():
    feat = jnp.ones((2, 10, 8))
    cfg = {"freq_mask_n": 0, "freq_mask_width": 0,
           "time_mask_n": 0, "time_mask_width": 0}
    out = np.asarray(spec_augment(feat, jnp.array([10, 10]),
                                  jax.random.PRNGKey(0), cfg))
    np.testing.assert_array_equal(out, np.ones((2, 10, 8)))


def test_train_with_augment(tmp_path):
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver
    root = tmp_path / "synth"
    synthetic.generate_corpus(str(root), n_train=8, n_dev=4, n_test=2,
                              max_words=1)
    cfg = _asr_config(root, ctc_weight=1.0, max_step=4)
    cfg["data"]["audio"]["augment"] = {"freq_mask_n": 1, "freq_mask_width": 5,
                                       "time_mask_n": 1, "time_mask_width": 8}
    solver = Solver(cfg, _paras(tmp_path, "aug"), "train")
    solver.load_data()
    solver.set_model()
    solver.exec()
    assert solver.step == 4
