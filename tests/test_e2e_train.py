"""End-to-end integration: train -> validate -> checkpoint -> resume on the
synthetic corpus, all on the 8-device virtual CPU mesh (SURVEY.md section 4
test strategy)."""
import argparse
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.data import synthetic


def _paras(tmp, config_name, load=None):
    return argparse.Namespace(
        config=f"{config_name}.yaml", name=None,
        logdir=str(tmp / "log"), ckpdir=str(tmp / "ckpt"),
        outdir=str(tmp / "out"), load=load, seed=0, njobs=1,
        cpu=True, no_pin=True, test=False, no_msg=True, lm=False, amp=False)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    synthetic.generate_corpus(str(root), n_train=16, n_dev=8, n_test=8,
                              max_words=2)
    return root


def _asr_config(corpus, ctc_weight=1.0, max_step=30):
    cfg = {
        "data": {
            "corpus": {"name": "synthetic", "path": str(corpus),
                       "train_split": ["train-clean"],
                       "dev_split": ["dev-clean"], "batch_size": 8},
            "audio": {"feat_type": "fbank", "feat_dim": 40, "cmvn": True},
            "text": {"mode": "character",
                     "vocab_file": str(corpus / "vocab.txt")},
        },
        "model": {
            "ctc_weight": ctc_weight,
            "encoder": {"prenet": "", "module": "LSTM", "bidirection": True,
                        "dim": [32, 32], "sample_rate": [2, 2],
                        "sample_style": "drop"},
            "attention": {"mode": "loc", "dim": 16, "num_head": 1,
                          "loc_kernel_size": 11, "loc_kernel_num": 3},
            "decoder": {"module": "LSTM", "dim": 32, "layer": 1},
        },
        "hparas": {"valid_step": max_step, "max_step": max_step,
                   "optimizer": "Adadelta", "lr": 1.0,
                   "lr_scheduler": "fixed", "tf_start": 1.0, "tf_end": 0.8,
                   "tf_step": max_step},
    }
    return cfg


def test_ctc_train_checkpoint_resume(tmp_path, corpus):
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver
    cfg = _asr_config(corpus, ctc_weight=1.0, max_step=24)
    solver = Solver(cfg, _paras(tmp_path, "ctc"), "train")
    solver.load_data()
    solver.set_model()
    losses = []
    orig_train = solver._train_step

    def spy(*args, **kw):
        p, o, s, m = orig_train(*args, **kw)
        losses.append(float(m["loss"]))
        return p, o, s, m

    solver._train_step = spy
    solver.exec()
    assert solver.step == 24
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), "loss did not decrease"
    ck = tmp_path / "ckpt" / "ctc_sd0" / "latest.pth"
    assert ck.exists()
    assert (tmp_path / "ckpt" / "ctc_sd0" / "best_ctc.pth").exists()

    # resume: global step restored and training continues
    cfg2 = _asr_config(corpus, ctc_weight=1.0, max_step=30)
    solver2 = Solver(cfg2, _paras(tmp_path, "ctc", load=str(ck)), "train")
    solver2.load_data()
    solver2.set_model()
    assert solver2.step == 24
    solver2.exec()
    assert solver2.step == 30


def test_joint_train_smoke(tmp_path, corpus):
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver
    cfg = _asr_config(corpus, ctc_weight=0.5, max_step=8)
    solver = Solver(cfg, _paras(tmp_path, "joint"), "train")
    solver.load_data()
    solver.set_model()
    solver.exec()
    assert solver.step == 8
    assert (tmp_path / "ckpt" / "joint_sd0" / "latest.pth").exists()


def test_gru_train_smoke(tmp_path, corpus):
    """GRU encoder+decoder through the full train step. Regression guard:
    init_gru once aliased b_ih/b_hh to one buffer, which crashed the donated
    jit train step at step 0 (donate the same buffer twice)."""
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver
    cfg = _asr_config(corpus, ctc_weight=0.5, max_step=6)
    cfg["model"]["encoder"]["module"] = "GRU"
    cfg["model"]["decoder"]["module"] = "GRU"
    solver = Solver(cfg, _paras(tmp_path, "gru"), "train")
    solver.load_data()
    solver.set_model()
    solver.exec()
    assert solver.step == 6
    assert (tmp_path / "ckpt" / "gru_sd0" / "latest.pth").exists()


def test_lm_train(tmp_path, corpus):
    from end_to_end_asr_pytorch_tpu.solvers.train_lm import Solver
    cfg = {
        "data": {
            "corpus": {"name": "synthetic", "path": str(corpus),
                       "train_split": ["train-clean"],
                       "dev_split": ["dev-clean"], "batch_size": 16},
            "text": {"mode": "character",
                     "vocab_file": str(corpus / "vocab.txt")},
        },
        "model": {"module": "LSTM", "dim": 32, "emb_dim": 32, "layer": 1},
        "hparas": {"valid_step": 20, "max_step": 20, "optimizer": "Adam",
                   "lr": 1e-2, "lr_scheduler": "fixed"},
    }
    solver = Solver(cfg, _paras(tmp_path, "lm"), "train")
    solver.load_data()
    solver.set_model()
    best = solver.exec()
    assert best < 30.0  # char vocab of 30 => untrained ppx ~30
    assert (tmp_path / "ckpt" / "lm_sd0" / "best_ppx.pth").exists()


def test_amp_bf16_train(tmp_path, corpus):
    """hparas.amp: bfloat16 compute path through the full train step."""
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver
    cfg = _asr_config(corpus, ctc_weight=0.5, max_step=6)
    cfg["hparas"]["amp"] = True
    solver = Solver(cfg, _paras(tmp_path, "amp"), "train")
    solver.load_data()
    solver.set_model()
    losses = []
    orig = solver._train_step

    def spy(*a, **k):
        p, o, s, m = orig(*a, **k)
        losses.append(float(m["loss"]))
        return p, o, s, m

    solver._train_step = spy
    solver.exec()
    assert solver.step == 6
    assert all(np.isfinite(l) for l in losses)
    # params stay float32 (bf16 is compute-only)
    import jax
    assert all(l.dtype == np.float32 or l.dtype == np.int32
               for l in jax.tree_util.tree_leaves(solver.params)
               if hasattr(l, "dtype"))
