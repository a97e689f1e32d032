"""End-to-end decode: train briefly, then run the test solver (greedy CTC and
beam with LM fusion), checking output files and pipeline integrity."""
import argparse
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.data import synthetic
from tests.test_e2e_train import _paras, _asr_config


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    synthetic.generate_corpus(str(root), n_train=16, n_dev=6, n_test=6,
                              max_words=2)
    return root


@pytest.fixture(scope="module")
def trained(tmp_path_factory, corpus):
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver
    tmp = tmp_path_factory.mktemp("exp")
    cfg = _asr_config(corpus, ctc_weight=0.5, max_step=12)
    solver = Solver(cfg, _paras(tmp, "joint"), "train")
    solver.load_data()
    solver.set_model()
    solver.exec()
    return tmp, cfg


def test_decode_solver_beam(tmp_path, corpus, trained):
    from end_to_end_asr_pytorch_tpu.solvers.test_asr import Solver
    exp_dir, cfg = trained
    cfg = dict(cfg)
    cfg["data"] = dict(cfg["data"])
    cfg["data"]["corpus"] = dict(cfg["data"]["corpus"],
                                 test_split=["test-clean"], batch_size=4)
    cfg["decode"] = {"beam_size": 3, "min_len_ratio": 0.05,
                     "max_len_ratio": 0.4, "ctc_weight": 0.3,
                     "lm_weight": 0.0}
    paras = _paras(tmp_path, "joint",
                   load=str(exp_dir / "ckpt" / "joint_sd0" / "latest.pth"))
    paras.test = True
    solver = Solver(cfg, paras, "test")
    solver.load_data()
    solver.set_model()
    solver.exec()
    out = tmp_path / "out" / "joint_sd0"
    for split in ("dev", "test"):
        csv = (out / f"{split}_output.csv").read_text().splitlines()
        assert csv[0] == "idx\thyp\ttruth"
        assert len(csv) == 7  # header + 6 utts
        beam = (out / f"{split}_beam.csv").read_text().splitlines()
        assert beam[0] == "idx\trank\tscore\thyp"
        assert len(beam) == 1 + 6 * 3  # 3-best per utt


def test_decode_solver_ctc_greedy(tmp_path, corpus):
    """CTC-only model decodes via greedy best-path in the same solver."""
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver as TrainS
    from end_to_end_asr_pytorch_tpu.solvers.test_asr import Solver as TestS
    cfg = _asr_config(corpus, ctc_weight=1.0, max_step=6)
    tr = TrainS(cfg, _paras(tmp_path, "ctc"), "train")
    tr.load_data()
    tr.set_model()
    tr.exec()
    cfg["data"]["corpus"]["test_split"] = ["test-clean"]
    cfg["decode"] = {}
    paras = _paras(tmp_path, "ctc",
                   load=str(tmp_path / "ckpt" / "ctc_sd0" / "latest.pth"))
    paras.test = True
    ts = TestS(cfg, paras, "test")
    ts.load_data()
    ts.set_model()
    ts.exec()
    assert (tmp_path / "out" / "ctc_sd0" / "test_output.csv").exists()
