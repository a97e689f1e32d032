"""Subword (BPE) tokenizer driving the full train pipeline, exercising the
large-vocab CTC-candidate pruning path in beam decode."""
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.data import synthetic
from tests.test_e2e_train import _paras, _asr_config

REPO = Path(__file__).resolve().parent.parent


def test_subword_training_and_beam(tmp_path):
    root = tmp_path / "synth"
    synthetic.generate_corpus(str(root), n_train=12, n_dev=4, n_test=4,
                              max_words=2)
    # train a BPE model on the transcripts
    texts = []
    for trans in root.rglob("*.trans.txt"):
        for line in trans.read_text().splitlines():
            texts.append(line.split(" ", 1)[1].lower())
    corpus_txt = tmp_path / "all.txt"
    corpus_txt.write_text("\n".join(texts))
    bpe = tmp_path / "bpe.json"
    subprocess.run(
        [sys.executable, str(REPO / "util" / "generate_vocab_file.py"),
         "--input_file", str(corpus_txt), "--mode", "subword",
         "--output_file", str(bpe), "--vocab_size", "64"], check=True)

    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver
    cfg = _asr_config(root, ctc_weight=0.5, max_step=6)
    cfg["data"]["text"] = {"mode": "subword", "vocab_file": str(bpe)}
    solver = Solver(cfg, _paras(tmp_path, "bpe"), "train")
    solver.load_data()
    solver.set_model()
    solver.exec()

    # beam decode with ctc candidate pruning forced on
    from end_to_end_asr_pytorch_tpu.solvers.test_asr import Solver as TestS
    cfg["data"]["corpus"]["test_split"] = ["test-clean"]
    cfg["decode"] = {"beam_size": 3, "max_len_ratio": 0.3, "ctc_weight": 0.3,
                     "lm_weight": 0.0, "ctc_candidates": 8}
    paras = _paras(tmp_path, "bpe",
                   load=str(tmp_path / "ckpt" / "bpe_sd0" / "latest.pth"))
    paras.test = True
    ts = TestS(cfg, paras, "test")
    ts.load_data()
    ts.set_model()
    ts.exec()
    out = (tmp_path / "out" / "bpe_sd0" / "test_output.csv").read_text()
    assert len(out.splitlines()) == 5
