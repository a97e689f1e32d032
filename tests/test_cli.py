"""CLI smoke test: the reference's `main.py --config ... [--test|--lm]`
surface drives the whole pipeline end-to-end in a subprocess."""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.data import synthetic

REPO = Path(__file__).resolve().parent.parent


def _run(args, cwd):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return subprocess.run(
        [sys.executable, str(REPO / "main.py")] + args + ["--cpu"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1800)


@pytest.mark.slow
def test_cli_train_and_decode(tmp_path):
    synthetic.generate_corpus(str(tmp_path / "synth"), n_train=8, n_dev=4,
                              n_test=4, max_words=1)
    cfg = {
        "data": {
            "corpus": {"name": "synthetic", "path": str(tmp_path / "synth"),
                       "train_split": ["train-clean"],
                       "dev_split": ["dev-clean"],
                       "test_split": ["test-clean"], "batch_size": 8},
            "audio": {"feat_type": "fbank", "feat_dim": 40, "cmvn": True},
            "text": {"mode": "character",
                     "vocab_file": str(tmp_path / "synth" / "vocab.txt")},
        },
        "model": {
            "ctc_weight": 0.5,
            "encoder": {"prenet": "", "module": "LSTM", "bidirection": True,
                        "dim": [32], "sample_rate": [4],
                        "sample_style": "drop"},
            "attention": {"mode": "dot", "dim": 16, "num_head": 1},
            "decoder": {"module": "LSTM", "dim": 32, "layer": 1},
        },
        "hparas": {"valid_step": 4, "max_step": 4, "optimizer": "Adadelta",
                   "lr": 1.0, "lr_scheduler": "fixed"},
        "decode": {"beam_size": 2, "max_len_ratio": 0.3, "ctc_weight": 0.0,
                   "lm_weight": 0.0},
    }
    cfg_file = tmp_path / "smoke.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))

    r = _run(["--config", str(cfg_file)], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    ck = tmp_path / "ckpt" / "smoke_sd0" / "latest.pth"
    assert ck.exists()

    r = _run(["--config", str(cfg_file), "--test", "--load", str(ck)],
             cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "result" / "smoke_sd0" / "test_output.csv").exists()
