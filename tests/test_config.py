"""Config system: YAML schema validation + hpara merging (SURVEY.md 2.2/2.13)."""
import sys
from pathlib import Path

import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.config import (
    default_hparas, load_config, merge_hparas, validate_config)


def _base_cfg():
    return {
        "data": {
            "corpus": {"name": "librispeech", "path": "x",
                       "train_split": ["a"], "dev_split": ["b"],
                       "batch_size": 4},
            "audio": {"feat_type": "fbank", "feat_dim": 40},
            "text": {"mode": "character", "vocab_file": "v.txt"},
        },
        "model": {"ctc_weight": 1.0, "encoder": {"dim": [8]}},
        "hparas": {"max_step": 10},
    }


def test_valid_config_passes():
    validate_config(_base_cfg())


def test_missing_block_raises():
    cfg = _base_cfg()
    del cfg["model"]
    with pytest.raises(ValueError, match="model"):
        validate_config(cfg)


def test_bad_text_mode_raises():
    cfg = _base_cfg()
    cfg["data"]["text"]["mode"] = "phoneme"
    with pytest.raises(ValueError, match="text mode"):
        validate_config(cfg)


def test_asr_config_needs_audio():
    cfg = _base_cfg()
    del cfg["data"]["audio"]
    with pytest.raises(ValueError, match="audio"):
        validate_config(cfg)


def test_lm_config_without_audio_ok():
    cfg = _base_cfg()
    del cfg["data"]["audio"]
    cfg["model"] = {"module": "LSTM", "dim": 8}  # no encoder => LM config
    validate_config(cfg)


def test_merge_hparas_defaults():
    merged = merge_hparas({"GRAD_CLIP": 1.0, "max_step": 5})
    assert merged["GRAD_CLIP"] == 1.0          # overridden
    assert merged["PROGRESS_STEP"] == default_hparas["PROGRESS_STEP"]
    assert merged["max_step"] == 5


def test_load_config_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(_base_cfg()))
    cfg = load_config(str(p))
    assert cfg["model"]["ctc_weight"] == 1.0


def test_repo_example_configs_validate():
    repo = Path(__file__).resolve().parent.parent
    for yml in (repo / "config").rglob("*.yaml"):
        cfg = yaml.safe_load(yml.read_text())
        validate_config(cfg)
