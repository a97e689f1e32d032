"""Config / flag system.

Parity with the reference (SURVEY.md 2.2 ``src/option.py`` and 2.13 YAML
schema): one YAML file per experiment with top-level blocks
``data:{corpus,audio,text}``, ``model``, ``hparas`` and (for decoding)
``decode``; plus a small dict of framework-default hyperparameters merged into
every solver. The YAML schema is kept identical so reference configs port
over; validation is ours.
"""
from __future__ import annotations

from typing import Any, Dict

import yaml

# Mirror of reference src/option.py:default_hparas (SURVEY.md 2.2).
default_hparas: Dict[str, Any] = {
    "GRAD_CLIP": 5.0,        # global-norm gradient clipping
    "PROGRESS_STEP": 100,    # console progress every N steps
    "DEV_N_EXAMPLE": 4,      # dev examples shown/logged during validation
    "TB_FLUSH_FREQ": 180,    # seconds between TensorBoard flushes
}

_TOP_LEVEL = ("data", "model", "hparas")


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    validate_config(cfg)
    return cfg


def validate_config(cfg: Dict[str, Any]) -> None:
    """Light structural validation with actionable messages. Training configs
    need data/model/hparas; LM configs reuse the same blocks; decode configs
    add a ``decode`` block."""
    if not isinstance(cfg, dict):
        raise ValueError("config root must be a mapping")
    for key in _TOP_LEVEL:
        if key not in cfg:
            raise ValueError(f"config missing required top-level block {key!r}")
    data = cfg["data"]
    for key in ("corpus", "text"):
        if key not in data:
            raise ValueError(f"config data block missing {key!r}")
    if "audio" not in data and not cfg.get("lm_only", False):
        # LM configs have no audio block; tolerate via explicit flag or absence
        # of an encoder in the model block.
        if "encoder" in cfg.get("model", {}):
            raise ValueError("ASR config data block missing 'audio'")
    text = data["text"]
    if text.get("mode") not in ("character", "word", "subword"):
        raise ValueError(f"unknown text mode {text.get('mode')!r}")


def merge_hparas(hparas: Dict[str, Any]) -> Dict[str, Any]:
    """Experiment hparas merged over framework defaults (reference
    BaseSolver.__init__ behavior, SURVEY.md 2.3)."""
    out = dict(default_hparas)
    out.update(hparas or {})
    return out
