"""BaseSolver: experiment lifecycle shared by train/LM/test solvers.

Capability parity with the reference's ``src/solver.py:BaseSolver``
(SURVEY.md 2.3): merges config with ``default_hparas``; experiment name =
config stem + seed; creates log/ckpt dirs and a TensorBoard writer; provides
``verbose``/``progress``/``write_log``; checkpoint lifecycle with
best-per-metric + latest; abstract ``load_data``/``set_model``/``exec``.

The reference's ``backward`` (grad clip + NaN step-skip) lives inside the
jitted train step here (optim.Optimizer), not on the solver — device-side,
per SURVEY.md section 5 failure-detection row.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

from ..config import merge_hparas
from ..utils.util import human_format, Timer


class BaseSolver:
    def __init__(self, config: Dict[str, Any], paras, mode: str):
        self.config = config
        self.paras = paras
        self.mode = mode
        for k, v in merge_hparas(config.get("hparas", {})).items():
            setattr(self, k, v)

        name = getattr(paras, "name", None) or Path(paras.config).stem
        self.exp_name = f"{name}_sd{paras.seed}"
        self.logdir = Path(paras.logdir) / self.exp_name
        self.ckpdir = Path(paras.ckpdir) / self.exp_name
        self.outdir = Path(paras.outdir) / self.exp_name
        if mode == "train":
            self.ckpdir.mkdir(parents=True, exist_ok=True)
            self.logdir.mkdir(parents=True, exist_ok=True)
        else:
            self.outdir.mkdir(parents=True, exist_ok=True)
        self._writer = None
        self.step = 0
        self.timer = Timer()
        # "native" single-file msgpack (default) or "orbax" directories;
        # load_checkpoint sniffs, so this only affects how NEW ckpts are
        # written (utils/checkpoint.py). Validated HERE so a typo fails at
        # startup, not hours in at the first validation save.
        self.ckpt_format = config.get("ckpt_format", "native")
        if self.ckpt_format not in ("native", "orbax"):
            raise ValueError(
                f"ckpt_format {self.ckpt_format!r} (want native|orbax)")

    # ------------------------------------------------------------- logging
    @property
    def log(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(str(self.logdir),
                                         flush_secs=self.TB_FLUSH_FREQ)
        return self._writer

    def verbose(self, msg):
        if not getattr(self.paras, "no_msg", False):
            if isinstance(msg, list):
                for m in msg:
                    self.verbose(m)
            else:
                print(f"[INFO] {msg}", flush=True)

    def progress(self, msg: str):
        if not getattr(self.paras, "no_msg", False):
            print(f"[{human_format(self.step)}] {msg}", flush=True)

    def write_log(self, log_name: str, log_dict):
        """Scalar dict / figure / text -> TensorBoard."""
        if isinstance(log_dict, dict):
            clean = {k: float(v) for k, v in log_dict.items()
                     if v is not None}
            if clean:
                self.log.add_scalars(log_name, clean, self.step)
        elif isinstance(log_dict, str):
            self.log.add_text(log_name, log_dict, self.step)
        else:  # matplotlib figure
            self.log.add_figure(log_name, log_dict, self.step)

    # -------------------------------------------------------- to implement
    def load_data(self):
        raise NotImplementedError

    def set_model(self):
        raise NotImplementedError

    def exec(self):
        raise NotImplementedError
