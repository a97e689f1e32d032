"""Misc utilities mirroring the reference's ``src/util.py`` (SURVEY.md 2.20):
``human_format``, ``Timer``, ``feat_to_fig`` (attention heatmap for TB)."""
from __future__ import annotations

import time

import numpy as np


def human_format(num: float) -> str:
    magnitude = 0
    while abs(num) >= 1000 and magnitude < 4:
        magnitude += 1
        num /= 1000.0
    return f"{num:.1f}".rstrip("0").rstrip(".") + ["", "K", "M", "G", "T"][magnitude]


class Timer:
    """Wall-clock accumulator used in progress messages."""

    def __init__(self):
        self.prev_t = time.time()
        self.clear()

    def set(self):
        self.prev_t = time.time()

    def cnt(self, mode: str):
        self.time_table[mode] += time.time() - self.prev_t
        self.set()
        if mode == "bw":
            self.click += 1

    def show(self) -> str:
        total = sum(self.time_table.values()) or 1e-8
        msg = " | ".join(f"{k} {v / total:.0%}" for k, v in self.time_table.items())
        self.clear()
        return f"[{msg}]"

    def clear(self):
        self.time_table = {"rd": 1e-6, "fw": 1e-6, "bw": 1e-6}
        self.click = 0


def feat_to_fig(feat: np.ndarray):
    """Attention/feature heatmap -> matplotlib figure (for TensorBoard).
    feat: (T, D) or (H, T, D)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    feat = np.asarray(feat)
    if feat.ndim == 3:
        feat = feat[0]
    fig, ax = plt.subplots(figsize=(6, 3))
    ax.imshow(feat.T, aspect="auto", origin="lower", cmap="viridis")
    fig.tight_layout()
    return fig
