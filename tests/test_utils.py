"""Utility coverage: human_format, Timer, feat_to_fig, profiler.benchmark,
transcribe file collection (SURVEY.md 2.20 helpers)."""
import sys
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.utils.util import human_format, Timer, feat_to_fig
from end_to_end_asr_pytorch_tpu.utils.profiler import benchmark, device_memory
from transcribe import collect_files


def test_human_format():
    assert human_format(950) == "950"
    assert human_format(1500) == "1.5K"
    assert human_format(2_000_000) == "2M"
    assert human_format(3_200_000_000) == "3.2G"


def test_timer_accumulates_and_reports():
    t = Timer()
    t.set()
    time.sleep(0.01)
    t.cnt("fw")
    t.cnt("bw")
    msg = t.show()
    assert "fw" in msg and "bw" in msg and msg.startswith("[")
    assert t.click == 0  # cleared by show()


def test_feat_to_fig_returns_figure():
    fig = feat_to_fig(np.random.RandomState(0).rand(12, 8))
    assert fig is not None
    fig3 = feat_to_fig(np.random.RandomState(0).rand(2, 12, 8))
    assert fig3 is not None


def test_profiler_benchmark():
    f = lambda x: jnp.sum(x * 2)
    res = benchmark(f, jnp.ones((8, 8)), iters=3, batch_utts=4,
                    audio_seconds=2.0)
    assert res["ms_per_call"] > 0
    assert res["utts_per_sec"] > 0
    assert res["inv_rtf"] > 0


def test_device_memory_returns_per_device():
    stats = device_memory()
    assert len(stats) >= 1


def test_transcribe_collect_files(tmp_path):
    (tmp_path / "a.wav").write_bytes(b"x")
    (tmp_path / "b.flac").write_bytes(b"x")
    (tmp_path / "c.txt").write_bytes(b"x")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "d.npy").write_bytes(b"x")
    files = collect_files([str(tmp_path / "a.wav"), str(tmp_path)])
    names = sorted(f.name for f in files)
    assert names == ["a.wav", "a.wav", "b.flac", "d.npy"]
