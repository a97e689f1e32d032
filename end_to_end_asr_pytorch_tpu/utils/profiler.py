"""Tracing / profiling harness (SURVEY.md section 5, 'Tracing / profiling').

The reference has only a wall-clock Timer; here:
  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable device trace (XLA op timeline, HBM usage).
  * ``benchmark(fn, *args)`` — compile-then-time with ``block_until_ready``,
    reporting ms/call and derived utts/sec + inverse-RTF given batch shape.
  * ``device_memory()`` — live/peak HBM stats per device where the backend
    exposes them.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 1,
              batch_utts: int | None = None,
              audio_seconds: float | None = None) -> Dict[str, Any]:
    """Times a jitted callable; returns {ms_per_call, calls_per_sec,
    utts_per_sec?, inv_rtf?}."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    res: Dict[str, Any] = {
        "ms_per_call": dt / iters * 1e3,
        "calls_per_sec": iters / dt,
    }
    if batch_utts:
        res["utts_per_sec"] = batch_utts * iters / dt
        if audio_seconds:
            res["inv_rtf"] = batch_utts * audio_seconds * iters / dt
    return res


def device_memory() -> Dict[str, Dict[str, int]]:
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", -1),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", -1),
                "bytes_limit": s.get("bytes_limit", -1),
            }
        except Exception:
            stats[str(d)] = {}
    return stats
