#!/usr/bin/env python
"""Aggregate a jax.profiler device trace into per-op / per-source hotspots.

The round-1/2 perf playbook (NOTES.md): capture a trace with
``end_to_end_asr_pytorch_tpu.utils.profiler.trace``, then aggregate the
TensorBoard ``*.trace.json.gz`` event durations by XLA op name and by the
``source`` metadata XLA attaches (file:line of the jnp call that produced
the op). This script is that aggregator, kept in-repo so future sessions
don't rewrite it.

Usage:
  python util/profile_hotspots.py <logdir> [--top 30] [--by source|op]

where <logdir> is what was passed to profiler.trace(logdir).
"""
import argparse
import collections
import gzip
import json
import sys
from pathlib import Path


def find_traces(logdir: str):
    return sorted(Path(logdir).rglob("*.trace.json.gz"))


def load_events(path: Path):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def aggregate(events, by="source"):
    """Sum durations of complete events ('X') on device tracks, keyed by
    the op's source metadata (args.source / args.name fallback)."""
    totals = collections.Counter()
    counts = collections.Counter()
    # device (TPU/XLA) tracks carry XLA op events with args metadata; host
    # python tracks have no 'args.source' — they aggregate under their name
    for ev in events:
        if ev.get("ph") != "X":
            continue
        dur = ev.get("dur", 0)  # microseconds
        if dur <= 0:
            continue
        args = ev.get("args") or {}
        name = ev.get("name", "?")
        if by == "source":
            key = args.get("source") or args.get("tf_op") or name
        else:
            key = name
        totals[key] += dur
        counts[key] += 1
    return totals, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--by", choices=("source", "op"), default="source")
    args = ap.parse_args()

    paths = find_traces(args.logdir)
    if not paths:
        sys.exit(f"no *.trace.json.gz under {args.logdir}")
    totals = collections.Counter()
    counts = collections.Counter()
    for p in paths:
        t, c = aggregate(load_events(p), by=args.by)
        totals.update(t)
        counts.update(c)
    grand = sum(totals.values())
    print(f"{'us total':>12} {'%':>6} {'n':>8}  key")
    for key, us in totals.most_common(args.top):
        print(f"{us:>12} {100*us/grand:>5.1f}% {counts[key]:>8}  {key[:140]}")
    print(f"{grand:>12} 100.0%  TOTAL (all tracks, incl. host)")


if __name__ == "__main__":
    main()
