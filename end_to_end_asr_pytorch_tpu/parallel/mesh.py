"""Device mesh + sharding helpers: the scale-out story.

The reference has NO distributed machinery (SURVEY.md section 2,
"Parallelism & distributed components"); its workloads are small enough that
batch data-parallelism saturates a v5e-8. Here that is expressed the XLA way:
a 1-D ``('data',)`` mesh, batches sharded on the leading axis with
``NamedSharding``, parameters replicated — ``jax.jit`` then partitions the
step and inserts the gradient ``psum`` over ICI automatically (the
scaling-book recipe: annotate shardings, let XLA place collectives).

All helpers degrade to single-device no-ops so the same solver code runs on
1 chip, an 8-chip slice, or the 8-device virtual CPU mesh used in CI.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put array entries of a host batch with batch-axis sharding.
    Non-array entries (names, raw text) pass through untouched."""
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    rep = replicated(mesh)
    return jax.device_put(tree, rep)


def prefetch_to_device(batches, mesh: Mesh, multiple: int, depth: int = 2):
    """Wrap a host-batch iterator with device-side double buffering.

    A background thread pads each batch to the mesh multiple and device_puts
    it with batch sharding, keeping up to ``depth`` batches in flight so the
    host->device transfer overlaps the previous step's device compute. This
    is the train/decode loop's dominant per-step cost on hosts with a slow
    device link (measured ~110 ms/step of synchronous transfer+host work in
    the CLI train loop through the TPU tunnel; a real TPU VM's DMA is faster
    but still worth hiding).

    Yields ``(device_batch, host_batch)`` — host metadata (names, raw text,
    numpy lengths) stays cheap to touch without pulling arrays back.
    """
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))
    stop = object()
    cancel = threading.Event()
    error: list = []

    def worker():
        try:
            for b in batches:
                if cancel.is_set():
                    return
                hb = pad_batch_to(b, multiple)
                item = (shard_batch(mesh, hb), hb)
                while not cancel.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except _queue.Full:
                        continue
        except BaseException as e:  # propagate to the consumer, not silence
            error.append(e)
        finally:
            # the stop sentinel MUST land (a dropped sentinel deadlocks the
            # consumer on q.get) — block for it, but stay cancellable
            while not cancel.is_set():
                try:
                    q.put(stop, timeout=0.2)
                    break
                except _queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                if error:
                    raise error[0]
                break
            yield item
    finally:
        # consumer broke out early (max_step, exception): unblock and stop
        # the worker so it doesn't pin prefetched device batches in HBM
        cancel.set()
        while True:
            try:
                q.get_nowait()
            except _queue.Empty:
                break


def pad_batch_to(batch: dict, multiple: int) -> dict:
    """Pad the batch dim up to a multiple of the mesh size with zero-length
    dummy utterances (text_len == 0 => masked out of every loss/metric)."""
    some = next(v for v in batch.values() if isinstance(v, np.ndarray))
    B = some.shape[0]
    pad = (-B) % multiple
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            padding = np.zeros((pad,) + v.shape[1:], v.dtype)
            out[k] = np.concatenate([v, padding], axis=0)
        else:
            out[k] = v
    return out
