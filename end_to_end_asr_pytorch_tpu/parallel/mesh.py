"""Device mesh + sharding helpers: the scale-out story.

The reference has NO distributed machinery (SURVEY.md section 2,
"Parallelism & distributed components"); its workloads are small enough that
batch data-parallelism saturates a v5e-8. Here that is expressed the XLA way:
a 1-D ``('data',)`` mesh, batches sharded on the leading axis with
``NamedSharding``, parameters replicated — ``jax.jit`` then partitions the
step and inserts the gradient ``psum`` over ICI automatically (the
scaling-book recipe: annotate shardings, let XLA place collectives).

Beyond the reference: an opt-in **tensor-parallel** axis
(``model_parallel: M`` in the experiment yaml) reshapes the same devices
into a 2-D ``('data', 'model')`` mesh and shards the weight matrices that
grow with model/vocab size (Megatron-style pairing — see
``model_parallel_spec``), while batches stay sharded over ``'data'`` only.
Nothing else changes: the solvers' jitted steps are untouched, GSPMD
propagates the layouts and places the psums/all-gathers over ICI. At the
reference's LAS sizes tp is never a win (the matrices fit one chip with
room to spare); the axis exists so the SAME solver code scales past
single-chip HBM when vocab or hidden dims do grow.

All helpers degrade to single-device no-ops so the same solver code runs on
1 chip, an 8-chip slice, or the 8-device virtual CPU mesh used in CI.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    m = int(model_parallel)
    if m <= 1:
        return Mesh(np.asarray(devices), ("data",))
    if len(devices) % m:
        raise ValueError(
            f"model_parallel={m} does not divide {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(-1, m), ("data", "model"))


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


# ---------------------------------------------------------------------- tp
# Name-based tensor-parallel placement. Rules key on the LAST path
# component, so the same function shards a params tree AND its optax state
# (whose leaves mirror the param names inside mu/nu/accumulator nodes).
# Megatron-style pairing keeps collectives off the per-step critical path
# where possible:
#   w_ih/w_hh (in, G) + gate biases  -> columns over 'model' (each shard
#       computes its slice of the gates; the h @ w_hh contraction psums)
#   ctc_w/char_w/out_w (d, V) + bias -> vocab-sharded logits; the loss
#       softmax all-gathers once per step, not per matrix
#   embed (V, E)                     -> vocab rows (the one-hot matmul
#       lookup contracts over V -> psum)
#   attention w_q/w_k/w_v/w_f/v_energy/bias -> attention dim; the energy
#       reduction over d_att psums
# Anything else (conv kernels, scalars, layernorm) replicates. A dim that
# the mesh's model size does not divide replicates too — correctness never
# depends on the rule firing.

_COL_SHARDED = {"w_ih", "w_hh", "w_q", "w_k", "w_v", "w_f", "v_energy",
                "ctc_w", "char_w", "out_w"}
_VEC_SHARDED = {"b", "b_ih", "b_hh", "ctc_b", "char_b", "bias", "out_b"}
_ROW_SHARDED = {"embed"}


def _leaf_name(path) -> str:
    if not path:
        return ""
    last = path[-1]
    name = getattr(last, "name", None)       # GetAttrKey (dataclass/namedtuple)
    if name is None:
        name = getattr(last, "key", None)    # DictKey
    return str(name) if name is not None else ""


def model_parallel_spec(path, leaf, m: int) -> P:
    name = _leaf_name(path)
    shape = getattr(leaf, "shape", ())
    if name in _COL_SHARDED and len(shape) == 2 and shape[-1] % m == 0:
        return P(None, "model")
    if name in _VEC_SHARDED and len(shape) == 1 and shape[0] % m == 0:
        return P("model")
    if name in _ROW_SHARDED and len(shape) == 2 and shape[0] % m == 0:
        return P("model", None)
    return P()


def shard_params(mesh: Mesh, tree: Any) -> Any:
    """Place a params (or optax-state) tree on the mesh: replicated on a
    1-D data mesh, tensor-parallel per ``model_parallel_spec`` on a 2-D
    ``('data','model')`` mesh."""
    if "model" not in mesh.axis_names:
        return replicate_tree(mesh, tree)
    m = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, model_parallel_spec(path, leaf, m))),
        tree)


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
