"""Checkpoint save/load with the reference's lifecycle (SURVEY.md 2.3/3.5):
``best_att.pth`` / ``best_ctc.pth`` / ``latest.pth`` per experiment, dict keys
``{'model', 'optimizer', 'global_step', '<metric>': score}``; training resume
restores model+optimizer+step, test mode restores model only.

Format is msgpack via flax.serialization (not torch pickles); the ``.pth``
names are kept so reference-style tooling/docs carry over. Restoring needs a
structure template (freshly-initialized state), which every solver has.

An optional **orbax** backend (``ckpt_format: orbax`` in the experiment
yaml, or ``fmt="orbax"`` here) writes the same lifecycle names as
*directories* via ``orbax.checkpoint.StandardCheckpointer`` — the
industry-standard JAX checkpoint layout (sharding-aware, per-leaf ocdbt
storage). ``load_checkpoint`` sniffs all three formats (native file /
orbax dir / torch pickle), so mixing formats across an experiment's
lifetime just works.
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

from flax import serialization


def save_checkpoint(path: str, model_params: Any, opt_state: Any = None,
                    global_step: int = 0,
                    metrics: Optional[Dict[str, float]] = None,
                    fmt: str = "native") -> None:
    if fmt == "orbax":
        return _save_orbax(path, model_params, opt_state, global_step,
                           metrics)
    if fmt != "native":
        raise ValueError(f"unknown ckpt_format {fmt!r} (native|orbax)")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "model": serialization.to_bytes(model_params),
        "optimizer": (serialization.to_bytes(opt_state)
                      if opt_state is not None else b""),
        "global_step": int(global_step),
        "metrics": metrics or {},
    }
    # container: a tiny json header + binary blobs; written to a temp file
    # then renamed so a preemption mid-save never corrupts the checkpoint
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        header = {
            "global_step": payload["global_step"],
            "metrics": payload["metrics"],
            "model_bytes": len(payload["model"]),
            "opt_bytes": len(payload["optimizer"]),
        }
        hdr = json.dumps(header).encode()
        f.write(len(hdr).to_bytes(8, "little"))
        f.write(hdr)
        f.write(payload["model"])
        f.write(payload["optimizer"])
    tmp.replace(path)


def load_checkpoint(path: str, model_template: Any,
                    opt_template: Any = None) -> Dict[str, Any]:
    """Returns {'model', 'optimizer' (or None), 'global_step', 'metrics'}.

    The format is sniffed: a reference (PyTorch ``torch.save``) checkpoint
    is transparently translated to this framework's params via
    ``utils.torch_ckpt`` — ``--load some_reference_ckpt.pth`` just works
    (SURVEY.md 3.5 asset portability). Optimizer state is only restored
    from native checkpoints (torch optimizer state is not optax-portable).
    """
    from .torch_ckpt import is_torch_checkpoint, load_torch_checkpoint
    p = Path(path)
    if not p.exists():
        p = _recover_orbax_sibling(p)
    if p.is_dir():
        return _load_orbax(p, model_template, opt_template)
    path = str(p)
    if is_torch_checkpoint(path):
        return load_torch_checkpoint(path, model_template)
    with open(path, "rb") as f:
        hlen = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(hlen).decode())
        model_b = f.read(header["model_bytes"])
        opt_b = f.read(header["opt_bytes"])
    out = {
        "model": serialization.from_bytes(model_template, model_b),
        "global_step": header["global_step"],
        "metrics": header["metrics"],
        "optimizer": None,
    }
    if opt_template is not None and opt_b:
        out["optimizer"] = serialization.from_bytes(opt_template, opt_b)
    return out


# ---------------------------------------------------------------------------
# orbax backend: <path>/ is a directory with `model/` and optional
# `optimizer/` StandardCheckpointer items plus a tiny `meta.json` (written
# LAST, so a dir containing meta.json is complete). Saved to a `.tmp`
# sibling; an existing dir is renamed aside to `.old` before the `.tmp` is
# promoted (rename can't replace a non-empty dir), then `.old` is removed.
# A preemption therefore always leaves at least one COMPLETE checkpoint:
# either at the final name, or at a sibling `_recover_orbax_sibling` in
# load_checkpoint promotes back automatically. Not the native format's
# single-syscall atomicity, but no longer a manual-rename recovery.
# ---------------------------------------------------------------------------

def _recover_orbax_sibling(p: Path) -> Path:
    """Nothing at ``p``: a preemption may have struck _save_orbax between
    renaming the old dir aside and promoting the new one. Promote the best
    complete sibling back: ``.tmp`` (the in-flight save — newer, and
    complete iff its meta.json landed, since meta is written last) wins
    over ``.old`` (the previous checkpoint)."""
    for suffix in (".tmp", ".old"):
        cand = p.with_suffix(p.suffix + suffix)
        if cand.is_dir() and (cand / "meta.json").exists():
            cand.rename(p)
            return p
    return p          # let the caller's open() raise the usual error


def _save_orbax(path, model_params, opt_state, global_step, metrics) -> None:
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    old = path.with_suffix(path.suffix + ".old")
    shutil.rmtree(tmp, ignore_errors=True)
    ckptr = ocp.StandardCheckpointer()
    try:
        ckptr.save(tmp / "model", model_params)
        if opt_state is not None:
            ckptr.save(tmp / "optimizer", opt_state)
        ckptr.wait_until_finished()
    finally:
        ckptr.close()
    (tmp / "meta.json").write_text(json.dumps(
        {"global_step": int(global_step), "metrics": metrics or {}}))
    if path.is_dir():
        shutil.rmtree(old, ignore_errors=True)   # stale .old from a crash
        path.rename(old)                         # keep a complete ckpt live
    elif path.exists():          # switching formats mid-experiment
        path.unlink()
    tmp.replace(path)
    shutil.rmtree(old, ignore_errors=True)


def _load_orbax(path, model_template, opt_template) -> Dict[str, Any]:
    import jax
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    meta = json.loads((path / "meta.json").read_text())
    ckptr = ocp.StandardCheckpointer()
    try:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                model_template)
        out = {
            "model": ckptr.restore(path / "model", abstract),
            "global_step": meta["global_step"],
            "metrics": meta["metrics"],
            "optimizer": None,
        }
        if opt_template is not None and (path / "optimizer").is_dir():
            out["optimizer"] = ckptr.restore(
                path / "optimizer",
                jax.tree.map(ocp.utils.to_shape_dtype_struct, opt_template))
    finally:
        ckptr.close()
    return out
