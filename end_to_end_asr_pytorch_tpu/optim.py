"""Optimizer wrapper: optax chain mirroring the reference's ``src/optim.py``
(SURVEY.md 2.14): any torch.optim-style optimizer name (Adadelta/Adam/SGD),
``lr_scheduler: 'fixed' | 'warmup'`` (Noam-style inverse-sqrt warmup), global
grad-norm clipping, and the reference's NaN-gradient step-skip
(``BaseSolver.backward``, SURVEY.md 2.3) via ``optax.apply_if_finite``.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import optax


def _warmup_schedule(lr: float, warmup_step: int = 4000):
    """Noam inverse-sqrt: lr * min(step^-0.5, step * warmup^-1.5) * warmup^0.5
    normalized so the peak (at step=warmup) equals ``lr``."""
    def sched(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return lr * jnp.minimum(s ** -0.5, s * warmup_step ** -1.5) * (
            warmup_step ** 0.5)
    return sched


class Optimizer:
    """Builds the optax transform; exposes ``init``/``step``/``lr_at``."""

    def __init__(self, hparas: Dict[str, Any], grad_clip: float = 5.0,
                 nan_skip: bool = True):
        opt_name = str(hparas.get("optimizer", "Adadelta")).lower()
        lr = float(hparas.get("lr", 1.0))
        eps = float(hparas.get("eps", 1e-8))
        sched_name = str(hparas.get("lr_scheduler", "fixed")).lower()
        warmup = int(hparas.get("warmup_step", 4000))

        if sched_name == "warmup":
            self.schedule = _warmup_schedule(lr, warmup)
        elif sched_name == "fixed":
            self.schedule = lambda step: jnp.asarray(lr, jnp.float32)
        else:
            raise NotImplementedError(f"lr_scheduler {sched_name!r}")

        if opt_name == "adadelta":
            base = optax.adadelta(learning_rate=self.schedule, eps=eps)
        elif opt_name == "adam":
            base = optax.adam(learning_rate=self.schedule, eps=eps)
        elif opt_name == "adamw":
            base = optax.adamw(learning_rate=self.schedule, eps=eps)
        elif opt_name == "sgd":
            base = optax.sgd(learning_rate=self.schedule,
                             momentum=float(hparas.get("momentum", 0.0)))
        else:
            raise NotImplementedError(f"optimizer {opt_name!r}")

        tx = optax.chain(optax.clip_by_global_norm(grad_clip), base)
        if nan_skip:
            # reference behavior: a non-finite grad skips the step entirely
            tx = optax.apply_if_finite(tx, max_consecutive_errors=10 ** 8)
        self.tx = tx

    def init(self, params):
        return self.tx.init(params)

    def step(self, grads, opt_state, params) -> Tuple[Any, Any]:
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def lr_at(self, step: int) -> float:
        return float(self.schedule(jnp.asarray(step)))
