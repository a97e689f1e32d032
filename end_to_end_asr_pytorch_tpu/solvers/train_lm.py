"""RNN-LM training solver.

Capability parity with the reference's ``bin/train_lm.py`` (SURVEY.md 2.5):
text-only dataset, next-token cross-entropy, perplexity logging, best-ppx
checkpoint. The trained LM feeds shallow fusion in the decode solver.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .base import BaseSolver
from ..data.dataset import load_textset
from ..models.lm import RNNLM
from ..optim import Optimizer
from ..parallel import mesh as pmesh
from ..utils.checkpoint import save_checkpoint, load_checkpoint
from ..utils.text import EOS_IDX


class Solver(BaseSolver):
    def __init__(self, config, paras, mode="train"):
        super().__init__(config, paras, mode)
        h = config["hparas"]
        self.max_step = int(h.get("max_step", 1000))
        self.valid_step = int(h.get("valid_step", 500))
        self.best_ppx = float("inf")

    def load_data(self):
        (self.tr_set, self.dv_set, self.vocab_size, self.tokenizer,
         msg) = load_textset(self.paras.njobs, True, False,
                             self.config["data"]["corpus"],
                             self.config["data"]["text"])
        self.verbose(msg)

    def set_model(self):
        self.lm = RNNLM(self.vocab_size, self.config["model"])
        self.params = self.lm.init(jax.random.PRNGKey(self.paras.seed))
        self.optimizer = Optimizer(self.config["hparas"],
                                   grad_clip=self.GRAD_CLIP)
        self.opt_state = self.optimizer.init(self.params)
        mp = int(self.config.get("model_parallel", 1))
        self.mesh = pmesh.make_mesh(model_parallel=mp)
        self.n_dev = self.mesh.devices.size
        self.params = pmesh.shard_params(self.mesh, self.params)
        self.opt_state = pmesh.shard_params(self.mesh, self.opt_state)
        if self.paras.load:
            ck = load_checkpoint(self.paras.load, self.params, self.opt_state)
            self.params = pmesh.shard_params(self.mesh, ck["model"])
            if ck["optimizer"] is not None:
                self.opt_state = pmesh.shard_params(self.mesh, ck["optimizer"])
            self.step = ck["global_step"]
        self._build_steps()

    def _nll(self, params, text, text_len, train, rng):
        """Next-token NLL: input = [sos, t_0..t_{U-2}], target = t (inc eos).
        Returns (sum nll, token count)."""
        B, U = text.shape
        sos = jnp.full((B, 1), EOS_IDX, jnp.int32)
        inp = jnp.concatenate([sos, text[:, :-1]], axis=1)
        logits = self.lm.forward(params, inp, text_len, train=train, rng=rng)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, text[..., None], axis=-1)[..., 0]
        mask = (jnp.arange(U)[None, :] < text_len[:, None]).astype(nll.dtype)
        return jnp.sum(nll * mask), jnp.sum(mask)

    def _build_steps(self):
        tx = self.optimizer.tx

        def train_step(params, opt_state, step, text, text_len, rng_base):
            # per-step rng derived on device (see train_asr: no per-step
            # host->device scalar traffic in the hot loop)
            rng = jax.random.fold_in(rng_base, step)

            def loss_fn(p):
                total, count = self._nll(p, text, text_len, True, rng)
                return total / jnp.maximum(count, 1.0)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, step + 1, loss

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

        def valid_step(params, text, text_len):
            return self._nll(params, text, text_len, False, None)

        self._valid_step = jax.jit(valid_step)

    def exec(self):
        self.verbose(f"LM training from step {self.step} to {self.max_step}")
        rng_base = jax.random.PRNGKey(self.paras.seed + 1)
        step_dev = jnp.asarray(self.step, jnp.int32)
        t0, toks = time.time(), 0
        while self.step < self.max_step:
            for sb, batch in pmesh.prefetch_to_device(
                    iter(self.tr_set), self.mesh, self.n_dev):
                self.params, self.opt_state, step_dev, loss = \
                    self._train_step(self.params, self.opt_state, step_dev,
                                     sb["text"], sb["text_len"], rng_base)
                toks += int(batch["text_len"].sum())
                self.step += 1
                if self.step % self.PROGRESS_STEP == 0:
                    l = float(loss)
                    dt = time.time() - t0
                    self.progress(f"lm loss {l:.3f} | ppx {np.exp(l):.1f} | "
                                  f"{toks / dt:.0f} tok/s")
                    self.write_log("ppx", {"tr": float(np.exp(l))})
                if self.step % self.valid_step == 0:
                    self.validate()
                if self.step >= self.max_step:
                    break
        self.validate()
        return self.best_ppx

    def validate(self):
        total, count = 0.0, 0.0
        for sb, batch in pmesh.prefetch_to_device(iter(self.dv_set),
                                                  self.mesh, self.n_dev):
            t, c = self._valid_step(self.params, sb["text"], sb["text_len"])
            total += float(t)
            count += float(c)
        ppx = float(np.exp(total / max(count, 1.0)))
        self.write_log("ppx", {"dv": ppx})
        self.progress(f"DEV | lm ppx {ppx:.2f}")
        if ppx < self.best_ppx:
            self.best_ppx = ppx
            save_checkpoint(self.ckpdir / "best_ppx.pth", self.params,
                            self.opt_state, self.step, {"ppx": ppx},
                            fmt=self.ckpt_format)
        save_checkpoint(self.ckpdir / "latest.pth", self.params,
                        self.opt_state, self.step, {"ppx": ppx},
                        fmt=self.ckpt_format)
