"""ASR training solver.

Capability parity with the reference's ``bin/train_asr.py`` (SURVEY.md 2.4):
scheduled teacher forcing (linear ``tf_start -> tf_end`` over ``tf_step``),
loss = ``ctc_weight * CTC + (1-ctc_weight) * CE(ignore_index=0)``, curriculum
learning (first ``curriculum`` epochs in length-ascending order), periodic
``validate()`` with greedy decode + WER/CER for both heads, checkpoints
``best_att.pth``/``best_ctc.pth``/``latest.pth``, TensorBoard scalars and
attention-alignment images.

TPU-first: ONE jitted, donated train step contains the audio front-end, the
full model, the loss, the backward pass, grad clip, NaN step-skip, and the
optimizer update; batches are sharded over the ('data',) mesh so the same
step runs 1-chip or 8-chip with XLA-inserted gradient psums. Raw waveforms
are what crosses host->device.
"""
from __future__ import annotations

import math
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .base import BaseSolver
from ..data.dataset import load_dataset
from ..decode.greedy import att_greedy, ctc_greedy
from ..models.asr import ASR
from ..ops.audio import create_transform
from ..ops.ctc import ctc_loss
from ..optim import Optimizer
from ..parallel import mesh as pmesh
from ..utils.checkpoint import save_checkpoint, load_checkpoint
from ..utils.metrics import cal_er
from ..utils.util import feat_to_fig

DEV_STEP_RATIO = 1.2  # decode-step headroom during validation, as reference


def masked_ce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy with ignore_index=0 (pad), mean over valid tokens."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != 0).astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class Solver(BaseSolver):
    def __init__(self, config, paras, mode="train"):
        super().__init__(config, paras, mode)
        self.best_wer = {"att": 3.0, "ctc": 3.0}
        h = config["hparas"]
        self.max_step = int(h.get("max_step", 1000))
        self.valid_step = int(h.get("valid_step", 500))
        self.tf_start = float(h.get("tf_start", 1.0))
        self.tf_end = float(h.get("tf_end", 1.0))
        self.tf_step = int(h.get("tf_step", 1))
        self.curriculum = int(h.get("curriculum", 0))

    # ----------------------------------------------------------------- data
    def load_data(self):
        (self.tr_set, self.dv_set, self.feat_dim, self.vocab_size,
         self.tokenizer, msg) = load_dataset(
            self.paras.njobs, True, False, self.curriculum > 0,
            **self.config["data"])
        self.verbose(msg)

    # ---------------------------------------------------------------- model
    def set_model(self):
        self.frontend, _ = create_transform(self.config["data"]["audio"])
        self.model = ASR(self.feat_dim, self.vocab_size, self.config["model"])
        self.ctc_weight = self.model.ctc_weight
        rng = jax.random.PRNGKey(self.paras.seed)
        asr_params = self.model.init(rng)
        plugin_cfg = self.config["model"].get("plugin")
        if plugin_cfg and plugin_cfg.get("enabled", True):
            from ..models.plugin import EmbeddingRegularizer
            self.plugin = EmbeddingRegularizer(plugin_cfg, self.vocab_size,
                                               self.model.dec_dim,
                                               tokenizer=self.tokenizer)
            self.params = {"asr": asr_params,
                           "plugin": self.plugin.init(
                               jax.random.PRNGKey(self.paras.seed + 7))}
        else:
            self.plugin = None
            self.params = asr_params
        self.optimizer = Optimizer(self.config["hparas"],
                                   grad_clip=self.GRAD_CLIP)
        self.opt_state = self.optimizer.init(self.params)
        mp = int(self.config.get("model_parallel", 1))
        self.mesh = pmesh.make_mesh(model_parallel=mp)
        self.n_dev = self.mesh.devices.size
        self.params = pmesh.shard_params(self.mesh, self.params)
        self.opt_state = pmesh.shard_params(self.mesh, self.opt_state)
        n_params = sum(np.prod(l.shape) for l in
                       jax.tree_util.tree_leaves(self.params))
        mesh_msg = (f"{self.n_dev // mp}x{mp} data x model-parallel"
                    if mp > 1 else f"{self.n_dev}x data-parallel")
        self.verbose(
            f"ASR model | ctc_weight {self.ctc_weight} | params "
            f"{n_params / 1e6:.2f}M | mesh {mesh_msg}")
        if self.paras.load:
            ck = load_checkpoint(self.paras.load, self.params, self.opt_state)
            self.params = pmesh.shard_params(self.mesh, ck["model"])
            if ck["optimizer"] is not None:
                self.opt_state = pmesh.shard_params(self.mesh,
                                                    ck["optimizer"])
            self.step = ck["global_step"]
            self.verbose(f"Loaded ckpt {self.paras.load} @ step {self.step}")
        self._build_steps()

    def _build_steps(self):
        model, frontend, plugin = self.model, self.frontend, self.plugin
        ctc_w, tx = self.ctc_weight, self.optimizer.tx
        # fused Pallas CTC forward-backward on TPU; jnp scan elsewhere
        use_pallas = self.config["hparas"].get("use_pallas_ctc", "auto")
        if use_pallas == "auto":
            use_pallas = jax.default_backend() not in ("cpu",)
        if use_pallas:
            from ..ops.pallas.ctc_kernel import ctc_loss_pallas
            ctc_loss_fn = ctc_loss_pallas
        else:
            ctc_loss_fn = ctc_loss
        # --amp: bfloat16 model compute (MXU fast path); losses, CTC lattice
        # and the optimizer state stay float32 (reference's apex AMP analog)
        amp = bool(getattr(self.paras, "amp", False)
                   or self.config["hparas"].get("amp", False))

        def _cast_bf16(tree):
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, tree)

        aug_cfg = self.config["data"]["audio"].get("augment")
        tf_start, tf_end = self.tf_start, self.tf_end
        tf_step = max(self.tf_step, 1)

        def train_step(params, opt_state, step, wave, wave_len, text,
                       text_len, rng_base):
            # tf schedule + per-step rng derived ON DEVICE from the carried
            # step counter: the hot loop then sends zero per-step scalars
            # over the host->device link (each tiny transfer/dispatch is a
            # full RTT through the TPU tunnel)
            tf_rate = tf_start - (tf_start - tf_end) * jnp.clip(
                step.astype(jnp.float32) / tf_step, 0.0, 1.0)
            rng = jax.random.fold_in(rng_base, step)

            def loss_fn(p):
                asr_p = p["asr"] if plugin is not None else p
                feat, feat_len = frontend(wave, wave_len)
                if aug_cfg:
                    from ..ops.augment import spec_augment
                    # NOT fold_in(rng, small-i): split(k, n)[i] == fold_in(k,
                    # i) for threefry, and model.forward splits rng 3 ways —
                    # a small constant would make the SpecAugment draws
                    # bit-identical to the teacher-forcing coin stream
                    aug_rng = jax.random.fold_in(rng, 1_000_003)
                    feat = spec_augment(feat, feat_len, aug_rng, aug_cfg)
                if amp:
                    asr_p = _cast_bf16(asr_p)
                    feat = feat.astype(jnp.bfloat16)
                U = text.shape[1]
                ctc_out, enc_len, att_out, att_align, dec_states = \
                    model.forward(
                        asr_p, feat, feat_len, U, tf_rate, teacher=text,
                        train=True, rng=rng,
                        get_dec_state=plugin is not None)
                if amp:
                    ctc_out = (ctc_out.astype(jnp.float32)
                               if ctc_out is not None else None)
                    att_out = (att_out.astype(jnp.float32)
                               if att_out is not None else None)
                    dec_states = (dec_states.astype(jnp.float32)
                                  if dec_states is not None else None)
                valid = (text_len > 0)
                n_valid = jnp.maximum(jnp.sum(valid), 1)
                metrics = {}
                total = 0.0
                if ctc_out is not None:
                    nll = ctc_loss_fn(ctc_out, enc_len, text, text_len)
                    # torch CTCLoss(zero_infinity=True) semantics: a row
                    # with no feasible alignment (enc_len shorter than the
                    # label string's minimum path) returns NLL ~1e30; zero
                    # its loss term — the where also zeroes its cotangent,
                    # so neither backend's gradient garbage can leak
                    # (tests/test_ctc.py::test_infeasible_*)
                    ctc_valid = jnp.logical_and(valid, nll < 1e29)
                    per = nll / jnp.maximum(text_len, 1)
                    ctc_l = jnp.sum(jnp.where(ctc_valid, per, 0.0)) / n_valid
                    total = total + ctc_w * ctc_l
                    metrics["ctc_loss"] = ctc_l
                if att_out is not None:
                    att_l = masked_ce(att_out, text)
                    total = total + (1.0 - ctc_w) * att_l
                    metrics["att_loss"] = att_l
                if plugin is not None:
                    emb_l = plugin.loss(p["plugin"], dec_states, text)
                    total = total + emb_l
                    metrics["emb_loss"] = emb_l
                metrics["loss"] = total
                return total, metrics

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["tf_rate"] = tf_rate  # the schedule actually applied
            return params, opt_state, step + 1, metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

        def valid_step(params, wave, wave_len, text, text_len):
            asr_p = params["asr"] if plugin is not None else params
            plugin_p = params["plugin"] if plugin is not None else None
            feat, feat_len = frontend(wave, wave_len)
            U = text.shape[1]
            out = {}
            enc, enc_len = model.encode(asr_p, feat, feat_len)
            if model.enable_ctc:
                ctc_out = model.ctc_output(asr_p, enc)
                nll = ctc_loss(ctc_out, enc_len, text, text_len)
                out["ctc_pred"] = ctc_greedy(ctc_out)
                # zero_infinity: exclude infeasible rows (see train loss_fn)
                valid = jnp.logical_and(text_len > 0, nll < 1e29)
                per = nll / jnp.maximum(text_len, 1)
                out["ctc_loss"] = (jnp.sum(jnp.where(valid, per, 0.0))
                                   / jnp.maximum(jnp.sum(text_len > 0), 1))
            if model.enable_att:
                max_dec = int(math.ceil(U * DEV_STEP_RATIO))
                # decode-time emb fusion applies in validation greedy decode
                # too (reference behavior surface, SURVEY.md 2.18)
                out["att_pred"] = att_greedy(model, asr_p, enc, enc_len,
                                             max_dec, plugin=plugin,
                                             plugin_params=plugin_p, amp=amp)
                # teacher-forced pass for attention plots + att loss
                _, _, att_out, att_align, _ = model.forward(
                    asr_p, feat, feat_len, U, 1.0, teacher=text)
                out["att_loss"] = masked_ce(att_out, text)
                out["att_align"] = att_align
            return out

        self._valid_step = jax.jit(valid_step)

    # ----------------------------------------------------------------- exec
    def exec(self):
        self.verbose(f"Training from step {self.step} to {self.max_step}")
        rng_base = jax.random.PRNGKey(self.paras.seed + 1)
        step_dev = jnp.asarray(self.step, jnp.int32)   # device step counter
        epoch = 0
        # marginal (interval) throughput: count utts/time since the LAST
        # progress print, resetting after validation — a lifetime average
        # would fold eval, checkpoint and compile time into every number
        # and make step-time optimizations unmeasurable from the logs
        last_t = time.time()
        last_u = 0
        utts = 0
        while self.step < self.max_step:
            shuffle = epoch >= self.curriculum
            for sb, batch in pmesh.prefetch_to_device(
                    self.tr_set.epoch_iter(shuffle=shuffle), self.mesh,
                    self.n_dev):
                (self.params, self.opt_state, step_dev,
                 metrics) = self._train_step(
                    self.params, self.opt_state, step_dev, sb["wave"],
                    sb["wave_len"], sb["text"], sb["text_len"], rng_base)
                utts += int(np.sum(batch["text_len"] > 0))
                self.step += 1
                if self.step % self.PROGRESS_STEP == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    tf_rate = m.get("tf_rate", self.tf_start)
                    now = time.time()
                    rate = (utts - last_u) / max(now - last_t, 1e-9)
                    last_t, last_u = now, utts
                    self.progress(
                        f"loss {m.get('loss', 0):.3f} | "
                        f"ctc {m.get('ctc_loss', float('nan')):.3f} | "
                        f"att {m.get('att_loss', float('nan')):.3f} | "
                        f"grad {m.get('grad_norm', 0):.2f} | "
                        f"tf {tf_rate:.2f} | {rate:.1f} utt/s")
                    self.write_log("loss", {"tr_" + k: v for k, v in m.items()
                                            if "loss" in k})
                    self.write_log("speed", {"utts_per_sec": rate})
                    self.write_log("tf_rate", {"tf": tf_rate})
                if self.step % self.valid_step == 0:
                    self.validate()
                    last_t, last_u = time.time(), utts
                if self.step >= self.max_step:
                    break
            epoch += 1
        self.validate()
        self.log.close() if self._writer else None
        return self.best_wer

    # ------------------------------------------------------------- validate
    def validate(self):
        ers = {"att": [], "ctc": []}
        cers = {"att": [], "ctc": []}
        losses = {"att": [], "ctc": []}
        shown = 0
        for sb, batch in pmesh.prefetch_to_device(iter(self.dv_set),
                                                  self.mesh, self.n_dev):
            out = self._valid_step(self.params, sb["wave"],
                                   sb["wave_len"], sb["text"], sb["text_len"])
            out = jax.device_get(out)
            n_real = int(np.sum(batch["text_len"] > 0))
            truth = batch["text"][:n_real]
            for head in ("att", "ctc"):
                pred = out.get(f"{head}_pred")
                if pred is None:
                    continue
                ers[head].append(cal_er(self.tokenizer, pred[:n_real], truth,
                                        mode="wer", ctc=(head == "ctc")))
                cers[head].append(cal_er(self.tokenizer, pred[:n_real], truth,
                                         mode="cer", ctc=(head == "ctc")))
                if f"{head}_loss" in out:
                    losses[head].append(float(out[f"{head}_loss"]))
            if shown < self.DEV_N_EXAMPLE:
                for i in range(min(n_real, self.DEV_N_EXAMPLE - shown)):
                    pred = out.get("att_pred", out.get("ctc_pred"))
                    hyp = self.tokenizer.decode(
                        pred[i].tolist(),
                        ignore_repeat=("att_pred" not in out))
                    self.write_log(f"hyp_{shown}", hyp or "<empty>")
                    self.write_log(f"ref_{shown}", batch["text_raw"][i])
                    if "att_align" in out:
                        self.write_log(f"align_{shown}",
                                       feat_to_fig(out["att_align"][i, :, 0, :]))
                    shown += 1
        msg = []
        for head in ("att", "ctc"):
            if not ers[head]:
                continue
            wer = float(np.mean(ers[head]))
            cer = float(np.mean(cers[head]))
            self.write_log("wer", {f"dv_{head}": wer})
            self.write_log("cer", {f"dv_{head}": cer})
            if losses[head]:
                self.write_log("loss", {f"dv_{head}": float(np.mean(losses[head]))})
            msg.append(f"{head} WER {wer:.3f} CER {cer:.3f}")
            if wer < self.best_wer[head]:
                self.best_wer[head] = wer
                save_checkpoint(
                    self.ckpdir / f"best_{head}.pth", self.params,
                    self.opt_state, self.step, {"wer": wer, "cer": cer},
                    fmt=self.ckpt_format)
        save_checkpoint(self.ckpdir / "latest.pth", self.params,
                        self.opt_state, self.step,
                        {f"wer_{h}": self.best_wer[h] for h in self.best_wer},
                        fmt=self.ckpt_format)
        self.progress("DEV | " + " | ".join(msg))
