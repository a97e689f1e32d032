"""Decode solver: batched on-device beam search over the test set.

Capability parity with the reference's ``bin/test_asr.py`` (SURVEY.md 2.6):
builds a BeamDecoder from the ``decode:`` config block, loads an RNN-LM for
shallow fusion when ``lm_weight > 0``, decodes dev+test splits, writes
``output.csv`` (best hypothesis per utterance, ``idx\\thyp\\ttruth``) and the
full n-best ``beam.csv``, and reports WER/CER.

TPU-first: where the reference forces batch_size=1 and fans utterances out
to ``joblib`` CPU processes (its decode bottleneck, SURVEY.md 3.2), decoding
here is BATCHED inside one jitted program per bucket shape — the >=10x
throughput path — and each batch is SHARDED over the ('data',) mesh, so the
same CLI decodes on 1 chip or an 8-chip slice with no code change.
``--njobs`` is accepted but means host loader workers only.
"""
from __future__ import annotations

import time

import jax
import numpy as np

from .base import BaseSolver
from ..config import load_config
from ..data.dataset import load_dataset
from ..decode.beam import BeamDecoder
from ..decode.greedy import ctc_greedy
from ..models.asr import ASR
from ..models.lm import RNNLM
from ..ops.audio import create_transform
from ..parallel import mesh as pmesh
from ..utils.checkpoint import load_checkpoint


class Solver(BaseSolver):
    def __init__(self, config, paras, mode="test"):
        super().__init__(config, paras, mode)
        self.decode_cfg = dict(config.get("decode", {}))
        self.lm_weight = float(self.decode_cfg.get("lm_weight", 0.0))

    def load_data(self):
        (self.dv_set, self.tt_set, self.feat_dim, self.vocab_size,
         self.tokenizer, msg) = load_dataset(
            self.paras.njobs, True, False, False, mode="test",
            **self.config["data"])
        self.verbose(msg)

    def set_model(self):
        self.frontend, _ = create_transform(self.config["data"]["audio"])
        self.model = ASR(self.feat_dim, self.vocab_size, self.config["model"])
        self.params = self.model.init(jax.random.PRNGKey(self.paras.seed))
        plugin_cfg = self.config["model"].get("plugin")
        self.plugin = None
        self.plugin_params = None
        template = self.params
        if plugin_cfg and plugin_cfg.get("enabled", True):
            from ..models.plugin import EmbeddingRegularizer
            self.plugin = EmbeddingRegularizer(plugin_cfg, self.vocab_size,
                                               self.model.dec_dim,
                                               tokenizer=self.tokenizer)
            self.plugin_params = self.plugin.init(jax.random.PRNGKey(7))
            template = {"asr": self.params, "plugin": self.plugin_params}
        if self.paras.load:
            ck = load_checkpoint(self.paras.load, template)
            loaded = ck["model"]
            if self.plugin is not None:
                self.params = loaded["asr"]
                self.plugin_params = loaded["plugin"]
            else:
                self.params = loaded
            self.verbose(f"Loaded ASR ckpt {self.paras.load} "
                         f"@ step {ck['global_step']}")

        self.lm = None
        self.lm_params = None
        if self.lm_weight > 0:
            lm_cfg = load_config(self.decode_cfg["lm_config"])
            self.lm = RNNLM(self.vocab_size, lm_cfg["model"])
            self.lm_params = self.lm.init(jax.random.PRNGKey(0))
            ck = load_checkpoint(self.decode_cfg["lm_path"], self.lm_params)
            self.lm_params = ck["model"]
            self.verbose(f"Loaded LM ckpt for shallow fusion "
                         f"(weight {self.lm_weight})")

        # shard each decode batch over the ('data',) mesh; params replicated
        # (or tensor-parallel over the optional 'model' axis)
        mp = int(self.config.get("model_parallel", 1))
        self.mesh = pmesh.make_mesh(model_parallel=mp)
        self.n_dev = self.mesh.devices.size
        self.params = pmesh.shard_params(self.mesh, self.params)
        if self.lm_params is not None:
            self.lm_params = pmesh.shard_params(self.mesh, self.lm_params)
        if self.plugin_params is not None:
            self.plugin_params = pmesh.replicate_tree(self.mesh,
                                                      self.plugin_params)
        mesh_msg = (f"{self.n_dev // mp}x{mp} data x model-parallel"
                    if mp > 1 else f"{self.n_dev}x data-parallel")
        self.verbose(f"Decode mesh | {mesh_msg}")

        if self.model.enable_att:
            self.decoder = BeamDecoder(self.model, self.decode_cfg, self.lm,
                                       plugin=self.plugin)
            pp = self.plugin_params
            self._decode = jax.jit(
                lambda p, lp, w, wl: self.decoder.forward(
                    p, *self.frontend(w, wl), lm_params=lp,
                    plugin_params=pp))
        else:
            self.decoder = None  # CTC-only: greedy best-path

            def ctc_decode(p, w, wl):
                feat, feat_len = self.frontend(w, wl)
                enc, enc_len = self.model.encode(p, feat, feat_len)
                return ctc_greedy(self.model.ctc_output(p, enc)), enc_len

            self._decode = jax.jit(ctc_decode)

    def exec(self):
        for name, dataset in (("dev", self.dv_set), ("test", self.tt_set)):
            self._decode_set(name, dataset)

    def _decode_set(self, split_name: str, dataset):
        # output rows stream to disk per batch (constant memory over an
        # arbitrarily long split); error rates accumulate as running sums
        n_utts = 0
        wer_sum = cer_sum = 0.0
        wer_n = cer_n = 0
        audio_sec = 0.0
        t0 = time.time()
        out_file = self.outdir / f"{split_name}_output.csv"
        with open(out_file, "w", encoding="utf-8") as f_out, \
                open(self.outdir / f"{split_name}_beam.csv", "w",
                     encoding="utf-8") as f_beam:
            f_out.write("idx\thyp\ttruth\n")
            f_beam.write("idx\trank\tscore\thyp\n")
            wrote_nbest = False
            for sb, batch in pmesh.prefetch_to_device(
                    iter(dataset), self.mesh, self.n_dev):
                out = self._run_batch(sb, batch)
                B = len(batch["name"])
                for i in range(B):
                    if batch["text_len"][i] == 0:
                        continue
                    name = batch["name"][i]
                    ref = batch["text_raw"][i]
                    hyp = out["best"][i]
                    f_out.write(f"{name}\t{hyp}\t{ref}\n")
                    for k, (h, s) in enumerate(out["nbest"][i]):
                        f_beam.write(f"{name}\t{k}\t{s:.4f}\t{h}\n")
                        wrote_nbest = True
                    e = self._er_one(hyp, ref, "wer")
                    if e is not None:
                        wer_sum += e
                        wer_n += 1
                    e = self._er_one(hyp, ref, "cer")
                    if e is not None:
                        cer_sum += e
                        cer_n += 1
                    audio_sec += float(batch["wave_len"][i]) / 16000.0
                    n_utts += 1
            if not wrote_nbest:
                f_beam.write("\n")
        dt = time.time() - t0
        wer = wer_sum / wer_n if wer_n else 0.0
        cer = cer_sum / cer_n if cer_n else 0.0
        rtf_inv = audio_sec / dt if dt > 0 else 0.0
        self.verbose(
            f"{split_name}: {n_utts} utts | WER {wer:.3f} | CER {cer:.3f} | "
            f"{n_utts / dt:.2f} utts/sec | RTF-inverse {rtf_inv:.1f}x "
            f"realtime | wrote {out_file}")
        return {"wer": wer, "cer": cer, "utts_per_sec": n_utts / dt,
                "rtf_inverse": rtf_inv}

    def _er_one(self, h, r, mode):
        from ..utils.metrics import edit_distance
        hs, rs = (h.split(), r.split()) if mode == "wer" else (list(h),
                                                               list(r))
        if not rs:
            return None
        return edit_distance(hs, rs) / len(rs)

    def _run_batch(self, sb, batch):
        # sb: the batch padded to a mesh multiple and sharded over the mesh
        # by prefetch_to_device (dummy utts carry text_len==0 and are
        # dropped by the caller); batch: its host-side mirror
        B = len(batch["name"])
        wave, wave_len = sb["wave"], sb["wave_len"]
        if self.decoder is not None:
            out = self._decode(self.params, self.lm_params, wave, wave_len)
            tokens = np.asarray(out.tokens)
            lengths = np.asarray(out.lengths)
            scores = np.asarray(out.scores)
            best, nbest = [], []
            for i in range(B):
                cands = []
                for k in range(tokens.shape[1]):
                    ids = tokens[i, k, :lengths[i, k]].tolist()
                    cands.append((self.tokenizer.decode(ids),
                                  float(scores[i, k])))
                best.append(cands[0][0])
                nbest.append(cands)
            return {"best": best, "nbest": nbest}
        ids, enc_len = self._decode(self.params, wave, wave_len)
        ids, enc_len = np.asarray(ids), np.asarray(enc_len)
        best = [self.tokenizer.decode(ids[i, :enc_len[i]].tolist(),
                                      ignore_repeat=True) for i in range(B)]
        return {"best": best, "nbest": [[(b, 0.0)] for b in best]}
