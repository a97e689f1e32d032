#!/usr/bin/env python
"""CPU-PyTorch baseline decoder (reference-style) for bench.py's vs_baseline.

Recreates the reference's decode path semantics (SURVEY.md 3.2): a torch LAS
model of the SAME dimensions as bench.py's flagship, decoded ONE UTTERANCE AT
A TIME with a per-hypothesis Python beam loop, numpy CTC prefix scoring, and
incremental RNN-LM fusion — i.e. the per-utterance/per-hypothesis/per-step
pure-Python triple loop that is the reference's decode bottleneck. (The
reference parallelizes over utterances with joblib; utts/sec here is
single-process — multiply by core count for the multi-process figure. This
sandbox has 1 CPU core, so they coincide.)

Writes bench_baseline.json: {"utts_per_sec": N}. Not a copy of reference
code — an independent implementation of the same algorithm in torch.
"""
import json
import math
import time
from pathlib import Path

import numpy as np
import torch
import torch.nn as nn

from bench import MODEL_CFG, LM_CFG, DECODE_CFG, VOCAB, SECS, make_waves
import sys
sys.path.insert(0, str(Path(__file__).resolve().parent))
from end_to_end_asr_pytorch_tpu.ops.audio import melscale_fbanks

N_UTTS = 3          # per-utterance CPU decode is slow; extrapolate
EOS = 1
NEG_INF = -1e30


class TorchLAS(nn.Module):
    def __init__(self):
        super().__init__()
        ecfg, dcfg, acfg = (MODEL_CFG["encoder"], MODEL_CFG["decoder"],
                            MODEL_CFG["attention"])
        self.vgg = nn.Sequential(
            nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(),
            nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
            nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2))
        enc_in = 128 * 10          # 40 mel bins / 4
        dims = ecfg["dim"]
        self.enc = nn.ModuleList()
        d = enc_in
        for h in dims:
            self.enc.append(nn.LSTM(d, h, bidirectional=True,
                                    batch_first=True))
            d = 2 * h
        self.enc_dim = d
        self.att_dim = acfg["dim"]
        ddim = dcfg["dim"]
        self.w_q = nn.Linear(ddim, self.att_dim)
        self.w_k = nn.Linear(self.enc_dim, self.att_dim)
        self.w_v = nn.Linear(self.enc_dim, self.att_dim)
        self.loc_conv = nn.Conv1d(1, acfg["loc_kernel_num"],
                                  acfg["loc_kernel_size"], padding="same")
        self.w_f = nn.Linear(acfg["loc_kernel_num"], self.att_dim)
        self.v_e = nn.Linear(self.att_dim, 1, bias=False)
        self.embed = nn.Embedding(VOCAB, ddim)
        self.dec = nn.LSTMCell(ddim + self.att_dim, ddim)
        self.char = nn.Linear(ddim, VOCAB)
        self.ctc = nn.Linear(self.enc_dim, VOCAB)
        self.temperature = acfg["temperature"]

    def encode(self, feat):
        x = feat.unsqueeze(1)                       # (1, 1, T, 40)
        x = self.vgg(x)                             # (1, 128, T/4, 10)
        x = x.permute(0, 2, 1, 3).flatten(2)        # (1, T/4, 1280)
        for l in self.enc:
            x, _ = l(x)
        return x

    def att_step(self, q, keys, vals, prev_align):
        f = self.loc_conv(prev_align.unsqueeze(1)).transpose(1, 2)
        e = self.v_e(torch.tanh(self.w_q(q).unsqueeze(1) + keys
                                + self.w_f(f))).squeeze(-1)
        a = torch.softmax(e / self.temperature, dim=-1)
        ctx = torch.bmm(a.unsqueeze(1), vals).squeeze(1)
        return ctx, a


class NumpyCTCPrefix:
    """Reference-style per-hypothesis CTC prefix scorer (numpy time loop)."""

    def __init__(self, logp):                       # (T, V)
        self.x = logp
        self.T = logp.shape[0]

    def initial_state(self):
        r = np.full((self.T, 2), NEG_INF)
        r[0, 1] = self.x[0, 0]
        for t in range(1, self.T):
            r[t, 1] = r[t - 1, 1] + self.x[t, 0]
        return r

    def __call__(self, g, r_prev, cands):
        out_psi, out_r = [], []
        for c in cands:
            r = np.full((self.T, 2), NEG_INF)
            phi_prev = 0.0 if len(g) == 0 else NEG_INF
            psi = NEG_INF
            for t in range(self.T):
                phi = (r_prev[t - 1, 1] if (g and c == g[-1]) else
                       np.logaddexp(r_prev[t - 1, 0], r_prev[t - 1, 1])
                       ) if t > 0 else phi_prev
                xs = self.x[t, c]
                r[t, 0] = np.logaddexp(r[t - 1, 0] if t else NEG_INF,
                                       phi) + xs
                r[t, 1] = np.logaddexp(r[t - 1, 1] if t else NEG_INF,
                                       r[t - 1, 0] if t else NEG_INF
                                       ) + self.x[t, 0]
                psi = np.logaddexp(psi, phi + xs)
            out_psi.append(psi)
            out_r.append(r)
        return out_psi, out_r

    def final(self, r):
        return float(np.logaddexp(r[-1, 0], r[-1, 1]))


@torch.no_grad()
def decode_one(model, lm, feat, mel):
    K = DECODE_CFG["beam_size"]
    cw, lw = DECODE_CFG["ctc_weight"], DECODE_CFG["lm_weight"]
    aw = 1.0 - cw
    enc = model.encode(feat)
    T = enc.shape[1]
    keys, vals = model.w_k(enc), model.w_v(enc)
    ctc_lp = torch.log_softmax(model.ctc(enc), -1)[0].numpy()
    scorer = NumpyCTCPrefix(ctc_lp)
    L = max(1, int(math.ceil(DECODE_CFG["max_len_ratio"] * T)))
    min_len = math.ceil(DECODE_CFG["min_len_ratio"] * T)

    h = torch.zeros(1, model.dec.hidden_size)
    c = torch.zeros(1, model.dec.hidden_size)
    lm_h = (torch.zeros(1, 1, LM_CFG["dim"]), torch.zeros(1, 1, LM_CFG["dim"]))
    align = torch.ones(1, T) / T
    hyps = [{"g": [], "score_att": 0.0, "score_lm": 0.0, "h": h, "c": c,
             "lm": lm_h, "align": align, "r": scorer.initial_state()}]
    finished = []
    for t in range(L + 1):
        cands = []
        for hyp in hyps:
            prev = hyp["g"][-1] if hyp["g"] else EOS
            emb = model.embed(torch.tensor([prev]))
            ctx, a = model.att_step(hyp["h"], keys, vals, hyp["align"])
            h2, c2 = model.dec(torch.cat([emb, ctx], -1),
                               (hyp["h"], hyp["c"]))
            logp = torch.log_softmax(model.char(h2), -1)[0].numpy()
            lm_in = model.embed.weight.new_tensor([[prev]]).long()
            lm_out, lm_state = lm["rnn"](lm["emb"](lm_in), hyp["lm"])
            lm_logp = torch.log_softmax(lm["out"](lm_out[0, 0]), -1).numpy()
            # eos finalization
            base = aw * hyp["score_att"] + lw * hyp["score_lm"]
            if t + 1 >= min_len or t >= L:
                tot = (base + aw * logp[EOS] + cw * scorer.final(hyp["r"])
                       + lw * lm_logp[EOS])
                finished.append((tot / (t + 1), hyp["g"]))
            if t >= L:
                continue
            order = np.argsort(-(aw * logp + lw * lm_logp))
            top = [v for v in order if v > 1][:K]
            psis, rs = scorer(hyp["g"], hyp["r"], top)
            for v, psi, r in zip(top, psis, rs):
                tot = (base + aw * logp[v] + cw * psi + lw * lm_logp[v])
                cands.append((tot, hyp, v, r, logp[v], lm_logp[v],
                              (h2, c2), lm_state, a))
        cands.sort(key=lambda x: -x[0])
        new_hyps = []
        for tot, hyp, v, r, lp_a, lp_l, state, lm_state, a in cands[:K]:
            new_hyps.append({
                "g": hyp["g"] + [int(v)],
                "score_att": hyp["score_att"] + lp_a,
                "score_lm": hyp["score_lm"] + lp_l,
                "h": state[0], "c": state[1], "lm": lm_state,
                "align": a, "r": r})
        hyps = new_hyps
        if not hyps:
            break
    finished.sort(key=lambda x: -x[0])
    return finished[0] if finished else (0.0, [])


def main():
    torch.manual_seed(0)
    torch.set_num_threads(1)
    model = TorchLAS().eval()
    lm = {"emb": nn.Embedding(VOCAB, LM_CFG["emb_dim"]),
          "rnn": nn.LSTM(LM_CFG["emb_dim"], LM_CFG["dim"], batch_first=True),
          "out": nn.Linear(LM_CFG["dim"], VOCAB)}

    mel = torch.from_numpy(melscale_fbanks(201, 40, 16000))
    waves, lens = make_waves(N_UTTS)
    feats = []
    for i in range(N_UTTS):
        wav = torch.from_numpy(waves[i:i + 1, :lens[i]])
        win = torch.hann_window(400)
        spec = torch.stft(wav, 400, 160, window=win, center=True,
                          pad_mode="reflect", return_complex=True)
        power = (spec.abs() ** 2).transpose(1, 2)
        fb = torch.log(power @ mel + 1e-10)
        fb = (fb - fb.mean(1, keepdim=True)) / (fb.var(1, keepdim=True)
                                                + 1e-10).sqrt()
        t4 = (fb.shape[1] // 4) * 4
        feats.append(fb[:, :t4])

    t0 = time.perf_counter()
    for f in feats:
        decode_one(model, lm, f, mel)
    dt = time.perf_counter() - t0
    ups = N_UTTS / dt
    out = {"utts_per_sec": ups, "n_utts": N_UTTS, "secs_per_utt": dt / N_UTTS,
           "note": "reference-style per-utterance CPU beam decode, "
                   "1 process, 1 thread"}
    Path("bench_baseline.json").write_text(json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
