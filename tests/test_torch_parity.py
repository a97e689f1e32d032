"""Cross-implementation parity oracle: torch vs the JAX/TPU stack.

Round-1 verdict item 4: with `/root/reference` empty, the strongest available
substitute for reference parity is an independent PyTorch implementation of
the same model semantics (torch.stft, nn.Conv2d, nn.LSTM/GRU, per-step Python
loops — the reference's building blocks), sharing ONE set of weights with the
JAX model through an explicit translation layer.

Covers the five BASELINE.json config shapes:
  1. fbank + pyramidal-BLSTM LAS (greedy decode)     -> LAS-512 scale
  2. CTC-only encoder (ctc_weight=1.0)               -> encoder + CTC head
  3. joint CTC-attention (teacher-forced logits)     -> per-step decoder logits
  4. VGG prenet + location-aware attention           -> conv/pool conventions
  5. beam search with RNN-LM shallow fusion          -> decoded sequences

and the front-end configs (fbank / MFCC+deltas / linear) against a
torch.stft composition (torchaudio itself is not installed in this sandbox;
conventions follow its documented defaults).
"""
import math
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.models.asr import ASR
from end_to_end_asr_pytorch_tpu.models.lm import RNNLM
from end_to_end_asr_pytorch_tpu.ops.audio import (AudioFrontend, dct_matrix,
                                                  delta_filter,
                                                  melscale_fbanks)

torch.manual_seed(0)
torch.set_num_threads(1)
EOS = 1


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.array(x))  # copy: jax arrays are read-only


# =====================================================================
# torch front-end (torch.stft composition, torchaudio conventions)
# =====================================================================
def torch_frontend(wave: torch.Tensor, cfg: dict) -> torch.Tensor:
    sr = cfg.get("sample_rate", 16000)
    n_fft = int(sr * cfg.get("frame_length", 25) / 1000)
    hop = int(sr * cfg.get("frame_shift", 10) / 1000)
    feat_type = cfg.get("feat_type", "fbank")
    feat_dim = int(cfg.get("feat_dim", 40))
    win = torch.hann_window(n_fft, periodic=True)
    spec = torch.stft(wave, n_fft, hop, window=win, center=True,
                      pad_mode="reflect", return_complex=True)
    power = (spec.abs() ** 2).transpose(1, 2)          # (B, T, bins)
    if feat_type in ("fbank", "mfcc"):
        n_mels = (feat_dim if feat_type == "fbank"
                  else int(cfg.get("n_mels", max(feat_dim, 40))))
        mel = t(melscale_fbanks(n_fft // 2 + 1, n_mels, sr))
        feat = torch.log(power @ mel + 1e-10)
        if feat_type == "mfcc":
            feat = feat @ t(dct_matrix(n_mels, feat_dim))
    elif feat_type == "linear":
        feat = torch.log(power + 1e-10)
    else:
        raise NotImplementedError(feat_type)
    # deltas (torchaudio compute_deltas: regression filter, replicate pad)
    order = int(cfg.get("delta_order", 0))
    w = int(cfg.get("delta_window_size", 2))
    if order > 0:
        filt = t(delta_filter(w))  # same helper policy as mel/DCT above
        outs, cur = [feat], feat
        D = feat.shape[-1]
        for _ in range(order):
            x = F.pad(cur.transpose(1, 2), (w, w), mode="replicate")
            cur = F.conv1d(x, filt.view(1, 1, -1).expand(D, 1, -1),
                           groups=D).transpose(1, 2)
            outs.append(cur)
        feat = torch.cat(outs, dim=-1)
    if cfg.get("cmvn", True):
        mean = feat.mean(1, keepdim=True)
        var = feat.var(1, keepdim=True, unbiased=False)
        feat = (feat - mean) / torch.sqrt(var + 1e-10)
    return feat


# =====================================================================
# torch encoder from translated JAX weights
# =====================================================================
def torch_vgg(p, enc, x: torch.Tensor) -> torch.Tensor:
    """x (B, T, D) -> (B, T/4, 128 * freq/4); weights from VGGParams."""
    vgg = enc.prenet
    B, T, D = x.shape
    # (B, T, in_ch, freq) -> NCHW (B, in_ch, T, freq)
    h = x.reshape(B, T, vgg.in_ch, vgg.freq).permute(0, 2, 1, 3)

    def conv(h, k, b):  # k HWIO -> torch OIHW
        return F.conv2d(h, t(k).permute(3, 2, 0, 1), t(b), padding=1)

    h = F.relu(conv(h, p.k1, p.b1))
    h = F.relu(conv(h, p.k2, p.b2))
    h = F.max_pool2d(h, 2)
    h = F.relu(conv(h, p.k3, p.b3))
    h = F.relu(conv(h, p.k4, p.b4))
    h = F.max_pool2d(h, 2)
    # (B, C, T4, F4) -> (B, T4, C*F4) channel-major
    return h.permute(0, 2, 1, 3).flatten(2)


def torch_cnn(p, enc, x: torch.Tensor) -> torch.Tensor:
    # JAX kernel (k, in, out) WIO -> torch conv1d (out, in, k)
    h = F.relu(F.conv1d(x.transpose(1, 2), t(p.k1).permute(2, 1, 0), t(p.b1),
                        stride=2, padding=1).transpose(1, 2))
    h = F.relu(F.conv1d(h.transpose(1, 2), t(p.k2).permute(2, 1, 0), t(p.b2),
                        stride=2, padding=1).transpose(1, 2))
    return h


def make_torch_rnn(module: str, in_dim: int, dim: int, bidir: bool, fwd, bwd):
    cls = torch.nn.LSTM if module == "lstm" else torch.nn.GRU
    rnn = cls(in_dim, dim, batch_first=True, bidirectional=bidir)
    with torch.no_grad():
        for suffix, w in (("", fwd),) + ((("_reverse", bwd),) if bidir else ()):
            getattr(rnn, f"weight_ih_l0{suffix}").copy_(t(w.w_ih).T)
            getattr(rnn, f"weight_hh_l0{suffix}").copy_(t(w.w_hh).T)
            if module == "lstm":
                getattr(rnn, f"bias_ih_l0{suffix}").copy_(t(w.b))
                getattr(rnn, f"bias_hh_l0{suffix}").zero_()
            else:
                getattr(rnn, f"bias_ih_l0{suffix}").copy_(t(w.b_ih))
                getattr(rnn, f"bias_hh_l0{suffix}").copy_(t(w.b_hh))
    return rnn


@torch.no_grad()
def torch_encode(model: ASR, params, feat: torch.Tensor) -> torch.Tensor:
    """Full-length (unpadded) torch encoder forward."""
    enc = model.encoder
    p = params.encoder
    h = feat
    if enc.prenet_type == "vgg":
        h = torch_vgg(p.prenet, enc, h)
    elif enc.prenet_type == "cnn":
        h = torch_cnn(p.prenet, enc, h)
    for layer, lp in zip(enc.layers, p.layers):
        rnn = make_torch_rnn(layer.module, layer.in_dim, layer.dim,
                             layer.bidirection, lp.fwd, lp.bwd)
        h, _ = rnn(h)
        if lp.ln_scale is not None:
            h = F.layer_norm(h, (h.shape[-1],), t(lp.ln_scale), t(lp.ln_bias),
                             eps=1e-5)
        if lp.w_proj is not None:
            h = torch.tanh(h @ t(lp.w_proj) + t(lp.b_proj))
        r = layer.sample_rate
        if r > 1:
            if layer.sample_style == "drop":
                h = h[:, ::r]
            else:
                B, T, D = h.shape
                Tt = (T // r) * r
                h = h[:, :Tt].reshape(B, Tt // r, D * r)
    return h


# =====================================================================
# torch attention + decoder step (functional, reference-style loop)
# =====================================================================
@torch.no_grad()
def torch_att_step(att, ap, enc: torch.Tensor, query: torch.Tensor,
                   prev_align: torch.Tensor):
    """enc (B,T,Dk), query (B,Dq), prev_align (B,H,T) -> ctx, align."""
    B, T, _ = enc.shape
    H, d = att.num_head, att.dim
    keys = (enc @ t(ap.w_k)).reshape(B, T, H, d).permute(0, 2, 1, 3)
    q = (query @ t(ap.w_q)).reshape(B, H, d)
    if att.mode == "dot":
        energy = torch.einsum("bhd,bhtd->bht", q, keys)
    else:
        a = prev_align.sum(1, keepdim=True)                  # (B, 1, T)
        # JAX kernel (k, 1, F) WIO -> torch conv1d (F, 1, k), SAME padding
        kern = t(ap.loc_conv).permute(2, 1, 0)
        pad = (kern.shape[-1] - 1) // 2
        f = F.conv1d(a, kern, padding=pad).transpose(1, 2)   # (B, T, F)
        f = f @ t(ap.w_f)                                    # (B, T, d)
        qb = q + t(ap.bias).reshape(H, d)
        tanh_arg = qb[:, :, None, :] + keys + f[:, None, :, :]
        energy = torch.einsum("bhtd,hd->bht", torch.tanh(tanh_arg),
                              t(ap.v_energy))
    align = torch.softmax(energy / att.temperature, dim=-1)
    if ap.w_v is not None:
        vals = (enc @ t(ap.w_v)).reshape(B, T, H, att.v_dim).permute(0, 2, 1, 3)
        ctx = torch.einsum("bht,bhtv->bhv", align, vals).reshape(B, -1)
    else:
        ctx = torch.einsum("bht,btv->bhv", align, enc).reshape(B, -1)
    if ap.w_merge is not None:
        ctx = ctx @ t(ap.w_merge)
    return ctx, align


def make_torch_cells(module: str, cells, in_dim: int, dim: int):
    out = []
    d = in_dim
    for w in cells:
        if module == "lstm":
            cell = torch.nn.LSTMCell(d, dim)
            with torch.no_grad():
                cell.weight_ih.copy_(t(w.w_ih).T)
                cell.weight_hh.copy_(t(w.w_hh).T)
                cell.bias_ih.copy_(t(w.b))
                cell.bias_hh.zero_()
        else:
            cell = torch.nn.GRUCell(d, dim)
            with torch.no_grad():
                cell.weight_ih.copy_(t(w.w_ih).T)
                cell.weight_hh.copy_(t(w.w_hh).T)
                cell.bias_ih.copy_(t(w.b_ih))
                cell.bias_hh.copy_(t(w.b_hh))
        out.append(cell)
        d = dim
    return out


@torch.no_grad()
def torch_decode_loop(model: ASR, params, enc: torch.Tensor, n_steps: int,
                      teacher=None):
    """Reference-style per-step decode loop. teacher (B, U) int64 or None
    (greedy self-feed with eos latching). Returns (logits (B,U,V), ids)."""
    B, T, _ = enc.shape
    att, dec = model.attention, model.decoder
    cells = make_torch_cells(dec.module, params.decoder.cells, dec.in_dim,
                             dec.dim)
    hs = [torch.zeros(B, dec.dim) for _ in range(dec.layers)]
    cs = [torch.zeros(B, dec.dim) for _ in range(dec.layers)]
    align = torch.full((B, att.num_head, T), 1.0 / T)
    embed, char_w, char_b = t(params.embed), t(params.char_w), t(params.char_b)
    prev = torch.full((B,), EOS, dtype=torch.long)
    done = torch.zeros(B, dtype=torch.bool)
    logits_seq, ids_seq = [], []
    for step in range(n_steps):
        query = hs[-1]
        ctx, align = torch_att_step(att, params.attention, enc, query, align)
        emb = embed[prev]
        inp = torch.cat([emb, ctx], dim=-1)
        for i, cell in enumerate(cells):
            if dec.module == "lstm":
                hs[i], cs[i] = cell(inp, (hs[i], cs[i]))
            else:
                hs[i] = cell(inp, hs[i])
            inp = hs[i]
        logits = inp @ char_w + char_b
        logits_seq.append(logits)
        pred = logits.argmax(-1)
        pred = torch.where(done, torch.full_like(pred, EOS), pred)
        ids_seq.append(pred)
        done = done | (pred == EOS)
        if teacher is not None:
            prev = teacher[:, step]
        else:
            prev = pred
    return torch.stack(logits_seq, 1), torch.stack(ids_seq, 1)


# =====================================================================
# config + input helpers
# =====================================================================
AUDIO = {"feat_type": "fbank", "feat_dim": 40, "cmvn": True}
V = 31


def model_cfg(prenet="", dims=(512, 512), sample_rate=(2, 2), ctc_weight=0.5,
              att_mode="loc", att_dim=300, dec_dim=512, module="LSTM",
              layer_norm=False, proj=False, num_head=1,
              sample_style="drop"):
    n = len(dims)
    return {
        "ctc_weight": ctc_weight,
        "encoder": {"prenet": prenet, "module": module, "bidirection": True,
                    "dim": list(dims), "dropout": [0.0] * n,
                    "layer_norm": [layer_norm] * n, "proj": [proj] * n,
                    "sample_rate": list(sample_rate),
                    "sample_style": sample_style},
        "attention": {"mode": att_mode, "dim": att_dim, "num_head": num_head,
                      "temperature": 0.5, "v_proj": True,
                      "loc_kernel_size": 25, "loc_kernel_num": 10},
        "decoder": {"module": module, "dim": dec_dim, "layer": 1,
                    "dropout": 0.0},
    }


def make_feat(B=2, T=128, audio_cfg=AUDIO, seed=0):
    """Full-length waveforms through the JAX front-end (f32)."""
    rng = np.random.RandomState(seed)
    S = (T - 1) * 160
    wave = (rng.randn(B, S) * 0.1).astype(np.float32)
    fe = AudioFrontend(dict(audio_cfg, use_pallas=False))
    feat, feat_len = fe(jnp.asarray(wave), jnp.full((B,), S, jnp.int32))
    return np.asarray(feat), np.asarray(feat_len)


# =====================================================================
# (a) front-end parity
# =====================================================================
@pytest.mark.parametrize("cfg", [
    {"feat_type": "fbank", "feat_dim": 40, "cmvn": True},
    {"feat_type": "fbank", "feat_dim": 80, "cmvn": False},
    {"feat_type": "mfcc", "feat_dim": 13, "delta_order": 2,
     "delta_window_size": 2, "cmvn": True},
    {"feat_type": "linear", "feat_dim": 0, "cmvn": True},
], ids=["fbank40", "fbank80-nocmvn", "mfcc13-delta2", "linear"])
def test_frontend_matches_torch(cfg):
    rng = np.random.RandomState(1)
    S = 16000
    wave = (rng.randn(2, S) * 0.2).astype(np.float32)
    fe = AudioFrontend(dict(cfg, use_pallas=False))
    feat, feat_len = fe(jnp.asarray(wave), jnp.full((2,), S, jnp.int32))
    ref = torch_frontend(t(wave), cfg).numpy()
    assert np.asarray(feat).shape == ref.shape
    np.testing.assert_allclose(np.asarray(feat), ref, rtol=2e-4, atol=2e-4)


# =====================================================================
# (b) encoder parity
# =====================================================================
@pytest.mark.parametrize("cfg,audio", [
    (model_cfg(dims=(512, 512), sample_rate=(2, 2)), AUDIO),     # pBLSTM-512
    (model_cfg(prenet="vgg", dims=(256, 256), sample_rate=(1, 1)), AUDIO),
    (model_cfg(prenet="cnn", dims=(128,), sample_rate=(2,),
               module="GRU"), AUDIO),
    (model_cfg(dims=(128, 128), sample_rate=(1, 2), layer_norm=True,
               proj=True, sample_style="concat"), AUDIO),
    (model_cfg(prenet="vgg", dims=(128,), sample_rate=(1,)),
     {"feat_type": "mfcc", "feat_dim": 13, "delta_order": 2, "cmvn": True}),
], ids=["pblstm512", "vgg", "cnn-gru", "lnproj-concat", "vgg-mfcc39"])
def test_encoder_matches_torch(cfg, audio):
    feat, feat_len = make_feat(B=2, T=128, audio_cfg=audio)
    model = ASR(feat.shape[-1], V, cfg)
    params = model.init(jax.random.PRNGKey(0))
    enc, enc_len = model.encode(params, jnp.asarray(feat),
                                jnp.asarray(feat_len))
    ref = torch_encode(model, params, t(feat)).numpy()
    ours = np.asarray(enc)[:, :ref.shape[1]]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_ctc_head_matches_torch():
    """Config 2: CTC-only. Encoder + CTC log-softmax head + greedy path."""
    cfg = model_cfg(ctc_weight=1.0, dims=(256, 256), sample_rate=(2, 2))
    feat, feat_len = make_feat(B=2, T=128)
    model = ASR(feat.shape[-1], V, cfg)
    assert not model.enable_att
    params = model.init(jax.random.PRNGKey(1))
    enc, enc_len = model.encode(params, jnp.asarray(feat),
                                jnp.asarray(feat_len))
    ctc_lp = np.asarray(model.ctc_output(params, enc))
    ref_enc = torch_encode(model, params, t(feat))
    ref_lp = torch.log_softmax(ref_enc @ t(params.ctc_w) + t(params.ctc_b),
                               -1).numpy()
    T = ref_lp.shape[1]
    np.testing.assert_allclose(ctc_lp[:, :T], ref_lp, rtol=1e-3, atol=2e-4)
    # greedy best-path sequences agree
    assert (ctc_lp[:, :T].argmax(-1) == ref_lp.argmax(-1)).all()


# =====================================================================
# (c) per-step decoder logits (teacher-forced) parity
# =====================================================================
@pytest.mark.parametrize("cfg", [
    model_cfg(dims=(512, 512), sample_rate=(2, 2), ctc_weight=0.5),
    model_cfg(prenet="vgg", dims=(256,), sample_rate=(1,), ctc_weight=0.0,
              att_mode="dot", att_dim=128),
    model_cfg(dims=(128,), sample_rate=(2,), ctc_weight=0.5, num_head=4,
              att_dim=64, dec_dim=128),
], ids=["joint512-loc", "vgg-dot", "multihead4"])
def test_teacher_forced_logits_match_torch(cfg):
    feat, feat_len = make_feat(B=2, T=128, seed=2)
    model = ASR(feat.shape[-1], V, cfg)
    params = model.init(jax.random.PRNGKey(3))
    U = 12
    rng = np.random.RandomState(4)
    teacher = rng.randint(2, V, (2, U)).astype(np.int32)
    _, _, att_out, att_align, _ = model.forward(
        params, jnp.asarray(feat), jnp.asarray(feat_len), U, 1.0,
        teacher=jnp.asarray(teacher))
    enc_ref = torch_encode(model, params, t(feat))
    ref_logits, _ = torch_decode_loop(model, params, enc_ref, U,
                                      teacher=t(teacher).long())
    np.testing.assert_allclose(np.asarray(att_out), ref_logits.numpy(),
                               rtol=1e-3, atol=5e-4)


# =====================================================================
# (d) decoded sequences: greedy and beam + LM fusion
# =====================================================================
def test_greedy_sequence_matches_torch():
    """Config 1: pBLSTM LAS greedy decode at 512 scale."""
    from end_to_end_asr_pytorch_tpu.decode.greedy import att_greedy
    cfg = model_cfg(dims=(512, 512), sample_rate=(2, 2), ctc_weight=0.5)
    feat, feat_len = make_feat(B=3, T=128, seed=5)
    model = ASR(feat.shape[-1], V, cfg)
    params = model.init(jax.random.PRNGKey(6))
    enc, enc_len = model.encode(params, jnp.asarray(feat),
                                jnp.asarray(feat_len))
    ids = np.asarray(att_greedy(model, params, enc, enc_len, 16))
    enc_ref = torch_encode(model, params, t(feat))
    ref_logits, ref_ids = torch_decode_loop(model, params, enc_ref, 16)
    np.testing.assert_array_equal(ids, ref_ids.numpy())


class TorchBeamLM:
    """Per-hypothesis Python beam with numpy CTC prefix scoring and LM fusion
    — the reference's decode structure (SURVEY.md 3.2), same scoring
    semantics as decode/beam.py (full candidate set, per-step finalization,
    length-normalized ranking)."""

    def __init__(self, model, params, lm, lm_params, decode_cfg):
        self.model, self.p = model, params
        self.lm, self.lp = lm, lm_params
        # torch cell modules are construction-heavy; build them once, not
        # once per hypothesis per decode step
        self._lm_cells = (make_torch_cells(lm.module, lm_params.cells,
                                           lm.emb_dim, lm.dim)
                          if lm is not None else None)
        self.K = decode_cfg["beam_size"]
        self.cw = decode_cfg.get("ctc_weight", 0.0)
        self.lw = decode_cfg.get("lm_weight", 0.0)
        self.min_r = decode_cfg.get("min_len_ratio", 0.0)
        self.max_r = decode_cfg.get("max_len_ratio", 1.0)

    @torch.no_grad()
    def _lm_step(self, state, tok):
        lm = self.lm
        p = self.lp
        inp = t(p.embed)[tok]
        hs, cs = [], []
        cells = self._lm_cells
        x = inp
        for i, cell in enumerate(cells):
            if lm.module == "lstm":
                h, c = cell(x, (state[0][i], state[1][i]))
                cs.append(c)
            else:
                h = cell(x, state[0][i])
            hs.append(h)
            x = h
        w = t(p.embed).T if p.out_w is None else t(p.out_w)
        logits = x @ w + t(p.out_b)
        return logits, (hs, cs)

    @torch.no_grad()
    def decode_one(self, enc: torch.Tensor):
        """enc (1, T, D) -> (best_norm_score, token list)."""
        from bench_baseline import NumpyCTCPrefix
        model, p, K = self.model, self.p, self.K
        aw, cw, lw = 1.0 - self.cw, self.cw, self.lw
        att, dec = model.attention, model.decoder
        T = enc.shape[1]
        L = max(1, int(math.ceil(self.max_r * T)))
        min_len = math.ceil(self.min_r * T)
        if cw > 0:
            ctc_lp = torch.log_softmax(enc @ t(p.ctc_w) + t(p.ctc_b),
                                       -1)[0].double().numpy()
            scorer = NumpyCTCPrefix(ctc_lp)
            r0 = scorer.initial_state()
        else:
            scorer, r0 = None, None
        cells = make_torch_cells(dec.module, p.decoder.cells, dec.in_dim,
                                 dec.dim)
        hs = [torch.zeros(1, dec.dim) for _ in range(dec.layers)]
        cs = [torch.zeros(1, dec.dim) for _ in range(dec.layers)]
        lm0 = ([torch.zeros(1, self.lm.dim)] * self.lm.n_layers,
               [torch.zeros(1, self.lm.dim)] * self.lm.n_layers) \
            if self.lm else None
        hyps = [{"g": [], "att": 0.0, "lm": 0.0, "h": hs, "c": cs,
                 "lms": lm0, "align": torch.full((1, att.num_head, T), 1.0 / T),
                 "r": r0}]
        finished = []  # (norm_score, tokens)
        for step in range(L + 1):
            cands = []
            for hyp in hyps:
                prev = hyp["g"][-1] if hyp["g"] else EOS
                query = hyp["h"][-1]
                ctx, align = torch_att_step(att, p.attention, enc, query,
                                            hyp["align"])
                emb = t(p.embed)[torch.tensor([prev])]
                x = torch.cat([emb, ctx], -1)
                nh, nc = [], []
                for i, cell in enumerate(cells):
                    if dec.module == "lstm":
                        h, c = cell(x, (hyp["h"][i], hyp["c"][i]))
                        nc.append(c)
                    else:
                        h = cell(x, hyp["h"][i])
                    nh.append(h)
                    x = h
                logp = torch.log_softmax(x @ t(p.char_w) + t(p.char_b),
                                         -1)[0].numpy()
                if self.lm:
                    lm_logits, lms = self._lm_step(hyp["lms"],
                                                   torch.tensor([prev]))
                    lm_logp = torch.log_softmax(lm_logits, -1)[0].numpy()
                else:
                    lms, lm_logp = None, np.zeros_like(logp)
                base = aw * hyp["att"] + lw * hyp["lm"]
                n_tok = len(hyp["g"])
                # finalization (mirrors beam.py: offered when n_tok+1 >=
                # min_len or >= max_len)
                if n_tok + 1 >= min_len or n_tok + 1 >= L:
                    ctc_eos = scorer.final(hyp["r"]) if scorer else 0.0
                    tot = (base + aw * logp[EOS] + cw * ctc_eos
                           + lw * lm_logp[EOS])
                    finished.append((tot / max(n_tok + 1, 1), hyp["g"]))
                if n_tok >= L:
                    continue
                # full candidate set (all non-eos/pad ids)
                vocab = [v for v in range(2, len(logp))]
                if scorer:
                    psis, rs = scorer(hyp["g"], hyp["r"], vocab)
                else:
                    psis, rs = [0.0] * len(vocab), [None] * len(vocab)
                for v, psi, r in zip(vocab, psis, rs):
                    tot = base + aw * logp[v] + lw * lm_logp[v] + cw * psi
                    cands.append((tot, hyp, v, r, logp[v], lm_logp[v],
                                  (nh, nc), lms, align))
            cands.sort(key=lambda x: -x[0])
            hyps = [{
                "g": hyp["g"] + [v],
                "att": hyp["att"] + lp_a, "lm": hyp["lm"] + lp_l,
                "h": st[0], "c": st[1], "lms": lms, "align": al, "r": r,
            } for tot, hyp, v, r, lp_a, lp_l, st, lms, al in cands[:K]]
            if not hyps:
                break
        finished.sort(key=lambda x: -x[0])
        return finished[:self.K]


def test_beam_lm_sequence_matches_torch():
    """Config 5: joint CTC-attention beam with RNN-LM shallow fusion. The
    batched lax.scan beam must produce the same best hypothesis as a
    per-hypothesis Python loop over the same weights."""
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    cfg = model_cfg(dims=(64, 64), sample_rate=(2, 2), ctc_weight=0.5,
                    att_dim=32, dec_dim=64)
    feat, feat_len = make_feat(B=3, T=64, seed=7)
    model = ASR(feat.shape[-1], V, cfg)
    params = model.init(jax.random.PRNGKey(8))
    lm = RNNLM(V, {"module": "LSTM", "dim": 64, "emb_dim": 64, "layer": 1})
    lm_params = lm.init(jax.random.PRNGKey(9))
    dcfg = {"beam_size": 3, "min_len_ratio": 0.0, "max_len_ratio": 0.3,
            "ctc_weight": 0.3, "lm_weight": 0.2}
    dec = BeamDecoder(model, dcfg, lm)
    out = jax.jit(lambda p, f, fl, lp: dec.forward(p, f, fl, lm_params=lp))(
        params, jnp.asarray(feat), jnp.asarray(feat_len), lm_params)
    tokens = np.asarray(out.tokens)
    lengths = np.asarray(out.lengths)
    scores = np.asarray(out.scores)

    oracle = TorchBeamLM(model, params, lm, lm_params, dcfg)
    enc_ref = torch_encode(model, params, t(feat))
    for b in range(feat.shape[0]):
        fin = oracle.decode_one(enc_ref[b:b + 1])
        ref_score, ref_seq = fin[0]
        got = tokens[b, 0, :lengths[b, 0]].tolist()
        assert got == ref_seq, (b, got, ref_seq)
        np.testing.assert_allclose(scores[b, 0], ref_score, rtol=1e-4,
                                   atol=1e-5)
