"""Full-model GRADIENT parity vs an independent differentiable torch mirror.

test_torch_parity.py pins the forward pass (features, encoder outputs,
per-step decoder logits, decoded sequences); this file pins the BACKWARD
pass of the whole joint CTC-attention training loss: VGG convs, BiLSTM
encoder, location-aware attention, teacher-forced decoder scan (including
the remat'd label scan and the first-layer lookup-table fast path, whose
custom structure reorders the autodiff), CTC head, and CE head.

The torch mirror keeps every parameter leaf in the JAX layout (transposes
happen inside the torch graph), so gradients compare tensor-for-tensor with
no translation dictionary. torch.nn.functional.ctc_loss provides the
independent CTC backward (our CTC grad is also pinned vs torch in
tests/test_ctc.py; here it participates in the full-model sum).
"""
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
from end_to_end_asr_pytorch_tpu.ops.ctc import ctc_loss
from end_to_end_asr_pytorch_tpu.solvers.train_asr import masked_ce

torch.manual_seed(0)
torch.set_num_threads(1)

V = 31


def make_cfg(att_mode="loc", dec_module="LSTM"):
    return {
        "ctc_weight": 0.5,
        "encoder": {"prenet": "vgg", "module": "LSTM", "bidirection": True,
                    "dim": [32], "sample_rate": [1], "sample_style": "drop"},
        "attention": {"mode": att_mode, "dim": 16, "num_head": 1,
                      "temperature": 0.5, "v_proj": True,
                      "loc_kernel_size": 11, "loc_kernel_num": 3},
        "decoder": {"module": dec_module, "dim": 32, "layer": 1},
    }


B, T, D, U = 2, 64, 40, 6


def leaf(x):
    lt = torch.from_numpy(np.array(x)).clone()
    lt.requires_grad_(True)
    return lt


def torch_lstm_dir(x, w_ih, w_hh, b, reverse):
    """Functional LSTM, JAX layout (w_ih (D,4H), w_hh (H,4H), gate order
    i,f,g,o as in ops/rnn.py)."""
    Bb, Tt, _ = x.shape
    H = w_hh.shape[0]
    h = torch.zeros(Bb, H)
    c = torch.zeros(Bb, H)
    outs = []
    order = range(Tt - 1, -1, -1) if reverse else range(Tt)
    for ti in order:
        gates = x[:, ti] @ w_ih + b + h @ w_hh
        i, f, g, o = gates.split(H, dim=-1)
        c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
        h = torch.sigmoid(o) * torch.tanh(c)
        outs.append(h)
    if reverse:
        outs = outs[::-1]
    return torch.stack(outs, 1)


def torch_forward(tp, model, feat, teacher):
    """Differentiable mirror of ASR.forward at tf_rate=1.0 on full-length
    (unpadded) inputs. tp: dict of leaf tensors in JAX layout."""
    att = model.attention
    # ---- VGG (conv SAME, relu, 2x2 max-pool VALID; NCHW in torch)
    h = feat.reshape(B, T, 1, D).permute(0, 2, 1, 3)

    def conv(h, k, b):
        return F.conv2d(h, k.permute(3, 2, 0, 1), b, padding=1)

    h = F.relu(conv(h, tp["k1"], tp["b1"]))
    h = F.relu(conv(h, tp["k2"], tp["b2"]))
    h = F.max_pool2d(h, 2)
    h = F.relu(conv(h, tp["k3"], tp["b3"]))
    h = F.relu(conv(h, tp["k4"], tp["b4"]))
    h = F.max_pool2d(h, 2)
    h = h.permute(0, 2, 1, 3).flatten(2)          # (B, T/4, 128*D/4)

    # ---- BiLSTM encoder layer
    fwd = torch_lstm_dir(h, tp["e_wih_f"], tp["e_whh_f"], tp["e_b_f"], False)
    bwd = torch_lstm_dir(h, tp["e_wih_b"], tp["e_whh_b"], tp["e_b_b"], True)
    enc = torch.cat([fwd, bwd], dim=-1)           # (B, T', 2H)
    Tp = enc.shape[1]

    # ---- CTC head
    ctc_logp = torch.log_softmax(enc @ tp["ctc_w"] + tp["ctc_b"], dim=-1)

    # ---- teacher-forced attention decoder loop
    d = att.dim
    keys = enc @ tp["w_k"]                        # (B, T', d)  (H=1)
    vals = enc @ tp["w_v"]
    hs = torch.zeros(B, model.dec_dim)
    cs = torch.zeros(B, model.dec_dim)
    align = torch.full((B, Tp), 1.0 / Tp)
    prev = torch.full((B,), 1, dtype=torch.long)  # <sos> == EOS_IDX == 1
    if att.mode == "loc":
        kern = tp["loc_conv"].permute(2, 1, 0)    # (F, 1, k)
        pad = (kern.shape[-1] - 1) // 2
    H = model.dec_dim
    logits_seq = []
    for step in range(U):
        if att.mode == "loc":
            q = hs @ tp["w_q"] + tp["bias"]       # (B, d)
            f = F.conv1d(align[:, None, :], kern, padding=pad).transpose(1, 2)
            f = f @ tp["w_f"]                     # (B, T', d)
            tanh_arg = q[:, None, :] + keys + f
            energy = torch.einsum("btd,d->bt", torch.tanh(tanh_arg),
                                  tp["v_energy"][0]) / att.temperature
        else:                                     # dot
            q = hs @ tp["w_q"]
            energy = torch.einsum("bd,btd->bt", q, keys) / att.temperature
        align = torch.softmax(energy, dim=-1)
        ctx = torch.einsum("bt,btv->bv", align, vals)
        emb = tp["embed"][prev]
        x = torch.cat([emb, ctx], dim=-1)
        if model.decoder.module == "lstm":
            gates = x @ tp["d_wih"] + tp["d_b"] + hs @ tp["d_whh"]
            i, fg, g, o = gates.split(H, dim=-1)
            cs = torch.sigmoid(fg) * cs + torch.sigmoid(i) * torch.tanh(g)
            hs = torch.sigmoid(o) * torch.tanh(cs)
        else:                                     # gru (torch r,z,n order)
            xp = x @ tp["d_wih"] + tp["d_b_ih"]
            hp = hs @ tp["d_whh"] + tp["d_b_hh"]
            r = torch.sigmoid(xp[:, :H] + hp[:, :H])
            z = torch.sigmoid(xp[:, H:2*H] + hp[:, H:2*H])
            n = torch.tanh(xp[:, 2*H:] + r * hp[:, 2*H:])
            hs = (1.0 - z) * n + z * hs
        logits_seq.append(hs @ tp["char_w"] + tp["char_b"])
        prev = teacher[:, step]
    att_logits = torch.stack(logits_seq, 1)       # (B, U, V)
    return ctc_logp, att_logits


@pytest.mark.parametrize("variant", ["loc-lstm", "dot-gru"])
def test_full_model_grads_match_torch(variant):
    seed = 0
    att_mode, dec_module = variant.split("-")
    model = ASR(D, V, make_cfg(att_mode, dec_module.upper()))
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed + 10)
    feat = rng.randn(B, T, D).astype(np.float32)
    teacher = rng.randint(2, V, (B, U)).astype(np.int32)
    feat_len = np.full((B,), T, np.int32)
    text_len = np.full((B,), U, np.int32)

    # ----------------------------------------------------------- JAX side
    def loss_fn(p):
        ctc_out, enc_len, att_out, _, _ = model.forward(
            p, jnp.asarray(feat), jnp.asarray(feat_len), U, 1.0,
            teacher=jnp.asarray(teacher), train=True,
            rng=jax.random.PRNGKey(0))
        nll = ctc_loss(ctc_out, enc_len, jnp.asarray(teacher),
                       jnp.asarray(text_len))
        return (0.5 * jnp.mean(nll / U) + 0.5 * masked_ce(att_out,
                                                          jnp.asarray(teacher)))

    jl, jg = jax.value_and_grad(loss_fn)(params)

    # --------------------------------------------------------- torch side
    enc_l = params.encoder.layers[0]
    vg = params.encoder.prenet
    ap = params.attention
    dc = params.decoder.cells[0]
    tp = {
        "k1": leaf(vg.k1), "b1": leaf(vg.b1), "k2": leaf(vg.k2),
        "b2": leaf(vg.b2), "k3": leaf(vg.k3), "b3": leaf(vg.b3),
        "k4": leaf(vg.k4), "b4": leaf(vg.b4),
        "e_wih_f": leaf(enc_l.fwd.w_ih), "e_whh_f": leaf(enc_l.fwd.w_hh),
        "e_b_f": leaf(enc_l.fwd.b),
        "e_wih_b": leaf(enc_l.bwd.w_ih), "e_whh_b": leaf(enc_l.bwd.w_hh),
        "e_b_b": leaf(enc_l.bwd.b),
        "ctc_w": leaf(params.ctc_w), "ctc_b": leaf(params.ctc_b),
        "embed": leaf(params.embed),
        "w_q": leaf(ap.w_q), "w_k": leaf(ap.w_k), "w_v": leaf(ap.w_v),
        "d_wih": leaf(dc.w_ih), "d_whh": leaf(dc.w_hh),
        "char_w": leaf(params.char_w), "char_b": leaf(params.char_b),
    }
    if att_mode == "loc":
        tp.update({"loc_conv": leaf(ap.loc_conv), "w_f": leaf(ap.w_f),
                   "bias": leaf(ap.bias), "v_energy": leaf(ap.v_energy)})
    if dec_module == "lstm":
        tp["d_b"] = leaf(dc.b)
    else:
        tp["d_b_ih"] = leaf(dc.b_ih)
        tp["d_b_hh"] = leaf(dc.b_hh)
    tfeat = torch.from_numpy(feat)
    tteach = torch.from_numpy(teacher.astype(np.int64))
    ctc_logp, att_logits = torch_forward(tp, model, tfeat, tteach)
    Tp = ctc_logp.shape[1]
    tnll = F.ctc_loss(ctc_logp.permute(1, 0, 2), tteach,
                      torch.full((B,), Tp, dtype=torch.long),
                      torch.full((B,), U, dtype=torch.long),
                      blank=0, reduction="none", zero_infinity=False)
    tce = F.cross_entropy(att_logits.reshape(-1, V), tteach.reshape(-1))
    tloss = 0.5 * (tnll / U).mean() + 0.5 * tce
    tloss.backward()

    tl = float(tloss.detach())
    assert abs(float(jl) - tl) < 2e-5, (float(jl), tl)

    jax_grads = {
        "k1": jg.encoder.prenet.k1, "b1": jg.encoder.prenet.b1,
        "k2": jg.encoder.prenet.k2, "b2": jg.encoder.prenet.b2,
        "k3": jg.encoder.prenet.k3, "b3": jg.encoder.prenet.b3,
        "k4": jg.encoder.prenet.k4, "b4": jg.encoder.prenet.b4,
        "e_wih_f": jg.encoder.layers[0].fwd.w_ih,
        "e_whh_f": jg.encoder.layers[0].fwd.w_hh,
        "e_b_f": jg.encoder.layers[0].fwd.b,
        "e_wih_b": jg.encoder.layers[0].bwd.w_ih,
        "e_whh_b": jg.encoder.layers[0].bwd.w_hh,
        "e_b_b": jg.encoder.layers[0].bwd.b,
        "ctc_w": jg.ctc_w, "ctc_b": jg.ctc_b,
        "embed": jg.embed,
        "w_q": jg.attention.w_q, "w_k": jg.attention.w_k,
        "w_v": jg.attention.w_v,
        "d_wih": jg.decoder.cells[0].w_ih, "d_whh": jg.decoder.cells[0].w_hh,
        "char_w": jg.char_w, "char_b": jg.char_b,
    }
    if att_mode == "loc":
        jax_grads.update({
            "loc_conv": jg.attention.loc_conv, "w_f": jg.attention.w_f,
            "bias": jg.attention.bias, "v_energy": jg.attention.v_energy})
    if dec_module == "lstm":
        jax_grads["d_b"] = jg.decoder.cells[0].b
    else:
        jax_grads["d_b_ih"] = jg.decoder.cells[0].b_ih
        jax_grads["d_b_hh"] = jg.decoder.cells[0].b_hh
    for name, jgrad in jax_grads.items():
        tgrad = tp[name].grad
        assert tgrad is not None, f"{name}: no torch grad"
        ja = np.asarray(jgrad)
        ta = tgrad.detach().numpy()
        scale = max(np.abs(ta).max(), 1e-6)
        np.testing.assert_allclose(
            ja, ta, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"gradient mismatch for {name}")
