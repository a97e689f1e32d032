"""Reference (torch.save) checkpoint importer: round-trip and CLI tests.

The exporter here writes a state_dict with the reference's module naming
(SURVEY.md 2.7/2.8: Encoder.layers ModuleList with the VGG extractor as
element 0, RNNLayer.layer nn.LSTM/GRU, attention proj_q/proj_k/proj_v/
loc_conv/gen_energy, Decoder.layers cell stack, pre_embed/char_trans/
ctc_layer) using torch's native tensor layouts (Linear (out,in), Conv2d
OIHW, packed gate weights) — then asserts the importer reproduces the
original JAX params exactly and that the CLI decode path accepts the torch
file transparently."""
import sys
from collections import OrderedDict
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from end_to_end_asr_pytorch_tpu.models.asr import ASR
from end_to_end_asr_pytorch_tpu.models.lm import RNNLM
from end_to_end_asr_pytorch_tpu.models.encoder import VGGParams, CNNParams
from end_to_end_asr_pytorch_tpu.ops.rnn import LSTMWeights
from end_to_end_asr_pytorch_tpu.utils.torch_ckpt import (
    is_torch_checkpoint, load_torch_checkpoint, translate_asr_state_dict,
    translate_lm_state_dict)

torch = pytest.importorskip("torch")


def t(a):
    return torch.tensor(np.asarray(a, np.float32))


def _rnn_entries(sd, prefix, cell, suffix=""):
    """Emit torch-layout packed-RNN entries for one JAX cell."""
    sd[f"{prefix}.weight_ih{suffix}"] = t(np.asarray(cell.w_ih).T)
    sd[f"{prefix}.weight_hh{suffix}"] = t(np.asarray(cell.w_hh).T)
    if isinstance(cell, LSTMWeights):
        sd[f"{prefix}.bias_ih{suffix}"] = t(cell.b)
        sd[f"{prefix}.bias_hh{suffix}"] = t(np.zeros_like(cell.b))
    else:
        sd[f"{prefix}.bias_ih{suffix}"] = t(cell.b_ih)
        sd[f"{prefix}.bias_hh{suffix}"] = t(cell.b_hh)


def export_asr_state_dict(params) -> "OrderedDict":
    """JAX ASRParams -> reference-style torch state_dict (the inverse of
    the importer; layouts follow tests/test_torch_parity.py)."""
    sd = OrderedDict()
    idx = 0
    pre = params.encoder.prenet
    if isinstance(pre, VGGParams):
        for i, (k, b) in enumerate([(pre.k1, pre.b1), (pre.k2, pre.b2),
                                    (pre.k3, pre.b3), (pre.k4, pre.b4)], 1):
            sd[f"encoder.layers.0.conv{i}.weight"] = t(
                np.transpose(np.asarray(k), (3, 2, 0, 1)))   # HWIO -> OIHW
            sd[f"encoder.layers.0.conv{i}.bias"] = t(b)
        idx = 1
    elif isinstance(pre, CNNParams):
        for i, (k, b) in enumerate([(pre.k1, pre.b1), (pre.k2, pre.b2)], 1):
            sd[f"encoder.layers.0.conv{i}.weight"] = t(
                np.transpose(np.asarray(k), (2, 1, 0)))      # KIO -> OIK
            sd[f"encoder.layers.0.conv{i}.bias"] = t(b)
        idx = 1
    for li, lp in enumerate(params.encoder.layers):
        p = f"encoder.layers.{idx + li}"
        _rnn_entries(sd, f"{p}.layer", lp.fwd, "_l0")
        if lp.bwd is not None:
            _rnn_entries(sd, f"{p}.layer", lp.bwd, "_l0_reverse")
        if lp.ln_scale is not None:
            sd[f"{p}.ln.weight"] = t(lp.ln_scale)
            sd[f"{p}.ln.bias"] = t(lp.ln_bias)
        if lp.w_proj is not None:
            sd[f"{p}.pj.weight"] = t(np.asarray(lp.w_proj).T)
            sd[f"{p}.pj.bias"] = t(lp.b_proj)
    if params.ctc_w is not None:
        sd["ctc_layer.weight"] = t(np.asarray(params.ctc_w).T)
        sd["ctc_layer.bias"] = t(params.ctc_b)
    if params.embed is not None:
        sd["pre_embed.weight"] = t(params.embed)
        a = params.attention
        sd["attention.proj_q.weight"] = t(np.asarray(a.w_q).T)
        sd["attention.proj_k.weight"] = t(np.asarray(a.w_k).T)
        if a.w_v is not None:
            sd["attention.proj_v.weight"] = t(np.asarray(a.w_v).T)
        if a.w_merge is not None:
            sd["attention.merge_head.weight"] = t(np.asarray(a.w_merge).T)
        if a.loc_conv is not None:
            sd["attention.loc_conv.weight"] = t(
                np.transpose(np.asarray(a.loc_conv), (2, 1, 0)))
            sd["attention.loc_proj.weight"] = t(np.asarray(a.w_f).T)
            sd["attention.bias"] = t(a.bias)
            sd["attention.gen_energy.weight"] = t(
                np.asarray(a.v_energy).reshape(-1, a.v_energy.shape[-1]))
        for ci, cell in enumerate(params.decoder.cells):
            _rnn_entries(sd, "decoder.layers", cell, f"_l{ci}")
        sd["char_trans.weight"] = t(np.asarray(params.char_w).T)
        sd["char_trans.bias"] = t(params.char_b)
    return sd


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=0, atol=0)


CFG_FULL = {
    "ctc_weight": 0.5,
    "encoder": {"prenet": "vgg", "module": "LSTM", "bidirection": True,
                "dim": [16, 16], "sample_rate": [1, 2],
                "sample_style": "drop", "layer_norm": [True, False],
                "proj": [True, False]},
    "attention": {"mode": "loc", "dim": 12, "num_head": 1,
                  "temperature": 1.0, "v_proj": True,
                  "loc_kernel_size": 7, "loc_kernel_num": 4},
    "decoder": {"module": "LSTM", "dim": 16, "layer": 2},
}


def test_asr_roundtrip_vgg_loc_lstm():
    model = ASR(40, 12, CFG_FULL)
    params = model.init(jax.random.PRNGKey(0))
    sd = export_asr_state_dict(params)
    template = model.init(jax.random.PRNGKey(99))  # different init
    got = translate_asr_state_dict(sd, template)
    _tree_equal(got, params)


def test_asr_roundtrip_cnn_dot_gru():
    cfg = {
        "ctc_weight": 0.3,
        "encoder": {"prenet": "cnn", "module": "GRU", "bidirection": False,
                    "dim": [16, 16], "sample_rate": [1, 1],
                    "sample_style": "concat"},
        "attention": {"mode": "dot", "dim": 12, "num_head": 2,
                      "temperature": 1.0, "v_proj": True},
        "decoder": {"module": "GRU", "dim": 16, "layer": 1},
    }
    model = ASR(40, 9, cfg)
    params = model.init(jax.random.PRNGKey(1))
    sd = export_asr_state_dict(params)
    got = translate_asr_state_dict(sd, model.init(jax.random.PRNGKey(2)))
    _tree_equal(got, params)


def test_lm_roundtrip():
    for tying in (False, True):
        lm = RNNLM(9, {"module": "LSTM", "dim": 12, "emb_dim": 12,
                       "layer": 2, "emb_tying": tying})
        params = lm.init(jax.random.PRNGKey(3))
        sd = OrderedDict()
        sd["emb.weight"] = t(params.embed)
        for ci, cell in enumerate(params.cells):
            _rnn_entries(sd, "rnn", cell, f"_l{ci}")
        if params.out_w is not None:
            sd["trans.weight"] = t(np.asarray(params.out_w).T)
        sd["trans.bias"] = t(params.out_b)
        got = translate_lm_state_dict(sd, lm.init(jax.random.PRNGKey(4)))
        _tree_equal(got, params)


def test_torch_file_sniff_and_dict_contract(tmp_path):
    model = ASR(40, 12, CFG_FULL)
    params = model.init(jax.random.PRNGKey(0))
    sd = export_asr_state_dict(params)
    f = tmp_path / "ref.pth"
    torch.save({"model": sd, "optimizer": {"state": {}},
                "global_step": 1234, "wer": 0.17}, str(f))
    assert is_torch_checkpoint(str(f))
    ck = load_torch_checkpoint(str(f), model.init(jax.random.PRNGKey(5)))
    assert ck["global_step"] == 1234
    assert ck["optimizer"] is None
    assert ck["metrics"]["wer"] == pytest.approx(0.17)
    _tree_equal(ck["model"], params)
    # bare state_dict (no wrapper dict) also loads
    f2 = tmp_path / "bare.pth"
    torch.save(sd, str(f2))
    ck2 = load_torch_checkpoint(str(f2), model.init(jax.random.PRNGKey(6)))
    _tree_equal(ck2["model"], params)
    # a native checkpoint is NOT sniffed as torch
    from end_to_end_asr_pytorch_tpu.utils.checkpoint import save_checkpoint
    f3 = tmp_path / "native.pth"
    save_checkpoint(str(f3), params, global_step=7)
    assert not is_torch_checkpoint(str(f3))


def test_cli_decode_from_torch_checkpoint(tmp_path):
    """Decoding with --load <torch ckpt> must produce byte-identical output
    to the native checkpoint of the same weights (SURVEY.md 3.5)."""
    from end_to_end_asr_pytorch_tpu.data import synthetic
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver as TrainS
    from end_to_end_asr_pytorch_tpu.solvers.test_asr import Solver as TestS
    from end_to_end_asr_pytorch_tpu.utils.checkpoint import load_checkpoint
    from tests.test_e2e_train import _paras, _asr_config

    root = tmp_path / "synth"
    synthetic.generate_corpus(str(root), n_train=8, n_dev=4, n_test=4,
                              max_words=2)
    cfg = _asr_config(root, ctc_weight=0.5, max_step=4)
    tr = TrainS(cfg, _paras(tmp_path, "mig"), "train")
    tr.load_data()
    tr.set_model()
    tr.exec()
    native = tmp_path / "ckpt" / "mig_sd0" / "latest.pth"
    ck = load_checkpoint(str(native), tr.params)
    torch_f = tmp_path / "torch_ref.pth"
    torch.save({"model": export_asr_state_dict(ck["model"]),
                "global_step": ck["global_step"]}, str(torch_f))

    cfg["data"]["corpus"]["test_split"] = ["test-clean"]
    cfg["decode"] = {"beam_size": 2, "max_len_ratio": 0.3,
                     "ctc_weight": 0.3, "lm_weight": 0.0}
    outs = []
    for name, ckpt in (("nat", native), ("tor", torch_f)):
        paras = _paras(tmp_path / name, "mig", load=str(ckpt))
        paras.test = True
        ts = TestS(cfg, paras, "test")
        ts.load_data()
        ts.set_model()
        ts.exec()
        outs.append(
            (tmp_path / name / "out" / "mig_sd0" / "test_output.csv")
            .read_bytes())
    assert outs[0] == outs[1]


def test_nested_attention_scope_and_decoy_bias():
    """Regression for the bias-binding rule: with the attention module
    nested (e.g. 'dec.attention.*') and a DECOY '.bias' of the identical
    shape appearing EARLIER in the state_dict, the importer must still
    bind the attention bias from inside the attention scope — the old
    flat-scope detection fell back to an unscoped scan that bound the
    first same-shaped bias it saw."""
    model = ASR(6, 8, CFG_FULL)
    params = model.init(jax.random.PRNGKey(5))
    sd = export_asr_state_dict(params)
    # nest every attention key under 'dec.' and prepend a same-shaped decoy
    nested = OrderedDict()
    bias_shape = np.asarray(params.attention.bias).shape
    nested["frontend_proj.bias"] = t(np.full(bias_shape, 123.0, np.float32))
    for k, v in sd.items():
        nested["dec." + k if k.startswith("attention.") else k] = v
    got = translate_asr_state_dict(nested, model.init(jax.random.PRNGKey(6)))
    np.testing.assert_allclose(np.asarray(got.attention.bias),
                               np.asarray(params.attention.bias))
    assert not np.allclose(np.asarray(got.attention.bias), 123.0)
