"""Import reference (PyTorch) checkpoints into this framework's params.

The reference trains with ``torch.save({'model': state_dict, 'optimizer':
..., 'global_step': ...})`` (SURVEY.md 3.5); a user migrating here brings
such a file via ``--load``. This module translates a reference ASR / RNN-LM
``state_dict`` into :class:`ASRParams` / :class:`RNNLMParams` — the inverse
of the JAX->torch weight mapping the parity oracle uses
(tests/test_torch_parity.py), with the same layout conventions:

  * nn.Linear ``weight`` (out, in)         -> (in, out) transpose
  * nn.Conv2d ``weight`` OIHW              -> HWIO transpose (VGG prenet)
  * nn.Conv1d ``weight`` (out, in, k)      -> (k, in, out) (CNN prenet,
    location-attention conv)
  * nn.LSTM/LSTMCell gates stay in torch (i,f,g,o) order; ``w_ih`` =
    ``weight_ih.T``; the single JAX bias ``b = bias_ih + bias_hh`` (they
    enter the cell as a sum)
  * nn.GRU/GRUCell keep SEPARATE ``b_ih``/``b_hh`` (the n-gate applies the
    reset gate between them)

Exact reference attribute names are [unverified] while the reference mount
is empty (SURVEY.md 2.7/2.8 caveats), so keys are resolved by SUFFIX with
alias lists per slot (e.g. the char projection matches ``char_trans`` /
``char_out`` / ``output_layer``) and recurrent modules are discovered by
their torch parameter-name pattern (``weight_ih_l{n}[_reverse]``) in
state_dict order — robust to the enclosing module path. Every translation
is shape-checked against the template; unmatched slots raise with the
candidate keys listed.
"""
from __future__ import annotations

import re
from collections import OrderedDict
from typing import Any, Dict, List, Optional

import numpy as np
import jax.numpy as jnp


def is_torch_checkpoint(path: str) -> bool:
    """Sniff a torch-pickle checkpoint: zip archive (new format) or a bare
    pickle stream (legacy). This framework's own format starts with an
    8-byte little-endian JSON-header length; a tiny header length whose low
    bytes spell 0x80 0x02..0x05 (e.g. exactly 640 bytes) would alias the
    pickle protocol magic, so a pickle is only claimed when the next byte is
    a real opcode — the native format's bytes 2..7 are always zero there
    (header lengths are far below 2**16)."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic[:4] == b"PK\x03\x04":
        return True
    if len(magic) >= 2 and magic[0] == 0x80 and magic[1] in (2, 3, 4, 5):
        return magic[2:8].rstrip(b"\x00") != b""
    return False


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


class KeyResolver:
    """Suffix-alias key lookup over a flat state_dict with consumption
    tracking (so leftover keys can be reported)."""

    def __init__(self, sd: Dict[str, Any]):
        # strip DataParallel-style 'module.' prefixes
        self.sd = OrderedDict(
            (k[7:] if k.startswith("module.") else k, v)
            for k, v in sd.items())
        self.used: set = set()

    def find(self, suffixes: List[str], shape=None, scope: str = "",
             required: bool = True, numel=None) -> Optional[np.ndarray]:
        """First unused key under ``scope`` whose name ends with one of
        ``suffixes`` (at a '.' boundary) and whose value matches ``shape``
        (exact) or ``numel`` (total size)."""
        for suf in suffixes:
            for k, v in self.sd.items():
                if k in self.used or not k.startswith(scope):
                    continue
                if not (k == suf or k.endswith("." + suf)):
                    continue
                a = _np(v)
                if shape is not None and tuple(a.shape) != tuple(shape):
                    continue
                if numel is not None and a.size != numel:
                    continue
                self.used.add(k)
                return a
        if required:
            cands = [k for k in self.sd if k.startswith(scope)
                     and k not in self.used]
            raise KeyError(
                f"torch checkpoint: no key matching {suffixes} "
                f"(scope={scope!r}, shape={shape}); unconsumed keys under "
                f"scope: {cands[:20]}")
        return None

    def rnn_groups(self, scope: str = "") -> List[Dict[str, np.ndarray]]:
        """Discover recurrent layers by torch's parameter-name pattern.
        Returns one dict per (module, layer-index) in state_dict order with
        keys like 'weight_ih', 'bias_hh', 'weight_ih_reverse', ...
        Covers nn.LSTM/GRU (weight_ih_l0[_reverse]) and nn.LSTMCell/GRUCell
        (weight_ih) modules alike."""
        groups: "OrderedDict[tuple, Dict[str, np.ndarray]]" = OrderedDict()
        pat = re.compile(r"(weight|bias)_(ih|hh)(?:_l(\d+))?(_reverse)?$")
        for k, v in self.sd.items():
            if k in self.used or not k.startswith(scope):
                continue
            m = pat.search(k)
            if not m or (m.start() > 0 and k[m.start() - 1] != "."):
                continue
            prefix = k[:m.start()].rstrip(".")
            layer = int(m.group(3)) if m.group(3) is not None else 0
            name = f"{m.group(1)}_{m.group(2)}" + (m.group(4) or "")
            groups.setdefault((prefix, layer), {})[name] = _np(v)
            self.used.add(k)
        return list(groups.values())


def _lstm_from_group(g: Dict[str, np.ndarray], reverse: bool = False):
    from ..ops.rnn import LSTMWeights
    s = "_reverse" if reverse else ""
    b = g[f"bias_ih{s}"] + g.get(f"bias_hh{s}", 0.0)
    return LSTMWeights(w_ih=jnp.asarray(g[f"weight_ih{s}"].T),
                       w_hh=jnp.asarray(g[f"weight_hh{s}"].T),
                       b=jnp.asarray(b))


def _gru_from_group(g: Dict[str, np.ndarray], reverse: bool = False):
    from ..ops.rnn import GRUWeights
    s = "_reverse" if reverse else ""
    zeros = np.zeros_like(g[f"bias_ih{s}"])
    return GRUWeights(w_ih=jnp.asarray(g[f"weight_ih{s}"].T),
                      w_hh=jnp.asarray(g[f"weight_hh{s}"].T),
                      b_ih=jnp.asarray(g[f"bias_ih{s}"]),
                      b_hh=jnp.asarray(g.get(f"bias_hh{s}", zeros)))


def _cell_like(template_cell, g: Dict[str, np.ndarray], reverse=False):
    from ..ops.rnn import LSTMWeights
    if isinstance(template_cell, LSTMWeights):
        return _lstm_from_group(g, reverse)
    return _gru_from_group(g, reverse)


def _check(name: str, got, template):
    if template is not None and tuple(got.shape) != tuple(template.shape):
        raise ValueError(f"torch checkpoint: {name} shape {got.shape} does "
                         f"not match model {tuple(template.shape)}")
    return got


def translate_asr_state_dict(sd: Dict[str, Any], template) -> Any:
    """Reference ASR ``state_dict`` -> :class:`ASRParams` shaped like
    ``template`` (a freshly-initialized ASRParams)."""
    from ..models.encoder import VGGParams, CNNParams, RNNLayerParams
    from ..models.encoder import EncoderParams
    res = KeyResolver(sd)
    t_enc = template.encoder

    # ---- prenet (resolve BEFORE rnn_groups so conv keys aren't claimed)
    prenet = None
    if isinstance(t_enc.prenet, VGGParams):
        ks = []
        for i in (1, 2, 3, 4):
            w = res.find([f"conv{i}.weight", f"vgg_conv{i}.weight"],
                         scope="encoder")
            b = res.find([f"conv{i}.bias", f"vgg_conv{i}.bias"],
                         scope="encoder")
            ks.append((jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                       jnp.asarray(b)))
        prenet = VGGParams(k1=_check("vgg.k1", ks[0][0], t_enc.prenet.k1),
                           b1=ks[0][1], k2=ks[1][0], b2=ks[1][1],
                           k3=ks[2][0], b3=ks[2][1],
                           k4=_check("vgg.k4", ks[3][0], t_enc.prenet.k4),
                           b4=ks[3][1])
    elif isinstance(t_enc.prenet, CNNParams):
        ks = []
        for i in (1, 2):
            w = res.find([f"conv{i}.weight", f"cnn_conv{i}.weight"],
                         scope="encoder")
            b = res.find([f"conv{i}.bias", f"cnn_conv{i}.bias"],
                         scope="encoder")
            ks.append((jnp.asarray(np.transpose(w, (2, 1, 0))),
                       jnp.asarray(b)))
        prenet = CNNParams(k1=_check("cnn.k1", ks[0][0], t_enc.prenet.k1),
                           b1=ks[0][1],
                           k2=_check("cnn.k2", ks[1][0], t_enc.prenet.k2),
                           b2=ks[1][1])

    # ---- encoder RNN stack (state_dict order == layer order)
    enc_groups = res.rnn_groups(scope="encoder")
    if len(enc_groups) != len(t_enc.layers):
        raise ValueError(
            f"torch checkpoint: found {len(enc_groups)} recurrent modules "
            f"under 'encoder', model has {len(t_enc.layers)} layers")
    layers = []
    for li, (tl, g) in enumerate(zip(t_enc.layers, enc_groups)):
        fwd = _cell_like(tl.fwd, g)
        _check(f"encoder.layers[{li}].fwd.w_ih", fwd.w_ih, tl.fwd.w_ih)
        bwd = None
        if tl.bwd is not None:
            if "weight_ih_reverse" not in g:
                raise ValueError(f"torch checkpoint: encoder layer {li} is "
                                 "bidirectional in the model but the "
                                 "checkpoint has no _reverse weights")
            bwd = _cell_like(tl.bwd, g, reverse=True)
        ln_scale = ln_bias = None
        if tl.ln_scale is not None:
            ln_scale = jnp.asarray(res.find(
                ["ln.weight", "layer_norm.weight", "norm.weight"],
                shape=tl.ln_scale.shape, scope="encoder"))
            ln_bias = jnp.asarray(res.find(
                ["ln.bias", "layer_norm.bias", "norm.bias"],
                shape=tl.ln_bias.shape, scope="encoder"))
        w_proj = b_proj = None
        if tl.w_proj is not None:
            w = res.find(["pj.weight", "proj.weight", "linear.weight"],
                         shape=tl.w_proj.shape[::-1], scope="encoder")
            w_proj = jnp.asarray(w.T)
            b_proj = jnp.asarray(res.find(
                ["pj.bias", "proj.bias", "linear.bias"],
                shape=tl.b_proj.shape, scope="encoder"))
        layers.append(RNNLayerParams(fwd=fwd, bwd=bwd, ln_scale=ln_scale,
                                     ln_bias=ln_bias, w_proj=w_proj,
                                     b_proj=b_proj))
    encoder = EncoderParams(prenet=prenet, layers=tuple(layers))

    # ---- CTC head
    ctc_w = ctc_b = None
    if template.ctc_w is not None:
        w = res.find(["ctc_layer.weight", "ctc_out.weight", "ctc.weight"],
                     shape=template.ctc_w.shape[::-1])
        ctc_w = jnp.asarray(w.T)
        ctc_b = jnp.asarray(res.find(
            ["ctc_layer.bias", "ctc_out.bias", "ctc.bias"],
            shape=template.ctc_b.shape))

    # ---- attention decoder
    embed = att = dec = char_w = char_b = None
    if template.embed is not None:
        embed = jnp.asarray(res.find(
            ["pre_embed.weight", "embed.weight", "embedding.weight"],
            shape=template.embed.shape))
        att = _translate_attention(res, template.attention)
        from ..models.decoder import DecoderParams
        dec_groups = res.rnn_groups(scope="decoder")
        if not dec_groups:  # cell stack may live directly on the ASR module
            dec_groups = res.rnn_groups()
        t_cells = template.decoder.cells
        if len(dec_groups) != len(t_cells):
            raise ValueError(
                f"torch checkpoint: found {len(dec_groups)} recurrent "
                f"modules for the decoder, model has {len(t_cells)}")
        cells = tuple(_cell_like(tc, g)
                      for tc, g in zip(t_cells, dec_groups))
        for i, (c, tc) in enumerate(zip(cells, t_cells)):
            _check(f"decoder.cells[{i}].w_ih", c.w_ih, tc.w_ih)
        dec = DecoderParams(cells=cells)
        w = res.find(["char_trans.weight", "char_out.weight",
                      "output_layer.weight"],
                     shape=template.char_w.shape[::-1])
        char_w = jnp.asarray(w.T)
        char_b = jnp.asarray(res.find(
            ["char_trans.bias", "char_out.bias", "output_layer.bias"],
            shape=template.char_b.shape))

    return type(template)(encoder=encoder, ctc_w=ctc_w, ctc_b=ctc_b,
                          embed=embed, attention=att, decoder=dec,
                          char_w=char_w, char_b=char_b)


def _translate_attention(res: KeyResolver, t_att):
    from ..models.attention import AttentionParams
    # prefer an explicit attention module path when one exists (keeps the
    # generic 'bias' suffix from matching unrelated module biases) — the
    # module may be nested (e.g. 'decoder.attention.bias'), so scope to
    # the full prefix up to and including 'attention.'
    sc = ""
    for k in res.sd:
        i = k.find("attention.")
        if i == 0 or (i > 0 and k[i - 1] == "."):
            sc = k[:i + len("attention.")]
            break
    w_q = jnp.asarray(res.find(
        ["proj_q.weight", "query_proj.weight", "q_proj.weight"],
        shape=t_att.w_q.shape[::-1], scope=sc).T)
    w_k = jnp.asarray(res.find(
        ["proj_k.weight", "key_proj.weight", "k_proj.weight"],
        shape=t_att.w_k.shape[::-1], scope=sc).T)
    w_v = w_merge = loc_conv = w_f = bias = v_energy = None
    if t_att.w_v is not None:
        w_v = jnp.asarray(res.find(
            ["proj_v.weight", "value_proj.weight", "v_proj.weight"],
            shape=t_att.w_v.shape[::-1], scope=sc).T)
    if t_att.w_merge is not None:
        w_merge = jnp.asarray(res.find(
            ["merge_head.weight", "merge.weight", "out_proj.weight"],
            shape=t_att.w_merge.shape[::-1], scope=sc).T)
    if t_att.loc_conv is not None:
        k, in_ch, nf = t_att.loc_conv.shape
        w = res.find(["loc_conv.weight", "location_conv.weight"],
                     required=True, numel=k * in_ch * nf, scope=sc)
        if w.shape != (nf, in_ch, k):
            raise ValueError(
                f"torch checkpoint: loc_conv shape {w.shape} does not match "
                f"the single-channel convention ({nf}, {in_ch}, {k}) — the "
                "multi-head location-conv sharing rule is [unverified] "
                "against the real reference (SURVEY.md 2.8)")
        loc_conv = jnp.asarray(np.transpose(w, (2, 1, 0)))
        w_f = jnp.asarray(res.find(
            ["loc_proj.weight", "loc_linear.weight"],
            shape=t_att.w_f.shape[::-1], scope=sc).T)
        # the bare 'bias' suffix is only safe under an attention scope: an
        # unscoped scan would bind the FIRST same-shaped '.bias' of ANY
        # module (silent wrong weights). Without a scope, require an
        # attention-specific name and fail loudly otherwise.
        bias_sufs = (["att_bias", "loc_bias", "bias"] if sc
                     else ["att_bias", "loc_bias"])
        bias = jnp.asarray(res.find(
            bias_sufs, shape=t_att.bias.shape, scope=sc))
        v = res.find(["gen_energy.weight", "v_energy.weight",
                      "energy.weight"], numel=t_att.v_energy.size,
                     scope=sc)
        v_energy = jnp.asarray(v.reshape(t_att.v_energy.shape))
    return AttentionParams(w_q=w_q, w_k=w_k, w_v=w_v, w_merge=w_merge,
                           loc_conv=loc_conv, w_f=w_f, bias=bias,
                           v_energy=v_energy)


def translate_lm_state_dict(sd: Dict[str, Any], template) -> Any:
    """Reference RNNLM ``state_dict`` -> :class:`RNNLMParams`."""
    res = KeyResolver(sd)
    t = template
    embed = jnp.asarray(res.find(
        ["emb.weight", "embed.weight", "embedding.weight"],
        shape=t.embed.shape))
    groups = res.rnn_groups()
    if len(groups) != len(t.cells):
        raise ValueError(f"torch checkpoint: found {len(groups)} recurrent "
                         f"layers, LM has {len(t.cells)}")
    cells = tuple(_cell_like(tc, g) for tc, g in zip(t.cells, groups))
    out_w = None
    if t.out_w is not None:  # no emb_tying
        w = res.find(["trans.weight", "out.weight", "proj.weight",
                      "output_layer.weight"], shape=t.out_w.shape[::-1])
        out_w = jnp.asarray(w.T)
    out_b = jnp.asarray(res.find(
        ["trans.bias", "out.bias", "proj.bias", "output_layer.bias"],
        shape=t.out_b.shape))
    return type(t)(embed=embed, cells=cells, out_w=out_w, out_b=out_b)


def load_torch_checkpoint(path: str, model_template: Any) -> Dict[str, Any]:
    """torch.load a reference checkpoint and translate its model weights to
    ``model_template``'s structure. Returns the same contract as
    ``utils.checkpoint.load_checkpoint``: {'model', 'optimizer' (always
    None — torch optimizer state is not portable to optax), 'global_step',
    'metrics'}.

    ``model_template`` may be an ASRParams, an RNNLMParams, or the plugin
    solver's ``{'asr': ASRParams, 'plugin': PluginParams}`` dict (the
    plugin's projection is looked up by suffix; if the checkpoint has none,
    the template's init is kept)."""
    import torch
    ck = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ck, dict) and "model" in ck:
        sd = ck["model"]
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        global_step = int(ck.get("global_step", 0))
        metrics = {k: float(v) for k, v in ck.items()
                   if isinstance(v, (int, float)) and k != "global_step"}
    else:
        sd = ck.state_dict() if hasattr(ck, "state_dict") else ck
        global_step, metrics = 0, {}

    from ..models.lm import RNNLMParams
    if isinstance(model_template, dict) and "asr" in model_template:
        asr = translate_asr_state_dict(sd, model_template["asr"])
        plug = model_template["plugin"]
        res = KeyResolver(sd)
        w = res.find(["latent_transform.weight", "emb_proj.weight",
                      "plugin.w_proj"], shape=plug.w_proj.shape[::-1],
                     required=False)
        if w is not None:
            b = res.find(["latent_transform.bias", "emb_proj.bias",
                          "plugin.b_proj"], shape=plug.b_proj.shape)
            plug = type(plug)(w_proj=jnp.asarray(w.T), b_proj=jnp.asarray(b))
        model = {"asr": asr, "plugin": plug}
    elif isinstance(model_template, RNNLMParams):
        model = translate_lm_state_dict(sd, model_template)
    else:
        model = translate_asr_state_dict(sd, model_template)
    return {"model": model, "optimizer": None, "global_step": global_step,
            "metrics": metrics}
