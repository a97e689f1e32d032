"""Listener/encoder: VGG or CNN prenet + pyramidal (Bi)RNN stack.

Capability parity with the reference's ``src/asr.py:Encoder`` and
``src/module.py`` (SURVEY.md 2.7/2.8):
  * ``prenet: 'vgg' | 'cnn' | ''`` — VGG 2x(conv3x3,conv3x3,maxpool2) with
    64/128 channels giving 4x time and 4x freq downsampling; CNN = 1-D conv
    downsampler (2x stride-2 convs, 4x time).
  * per-layer RNN options from config lists: ``module LSTM|GRU``,
    ``bidirection``, ``dim``, ``dropout``, ``layer_norm``, ``proj`` (linear +
    tanh after the RNN), and pyramidal subsampling ``sample_rate`` with
    ``sample_style 'drop' | 'concat'`` (concat = LAS pLSTM frame-pair
    concatenation).

TPU-first: convs run channels-last (NHWC) for XLA-TPU layout; RNNs run
time-major ``lax.scan`` cores from ops/rnn.py with all input projections
batched onto the MXU; all shapes static, lengths carried as int32.

The VGG input-dim split follows the reference's rule: feat_dim divisible by
13 => (feat_dim/13) input channels of 13 freq bins (MFCC+deltas), else
divisible by 40 => (feat_dim/40) channels of 40 bins (fbank+deltas).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rnn as rnn_ops


def _uniform(key, shape, fan_in, dtype=jnp.float32):
    s = 1.0 / np.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -s, s)


def _as_list(v, n):
    if isinstance(v, (list, tuple)):
        assert len(v) == n, f"config list length {len(v)} != layers {n}"
        return list(v)
    return [v] * n


# ---------------------------------------------------------------- VGG prenet
class VGGParams(NamedTuple):
    k1: jnp.ndarray; b1: jnp.ndarray
    k2: jnp.ndarray; b2: jnp.ndarray
    k3: jnp.ndarray; b3: jnp.ndarray
    k4: jnp.ndarray; b4: jnp.ndarray


class VGGExtractor:
    """2 conv blocks, each (conv3x3, conv3x3, maxpool2x2): time/4, freq/4."""

    def __init__(self, feat_dim: int):
        if feat_dim % 13 == 0:
            self.in_ch, self.freq = feat_dim // 13, 13
        elif feat_dim % 40 == 0:
            self.in_ch, self.freq = feat_dim // 40, 40
        else:
            self.in_ch, self.freq = 1, feat_dim
        f4 = self.freq // 4  # two stride-2 maxpools (floor, torch semantics)
        self.out_dim = 128 * (f4 if f4 > 0 else 1)
        self.downsample = 4

    def init(self, key) -> VGGParams:
        ks = jax.random.split(key, 4)
        def conv(k, cin, cout):
            fan = 3 * 3 * cin
            return _uniform(k, (3, 3, cin, cout), fan), jnp.zeros((cout,))
        k1, b1 = conv(ks[0], self.in_ch, 64)
        k2, b2 = conv(ks[1], 64, 64)
        k3, b3 = conv(ks[2], 64, 128)
        k4, b4 = conv(ks[3], 128, 128)
        return VGGParams(k1, b1, k2, b2, k3, b3, k4, b4)

    def __call__(self, p: VGGParams, x: jnp.ndarray, x_len: jnp.ndarray,
                 *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x (B, T, D) -> (B, T//4, out_dim); requires T % 4 == 0 (bucketing
        pads to a multiple of the total downsample factor)."""
        B, T, D = x.shape
        x = x.reshape(B, T, self.in_ch, self.freq).transpose(0, 1, 3, 2)
        dn = ("NHWC", "HWIO", "NHWC")  # H=time, W=freq

        def conv(h, k, b):
            return jax.lax.conv_general_dilated(
                h, k, (1, 1), "SAME", dimension_numbers=dn) + b

        def pool(h):
            if train:
                # reduce_window has the faster GRADIENT (select-and-scatter)
                return jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            # inference: reshape+max forward profiled ~10x faster than
            # reduce_window on TPU at these shapes (identical values)
            n, t, f, c = h.shape
            h = h[:, : (t // 2) * 2, : (f // 2) * 2, :]
            h = h.reshape(n, t // 2, 2, f // 2, 2, c)
            return jnp.max(jnp.max(h, axis=4), axis=2)

        h = jax.nn.relu(conv(x, p.k1, p.b1))
        h = jax.nn.relu(conv(h, p.k2, p.b2))
        h = pool(h)
        h = jax.nn.relu(conv(h, p.k3, p.b3))
        h = jax.nn.relu(conv(h, p.k4, p.b4))
        h = pool(h)
        B, T4, F4, C = h.shape
        out = h.transpose(0, 1, 3, 2).reshape(B, T4, C * F4)
        return out, x_len // 4


# ---------------------------------------------------------------- CNN prenet
class CNNParams(NamedTuple):
    k1: jnp.ndarray; b1: jnp.ndarray
    k2: jnp.ndarray; b2: jnp.ndarray


class CNNExtractor:
    """1-D conv downsampler: two stride-2 convs => time/4 (SURVEY.md 2.8)."""

    def __init__(self, feat_dim: int, out_dim: int):
        self.in_dim = feat_dim
        self.out_dim = out_dim
        self.downsample = 4

    def init(self, key) -> CNNParams:
        k1, k2 = jax.random.split(key)
        return CNNParams(
            _uniform(k1, (4, self.in_dim, self.out_dim), 4 * self.in_dim),
            jnp.zeros((self.out_dim,)),
            _uniform(k2, (4, self.out_dim, self.out_dim), 4 * self.out_dim),
            jnp.zeros((self.out_dim,)),
        )

    def __call__(self, p: CNNParams, x: jnp.ndarray, x_len: jnp.ndarray,
                 *, train: bool = False):
        dn = ("NWC", "WIO", "NWC")
        h = jax.lax.conv_general_dilated(
            x, p.k1, (2,), "SAME", dimension_numbers=dn) + p.b1
        h = jax.nn.relu(h)
        h = jax.lax.conv_general_dilated(
            h, p.k2, (2,), "SAME", dimension_numbers=dn) + p.b2
        h = jax.nn.relu(h)
        return h, x_len // 4


# ------------------------------------------------------------------ RNN layer
class RNNLayerParams(NamedTuple):
    fwd: Any                          # LSTMWeights | GRUWeights
    bwd: Optional[Any]                # same, or None if unidirectional
    ln_scale: Optional[jnp.ndarray]   # (D,) layer norm
    ln_bias: Optional[jnp.ndarray]
    w_proj: Optional[jnp.ndarray]     # (D, D) projection
    b_proj: Optional[jnp.ndarray]


class RNNLayer:
    """One (Bi)RNN layer + dropout/LN + optional proj + pyramidal subsample."""

    def __init__(self, in_dim: int, module: str, dim: int, bidirection: bool,
                 dropout: float, layer_norm: bool, sample_rate: int,
                 sample_style: str, proj: bool):
        self.module = module.lower()
        self.dim = dim
        self.bidirection = bidirection
        self.dropout = dropout
        self.layer_norm = layer_norm
        self.sample_rate = int(sample_rate)
        self.sample_style = sample_style
        self.proj = proj
        self.in_dim = in_dim
        rnn_out = dim * (2 if bidirection else 1)
        self.out_dim = rnn_out
        if self.sample_rate > 1 and sample_style == "concat":
            self.out_dim *= self.sample_rate
        if sample_style not in ("drop", "concat"):
            raise ValueError(f"unsupported sample_style {sample_style!r}")

    def init(self, key) -> RNNLayerParams:
        ks = jax.random.split(key, 4)
        init_fn = rnn_ops.init_lstm if self.module == "lstm" else rnn_ops.init_gru
        fwd = init_fn(ks[0], self.in_dim, self.dim)
        bwd = init_fn(ks[1], self.in_dim, self.dim) if self.bidirection else None
        rnn_out = self.dim * (2 if self.bidirection else 1)
        ln_scale = jnp.ones((rnn_out,)) if self.layer_norm else None
        ln_bias = jnp.zeros((rnn_out,)) if self.layer_norm else None
        w_proj = _uniform(ks[2], (rnn_out, rnn_out), rnn_out) if self.proj else None
        b_proj = jnp.zeros((rnn_out,)) if self.proj else None
        return RNNLayerParams(fwd, bwd, ln_scale, ln_bias, w_proj, b_proj)

    def __call__(self, p: RNNLayerParams, x: jnp.ndarray, x_len: jnp.ndarray,
                 *, train: bool = False, rng=None):
        """x (B, T, D) batch-major; returns (B, T', out_dim), new lengths."""
        xt = jnp.swapaxes(x, 0, 1)                       # (T, B, D)
        T, B, _ = xt.shape
        mask = jnp.arange(T)[:, None] < x_len[None, :]
        scan = rnn_ops.lstm_scan if self.module == "lstm" else rnn_ops.gru_scan
        if self.bidirection:
            h = rnn_ops.bidirectional(scan, p.fwd, p.bwd, xt, mask)
        else:
            h = scan(p.fwd, xt, mask)
        h = jnp.swapaxes(h, 0, 1)                        # (B, T, rnn_out)
        if p.ln_scale is not None:
            mu = jnp.mean(h, -1, keepdims=True)
            var = jnp.var(h, -1, keepdims=True)
            h = (h - mu) * jax.lax.rsqrt(var + 1e-5) * p.ln_scale + p.ln_bias
        if train and self.dropout > 0 and rng is not None:
            keep = 1.0 - self.dropout
            h = h * jax.random.bernoulli(rng, keep, h.shape) / keep
        if p.w_proj is not None:
            h = jnp.tanh(jnp.dot(h, p.w_proj,
                                 preferred_element_type=jnp.float32) + p.b_proj)
        if self.sample_rate > 1:
            r = self.sample_rate
            Bc, Tc, Dc = h.shape
            if self.sample_style == "drop":
                h = h[:, ::r]
                x_len = (x_len + r - 1) // r
            else:  # concat adjacent frames (pLSTM)
                Tt = (Tc // r) * r
                h = h[:, :Tt].reshape(Bc, Tt // r, Dc * r)
                x_len = x_len // r
        return h, x_len


# ------------------------------------------------------------------- Encoder
class EncoderParams(NamedTuple):
    prenet: Optional[Any]
    layers: Tuple[RNNLayerParams, ...]


class Encoder:
    """Full listener. Config mirrors the reference YAML encoder block."""

    def __init__(self, feat_dim: int, cfg: Dict[str, Any]):
        self.cfg = cfg
        prenet = cfg.get("prenet", "")
        module = cfg.get("module", "LSTM")
        dims: List[int] = list(cfg["dim"]) if isinstance(cfg["dim"], (list, tuple)) else [cfg["dim"]]
        n = len(dims)
        bidir = bool(cfg.get("bidirection", True))
        dropout = _as_list(cfg.get("dropout", 0.0), n)
        layer_norm = _as_list(cfg.get("layer_norm", False), n)
        proj = _as_list(cfg.get("proj", False), n)
        sample_rate = _as_list(cfg.get("sample_rate", 1), n)
        sample_style = cfg.get("sample_style", "drop")

        self.prenet_type = prenet
        in_dim = feat_dim
        if prenet == "vgg":
            self.prenet = VGGExtractor(feat_dim)
            in_dim = self.prenet.out_dim
        elif prenet == "cnn":
            self.prenet = CNNExtractor(feat_dim, dims[0])
            in_dim = dims[0]
        elif prenet in ("", None, "none"):
            self.prenet = None
        else:
            raise NotImplementedError(f"prenet {prenet!r}")

        self.layers: List[RNNLayer] = []
        for i in range(n):
            layer = RNNLayer(in_dim, module, dims[i], bidir, dropout[i],
                             layer_norm[i], sample_rate[i], sample_style,
                             proj[i])
            self.layers.append(layer)
            in_dim = layer.out_dim
        self.out_dim = in_dim
        # total time downsampling factor (for bucket padding)
        ds = self.prenet.downsample if self.prenet else 1
        for layer, r in zip(self.layers, sample_rate):
            ds *= layer.sample_rate
        self.downsample = ds

    def init(self, key) -> EncoderParams:
        ks = jax.random.split(key, len(self.layers) + 1)
        prenet = self.prenet.init(ks[0]) if self.prenet else None
        layers = tuple(l.init(k) for l, k in zip(self.layers, ks[1:]))
        return EncoderParams(prenet, layers)

    def __call__(self, p: EncoderParams, feat: jnp.ndarray,
                 feat_len: jnp.ndarray, *, train: bool = False, rng=None):
        h, h_len = feat, feat_len
        if self.prenet is not None:
            h, h_len = self.prenet(p.prenet, h, h_len, train=train)
        rngs = (jax.random.split(rng, len(self.layers))
                if rng is not None else [None] * len(self.layers))
        for layer, lp, r in zip(self.layers, p.layers, rngs):
            h, h_len = layer(lp, h, h_len, train=train, rng=r)
        # zero padded frames so downstream masked ops stay clean
        T = h.shape[1]
        mask = (jnp.arange(T)[None, :] < h_len[:, None])[..., None]
        return jnp.where(mask, h, 0.0), h_len
