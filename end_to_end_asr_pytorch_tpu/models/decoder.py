"""Speller/decoder: stacked LSTM/GRU cells advanced one label step at a time.

Capability parity with the reference's ``src/asr.py:Decoder`` (SURVEY.md 2.7):
``module LSTM|GRU``, ``dim``, ``layer``, ``dropout``; input at each step is
``[char_embedding ; attention_context]``; exposes its hidden state as the
attention query.

TPU-first: the decoder is a pure step function over an explicit
``DecoderState`` pytree — the training loop wraps it in a ``lax.scan`` over
label positions, and beam search advances (B*K) folded states in a
``lax.while_loop``; no Python-side state (the reference keeps
``self.hidden_state`` on the module).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rnn as rnn_ops


class DecoderState(NamedTuple):
    h: jnp.ndarray                 # (L, B, H)
    c: Optional[jnp.ndarray]       # (L, B, H) for LSTM, None for GRU


class DecoderParams(NamedTuple):
    cells: Tuple[Any, ...]         # per-layer LSTMWeights | GRUWeights


class Decoder:
    def __init__(self, in_dim: int, cfg: Dict[str, Any]):
        self.module = cfg.get("module", "LSTM").lower()
        self.dim = int(cfg["dim"])
        self.layers = int(cfg.get("layer", 1))
        self.dropout = float(cfg.get("dropout", 0.0))
        self.in_dim = in_dim
        self.out_dim = self.dim

    def init(self, key) -> DecoderParams:
        ks = jax.random.split(key, self.layers)
        init_fn = rnn_ops.init_lstm if self.module == "lstm" else rnn_ops.init_gru
        cells = []
        d = self.in_dim
        for i in range(self.layers):
            cells.append(init_fn(ks[i], d, self.dim))
            d = self.dim
        return DecoderParams(tuple(cells))

    def init_state(self, batch: int, dtype=jnp.float32) -> DecoderState:
        h = jnp.zeros((self.layers, batch, self.dim), dtype)
        c = h if self.module == "lstm" else None
        return DecoderState(h, c)

    def query(self, state: DecoderState) -> jnp.ndarray:
        """Attention query = top-layer hidden state (B, H)."""
        return state.h[-1]

    def step(self, p: DecoderParams, state: DecoderState,
             x: Optional[jnp.ndarray] = None, *, train: bool = False,
             rng=None, x0_proj: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, DecoderState]:
        """x (B, in_dim) -> (output (B, dim), new state).

        ``x0_proj`` (B, gates) optionally supplies the FIRST layer's input
        projection directly (bias included) — the beam decoder precomputes
        the embedding half as a (V, gates) table, so the per-step
        (B*K, emb) @ (emb, gates) matmul collapses to a 31-row lookup.
        """
        hs, cs = [], []
        inp = x
        # rng splits are real per-step serial work inside the label scan —
        # only pay for them when dropout can actually fire (inter-layer
        # dropout needs layers > 1)
        need_rng = (train and self.dropout > 0 and rng is not None
                    and self.layers > 1)
        rngs = (jax.random.split(rng, self.layers)
                if need_rng else [None] * self.layers)
        for i, w in enumerate(p.cells):
            if i == 0 and x0_proj is not None:
                x_proj = x0_proj
            elif self.module == "lstm":
                x_proj = jnp.dot(inp, w.w_ih,
                                 preferred_element_type=jnp.float32) + w.b
            else:
                x_proj = jnp.dot(inp, w.w_ih,
                                 preferred_element_type=jnp.float32) + w.b_ih
            if self.module == "lstm":
                h_new, c_new = rnn_ops.lstm_cell(w, state.h[i], state.c[i], x_proj)
                cs.append(c_new)
            else:
                h_new = rnn_ops.gru_cell(w, state.h[i], x_proj)
            if train and self.dropout > 0 and rngs[i] is not None and i < self.layers - 1:
                keep = 1.0 - self.dropout
                h_out = h_new * jax.random.bernoulli(rngs[i], keep, h_new.shape) / keep
            else:
                h_out = h_new
            hs.append(h_new)
            inp = h_out
        new_state = DecoderState(
            jnp.stack(hs), jnp.stack(cs) if self.module == "lstm" else None)
        return inp, new_state
