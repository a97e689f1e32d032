"""RNN language model for separate training and shallow-fusion decoding.

Capability parity with the reference's ``src/lm.py:RNNLM`` (SURVEY.md 2.17):
embedding (with optional input/output ``emb_tying``), dropout, n-layer
LSTM/GRU, linear to vocab; forward returns ``(pred, hidden)`` so beam search
can advance it incrementally.

TPU-first: full-sequence training runs the time scan from ops/rnn.py; the
incremental path is a pure step over an explicit ``DecoderState``-style
pytree, vmappable over (B*K) beam hypotheses.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rnn as rnn_ops


def _uniform(key, shape, fan_in, dtype=jnp.float32):
    s = 1.0 / np.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -s, s)


class LMState(NamedTuple):
    h: jnp.ndarray                  # (L, B, H)
    c: Optional[jnp.ndarray]        # (L, B, H) LSTM only


class RNNLMParams(NamedTuple):
    embed: jnp.ndarray              # (V, E)
    cells: Tuple[Any, ...]
    out_w: Optional[jnp.ndarray]    # (H, V); None when emb_tying (uses embed.T)
    out_b: jnp.ndarray              # (V,)


class RNNLM:
    def __init__(self, vocab_size: int, cfg: Dict[str, Any]):
        self.vocab_size = vocab_size
        self.module = cfg.get("module", "LSTM").lower()
        self.emb_dim = int(cfg.get("emb_dim", cfg.get("dim", 512)))
        self.dim = int(cfg["dim"])
        self.n_layers = int(cfg.get("layer", 1))
        self.dropout = float(cfg.get("dropout", 0.0))
        self.emb_tying = bool(cfg.get("emb_tying", False))
        if self.emb_tying:
            assert self.emb_dim == self.dim, "emb_tying needs emb_dim == dim"

    def init(self, key) -> RNNLMParams:
        ks = jax.random.split(key, self.n_layers + 2)
        embed = _uniform(ks[0], (self.vocab_size, self.emb_dim), self.emb_dim)
        init_fn = rnn_ops.init_lstm if self.module == "lstm" else rnn_ops.init_gru
        cells, d = [], self.emb_dim
        for i in range(self.n_layers):
            cells.append(init_fn(ks[i + 1], d, self.dim))
            d = self.dim
        out_w = (None if self.emb_tying
                 else _uniform(ks[-1], (self.dim, self.vocab_size), self.dim))
        return RNNLMParams(embed, tuple(cells), out_w,
                           jnp.zeros((self.vocab_size,)))

    def init_state(self, batch: int, dtype=jnp.float32) -> LMState:
        h = jnp.zeros((self.n_layers, batch, self.dim), dtype)
        return LMState(h, h if self.module == "lstm" else None)

    def _logits(self, p: RNNLMParams, h: jnp.ndarray) -> jnp.ndarray:
        w = p.embed.T if p.out_w is None else p.out_w
        return jnp.dot(h, w, preferred_element_type=jnp.float32) + p.out_b

    def emb_proj_table(self, p: RNNLMParams) -> jnp.ndarray:
        """(V, gates) first-layer input projection of every token's embedding
        (bias folded in) — the beam decoder's per-step LM input is ONLY the
        previous token, so its whole (B*K, E) @ (E, gates) matmul collapses
        to a V-row lookup."""
        w = p.cells[0]
        b = w.b if self.module == "lstm" else w.b_ih
        t = jnp.dot(p.embed, w.w_ih,
                    preferred_element_type=jnp.float32) + b
        return t.astype(p.embed.dtype)

    def step(self, p: RNNLMParams, state: LMState, token: jnp.ndarray,
             emb_proj: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, LMState]:
        """token (B,) int32 -> (logits (B, V), new state). Incremental path.

        ``emb_proj`` (V, gates): optional precomputed first-layer input
        projection table (see emb_proj_table)."""
        inp = None if emb_proj is not None else p.embed[token]
        hs, cs = [], []
        for i, w in enumerate(p.cells):
            if i == 0 and emb_proj is not None:
                # one-hot matmul beats a row-gather on TPU (see
                # ASR.decode_step_beam); exact — one nonzero term per row
                oh = jax.nn.one_hot(token, emb_proj.shape[0],
                                    dtype=emb_proj.dtype)
                x_proj = jnp.dot(oh, emb_proj,
                                 preferred_element_type=jnp.float32)
            else:
                b = w.b if self.module == "lstm" else w.b_ih
                x_proj = jnp.dot(inp, w.w_ih,
                                 preferred_element_type=jnp.float32) + b
            if self.module == "lstm":
                h_new, c_new = rnn_ops.lstm_cell(w, state.h[i], state.c[i], x_proj)
                cs.append(c_new)
            else:
                h_new = rnn_ops.gru_cell(w, state.h[i], x_proj)
            hs.append(h_new)
            inp = h_new
        new_state = LMState(jnp.stack(hs),
                            jnp.stack(cs) if self.module == "lstm" else None)
        return self._logits(p, inp), new_state

    def forward(self, p: RNNLMParams, tokens: jnp.ndarray,
                lengths: jnp.ndarray, *, train: bool = False, rng=None
                ) -> jnp.ndarray:
        """Full-sequence path for LM training.

        tokens (B, U) [input sequence], lengths (B,) -> logits (B, U, V).
        """
        B, U = tokens.shape
        x = p.embed[tokens]
        if train and self.dropout > 0 and rng is not None:
            rng, r = jax.random.split(rng)
            keep = 1.0 - self.dropout
            x = x * jax.random.bernoulli(r, keep, x.shape) / keep
        xt = jnp.swapaxes(x, 0, 1)                    # (U, B, E)
        mask = jnp.arange(U)[:, None] < lengths[None, :]
        scan = rnn_ops.lstm_scan if self.module == "lstm" else rnn_ops.gru_scan
        h = xt
        for i, w in enumerate(p.cells):
            h = scan(w, h, mask)
            if train and self.dropout > 0 and rng is not None and i < self.n_layers - 1:
                rng, r = jax.random.split(rng)
                keep = 1.0 - self.dropout
                h = h * jax.random.bernoulli(r, keep, h.shape) / keep
        h = jnp.swapaxes(h, 0, 1)                     # (B, U, H)
        return self._logits(p, h)
