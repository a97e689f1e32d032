"""Embedding-regularization plugin + fused decoding.

Capability parity with the reference's ``src/plugin.py:EmbeddingRegularizer``
(SURVEY.md 2.18; Liu et al. 2020, "word-embedding regularization & fused
decoding"): an auxiliary loss pulling per-step decoder states toward
pretrained target-token embeddings (cosine distance, weight ``weight``), and
fused decoding where the output distribution is
``fuse_lambda * P_emb + (1 - fuse_lambda) * P_char`` with ``P_emb`` a
temperature softmax over cosine similarities to the embedding table.

The pretrained table comes from ``utils/bert_embedding.py`` (a ``.npy`` of
shape (vocab, emb_dim)); it is fixed (not trained). The plugin's learnable
part is a linear projection from decoder dim to embedding dim.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PluginParams(NamedTuple):
    w_proj: jnp.ndarray   # (dec_dim, emb_dim)
    b_proj: jnp.ndarray   # (emb_dim,)


class EmbeddingRegularizer:
    def __init__(self, cfg: Dict[str, Any], vocab_size: int, dec_dim: int,
                 tokenizer=None):
        src = cfg["src"]
        if str(src).endswith(".vec"):
            # fasttext/word2vec text format (SURVEY.md 2.18's fasttext
            # path); needs the tokenizer to align rows to vocab ids
            if tokenizer is None:
                raise ValueError("plugin src is a .vec file; the caller "
                                 "must pass the tokenizer")
            from ..utils.bert_embedding import load_vec_table
            table = load_vec_table(src, tokenizer)
        else:
            table = np.load(src).astype(np.float32)
        assert table.shape[0] == vocab_size, (
            f"embedding table rows {table.shape[0]} != vocab {vocab_size}")
        norm = np.linalg.norm(table, axis=1, keepdims=True)
        self.table = jnp.asarray(table / np.maximum(norm, 1e-8))
        self.emb_dim = table.shape[1]
        self.dec_dim = dec_dim
        self.weight = float(cfg.get("weight", 1.0))
        self.fuse_lambda = float(cfg.get("fuse", 0.0))
        self.temperature = float(cfg.get("temp", 1.0))
        self.apply_fuse = self.fuse_lambda > 0.0

    def init(self, key) -> PluginParams:
        s = 1.0 / np.sqrt(self.dec_dim)
        return PluginParams(
            jax.random.uniform(key, (self.dec_dim, self.emb_dim),
                               jnp.float32, -s, s),
            jnp.zeros((self.emb_dim,)))

    def _project(self, p: PluginParams, dec_state: jnp.ndarray) -> jnp.ndarray:
        proj = jnp.dot(dec_state, p.w_proj,
                       preferred_element_type=jnp.float32) + p.b_proj
        return proj * jax.lax.rsqrt(
            jnp.sum(proj * proj, -1, keepdims=True) + 1e-8)

    def loss(self, p: PluginParams, dec_states: jnp.ndarray,
             targets: jnp.ndarray) -> jnp.ndarray:
        """Mean (1 - cos) distance between projected decoder states (B, U, D)
        and the target tokens' pretrained embeddings, pad-masked."""
        proj = self._project(p, dec_states)                   # (B, U, E) unit
        tgt = self.table[targets]                             # (B, U, E) unit
        cos = jnp.sum(proj * tgt, axis=-1)
        mask = (targets != 0).astype(cos.dtype)
        dist = (1.0 - cos) * mask
        return self.weight * jnp.sum(dist) / jnp.maximum(jnp.sum(mask), 1.0)

    def fused_log_prob(self, p: PluginParams, dec_state: jnp.ndarray,
                       char_logits: jnp.ndarray) -> jnp.ndarray:
        """Decode-time fusion: log[ l * P_emb + (1-l) * P_char ]."""
        proj = self._project(p, dec_state)                    # (B, E)
        sim = jnp.dot(proj, self.table.T,
                      preferred_element_type=jnp.float32)     # (B, V)
        p_emb = jax.nn.softmax(sim / self.temperature, -1)
        p_char = jax.nn.softmax(char_logits, -1)
        lam = self.fuse_lambda
        return jnp.log(lam * p_emb + (1.0 - lam) * p_char + 1e-10)
