"""SpecAugment (Park et al. 2019): time and frequency masking on features.

Not present in the reference (it predates widespread adoption) — an opt-in
extension under ``data.audio.augment``; applied inside the jitted train step
only, after the front-end and before the encoder. Fully vectorized: mask
positions are drawn per utterance with jax.random, applied with iota
comparisons (no data-dependent shapes).

Config keys (all optional):
  augment:
    freq_mask_n: 2        # number of frequency masks
    freq_mask_width: 27   # max width per mask (F dimension)
    time_mask_n: 2        # number of time masks
    time_mask_width: 40   # max width per mask (frames)
    time_mask_ratio: 0.2  # cap: total masked frames <= ratio * length
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def spec_augment(feat: jnp.ndarray, feat_len: jnp.ndarray, rng,
                 cfg: Dict[str, Any]) -> jnp.ndarray:
    """feat (B, T, F), feat_len (B,) -> masked features (masked bins = 0,
    matching CMVN'd zero-mean semantics)."""
    B, T, F = feat.shape
    fn = int(cfg.get("freq_mask_n", 2))
    fw = int(cfg.get("freq_mask_width", min(27, F)))
    tn = int(cfg.get("time_mask_n", 2))
    tw = int(cfg.get("time_mask_width", 40))
    ratio = float(cfg.get("time_mask_ratio", 0.2))

    keep = jnp.ones((B, T, F), bool)
    t_ids = jnp.arange(T)[None, :]
    f_ids = jnp.arange(F)[None, :]

    for i in range(fn):
        rng, k1, k2 = jax.random.split(rng, 3)
        width = jax.random.randint(k1, (B, 1), 0, fw + 1)
        start = jax.random.randint(k2, (B, 1), 0, jnp.maximum(F - width, 1))
        m = (f_ids >= start) & (f_ids < start + width)        # (B, F)
        keep = keep & ~m[:, None, :]

    max_t = jnp.maximum((ratio * feat_len).astype(jnp.int32) // max(tn, 1), 0)
    for i in range(tn):
        rng, k1, k2 = jax.random.split(rng, 3)
        width = jax.random.randint(k1, (B, 1), 0, tw + 1)
        width = jnp.minimum(width, max_t[:, None])
        limit = jnp.maximum(feat_len[:, None] - width, 1)
        # randint accepts traced per-row bounds (same pattern as the freq
        # branch); the old randint(0, T) % limit was modulo-biased toward
        # low frame indices whenever limit does not divide T
        start = jax.random.randint(k2, (B, 1), 0, limit)
        m = (t_ids >= start) & (t_ids < start + width)        # (B, T)
        keep = keep & ~m[:, :, None]

    return jnp.where(keep, feat, 0.0)
