"""Attention mechanisms: scaled-dot and location-aware (Chorowski 2015).

Capability parity with the reference's ``src/module.py`` attention classes and
the ``src/asr.py:Attention`` head wrapper (SURVEY.md 2.7/2.8): modes
``'dot' | 'loc'``, multi-head (``num_head``), softmax ``temperature``,
optional value projection (``v_proj``), and for 'loc' a conv over the
previous alignment feeding the energy (``loc_kernel_size``/``loc_kernel_num``).

TPU-first design: static hyperparameters live on the ``Attention`` object
(captured by closure at trace time); learnable weights are a pure-array
pytree. Key/value projections are precomputed ONCE per utterance
(``precompute``) into an ``AttCache``; the per-step function is a pure
``(params, cache, query, prev_align) -> (context, align)`` map with no Python
state, so the same code runs inside the training label scan, the greedy
scan, and the batched beam-search loop (hypotheses folded into the batch dim).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, fan_in, dtype=jnp.float32):
    s = 1.0 / np.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -s, s)


class AttentionParams(NamedTuple):
    w_q: jnp.ndarray                  # (Dq, H*dim)
    w_k: jnp.ndarray                  # (Dk, H*dim)
    w_v: Optional[jnp.ndarray]        # (Dk, H*v_dim) or None (identity values)
    w_merge: Optional[jnp.ndarray]    # (H*v_dim, v_dim) multi-head merge
    loc_conv: Optional[jnp.ndarray]   # (kernel, 1, n_filt)   ('loc' only)
    w_f: Optional[jnp.ndarray]        # (n_filt, dim)         ('loc' only)
    bias: Optional[jnp.ndarray]       # (H*dim,)              ('loc' only)
    v_energy: Optional[jnp.ndarray]   # (H, dim)              ('loc' only)


class AttCache(NamedTuple):
    keys: jnp.ndarray      # (B, H, T, dim) projected keys
    values: jnp.ndarray    # (B, T, H*v_dim) or raw enc (B, T, Dk)
    mask: jnp.ndarray      # (B, T) bool valid
    inv_len: jnp.ndarray   # (B, 1) 1/enc_len
    loc_band: Optional[jnp.ndarray] = None  # (T, T*n_filt) Toeplitz loc conv
    # lane-padded parameter copies for the beam loop (pad_lanes only):
    # (w_q_pad (Dq, H*d_pad), w_f_pad (F, d_pad), bias_pad (H, d_pad),
    # v_energy_pad (H, d_pad)). XLA does not hoist the per-step jnp.pad of
    # these loop invariants out of the decode while body, so they are
    # precomputed once here — mathematically inert zero columns.
    p_pad: Optional[tuple] = None


class Attention:
    """Static attention module; all methods are pure in (params, arrays)."""

    def __init__(self, cfg: Dict[str, Any], query_dim: int, key_dim: int):
        self.mode = cfg.get("mode", "loc")
        if self.mode not in ("dot", "loc"):
            raise NotImplementedError(f"attention mode {self.mode!r}")
        self.num_head = int(cfg.get("num_head", 1))
        self.dim = int(cfg.get("dim", 300))
        self.temperature = float(cfg.get("temperature", 0.5))
        self.v_proj = bool(cfg.get("v_proj", True))
        self.loc_kernel_size = int(cfg.get("loc_kernel_size", 100))
        self.loc_kernel_num = int(cfg.get("loc_kernel_num", 10))
        self.query_dim = query_dim
        self.key_dim = key_dim
        self.v_dim = self.dim if self.v_proj else key_dim
        # context fed to the decoder: merged back to v_dim for multi-head
        self.context_dim = self.v_dim
        # lane-pad the per-head attention dim: zero columns in the q/k/f
        # projections and zero entries in the energy vector change nothing
        # mathematically (tanh contributions multiply v's zero pad), but a
        # 128-aligned minor dim saves XLA's 27 MB/step relayout copies in the
        # beam loop (profiled +8% decode throughput at the reference's 300).
        self.d_pad = ((self.dim + 127) // 128) * 128
        # Optional fused Pallas step for the beam decoder (loc, single-head).
        # Default OFF: measured slower than XLA's broadcast fusion at beam
        # shapes (420 vs 465 utts/sec) — per-grid-cell overhead dominates the
        # saved HBM traffic. Kept for larger-T/K regimes via cfg use_pallas.
        self.use_pallas = bool(cfg.get("use_pallas", False))
        # Fused TRAIN attention step with a hand VJP (loc, single-head,
        # v_proj): keeps the (B,T,d) tanh chain in VMEM in forward,
        # rematerialized forward AND backward (ops/pallas/att_train_kernel)
        self.use_pallas_train = bool(cfg.get("use_pallas_train", False))

    def init(self, key) -> AttentionParams:
        ks = jax.random.split(key, 8)
        H, d = self.num_head, self.dim
        w_q = _uniform(ks[0], (self.query_dim, H * d), self.query_dim)
        w_k = _uniform(ks[1], (self.key_dim, H * d), self.key_dim)
        w_v = (_uniform(ks[2], (self.key_dim, H * self.v_dim), self.key_dim)
               if self.v_proj else None)
        w_merge = (_uniform(ks[3], (H * self.v_dim, self.v_dim), H * self.v_dim)
                   if H > 1 else None)
        loc_conv = w_f = bias = v_energy = None
        if self.mode == "loc":
            loc_conv = _uniform(ks[4], (self.loc_kernel_size, 1,
                                        self.loc_kernel_num),
                                self.loc_kernel_size)
            w_f = _uniform(ks[5], (self.loc_kernel_num, d), self.loc_kernel_num)
            bias = jnp.zeros((H * d,))
            v_energy = _uniform(ks[6], (H, d), d)
        return AttentionParams(w_q, w_k, w_v, w_merge, loc_conv, w_f, bias,
                               v_energy)

    def precompute(self, p: AttentionParams, enc: jnp.ndarray,
                   enc_len: jnp.ndarray, pad_lanes: bool = False,
                   amp: bool = False) -> AttCache:
        """enc (B, T, Dk), enc_len (B,) -> cached projections.

        pad_lanes=True zero-pads the per-head dim to the 128-lane boundary —
        used by the beam decoder, where it removes 27 MB/step relayout
        copies (+10% decode); the training scan skips it (the extra padded
        flops over U label steps measured a net slowdown there).

        amp=True stores keys/values in bfloat16: they are re-read from HBM
        on EVERY decode step (the beam loop's dominant bandwidth), so this
        halves that traffic; the energy chain then runs bf16 with f32
        softmax/score accumulation. Measured top-1 beam sequences identical
        to f32 (n-best tails can reorder within rounding)."""
        B, T, _ = enc.shape
        keys = jnp.dot(enc, p.w_k, preferred_element_type=jnp.float32)
        keys = keys.reshape(B, T, self.num_head, self.dim).transpose(0, 2, 1, 3)
        if pad_lanes and self.d_pad != self.dim:
            keys = jnp.pad(keys, ((0, 0), (0, 0), (0, 0),
                                  (0, self.d_pad - self.dim)))
        vals = (jnp.dot(enc, p.w_v, preferred_element_type=jnp.float32)
                if p.w_v is not None else enc)
        if amp:
            keys = keys.astype(jnp.bfloat16)
            vals = vals.astype(jnp.bfloat16)
        mask = jnp.arange(T)[None, :] < enc_len[:, None]
        inv_len = 1.0 / jnp.maximum(enc_len, 1).astype(jnp.float32)
        loc_band = (self._loc_band(p, T) if self.mode == "loc" else None)
        p_pad = None
        if pad_lanes and self.d_pad != self.dim:
            padw = self.d_pad - self.dim
            H = self.num_head
            w_q_pad = jnp.pad(
                p.w_q.reshape(self.query_dim, H, self.dim),
                ((0, 0), (0, 0), (0, padw))).reshape(self.query_dim,
                                                     H * self.d_pad)
            if self.mode == "loc":
                p_pad = (w_q_pad,
                         jnp.pad(p.w_f, ((0, 0), (0, padw))),
                         jnp.pad(p.bias.reshape(H, self.dim),
                                 ((0, 0), (0, padw))),
                         jnp.pad(p.v_energy, ((0, 0), (0, padw))))
            else:
                p_pad = (w_q_pad, None, None, None)
        return AttCache(keys, vals, mask, inv_len[:, None], loc_band, p_pad)

    def _loc_band(self, p: AttentionParams, T: int) -> jnp.ndarray:
        """Location conv as a (T, T*F) Toeplitz band matrix.

        Computed once per decode call (loop-invariant); the beam loop then
        gets its location features from ONE clean (B*K, T) @ (T, T*F)
        matmul instead of a strided conv over (B*K, T, 1) — which profiled
        at 124 us/step at B=128 (a 75 us layout copy feeding a 49 us conv).
        Matches XLA's SAME-padding conv semantics exactly (incl. even
        kernel sizes): verified to fp32 rounding in tests."""
        ks, _, F = p.loc_conv.shape
        pad_low = (ks - 1) // 2
        t_in = jnp.arange(T)[:, None]
        t_out = jnp.arange(T)[None, :]
        idx = t_in - t_out + pad_low
        valid = (idx >= 0) & (idx < ks)
        W = jnp.where(valid[..., None],
                      p.loc_conv[jnp.clip(idx, 0, ks - 1), 0, :], 0.0)
        return W.reshape(T, T * F).astype(jnp.float32)

    def init_align(self, cache: AttCache) -> jnp.ndarray:
        """Alignment 'before step 0': uniform over valid frames (B, H, T).
        Always float32 — the alignment is a scan carry and softmax output."""
        B, H, T, _ = cache.keys.shape
        uni = jnp.where(cache.mask[:, None, :], cache.inv_len[:, :, None], 0.0)
        return jnp.broadcast_to(uni, (B, H, T)).astype(jnp.float32)

    def step(self, p: AttentionParams, cache: AttCache, query: jnp.ndarray,
             prev_align: jnp.ndarray):
        """query (B, Dq), prev_align (B, H, T) ->
        (context (B, context_dim), align (B, H, T))."""
        B, H, T, d = cache.keys.shape        # d == dim, or d_pad if padded
        pad = d - self.dim
        cd = cache.keys.dtype  # f32, or bf16 when the cache was built with
        # amp (training --amp builds a bf16 cache: the tanh chain + its VJP
        # then run bf16, halving the label scan's per-step key traffic)
        q = jnp.dot(query, p.w_q, preferred_element_type=jnp.float32)
        q = jnp.pad(q.reshape(B, H, self.dim), ((0, 0), (0, 0), (0, pad)))

        if self.mode == "dot":
            energy = jnp.einsum("bhd,bhtd->bht", q.astype(cd), cache.keys,
                                preferred_element_type=jnp.float32)
        else:
            # NOTE (measured, do not "fix"): unlike step_beam, this path
            # keeps the strided conv. Swapping in the Toeplitz band matmul
            # regressed TRAINING 92 -> 102 ms/step at B=128/U=96: under
            # autodiff the loop-invariant (T, T*F) band collects a ~1.2 MB
            # cotangent accumulation in every backward scan step, while the
            # conv VJP accumulates only the (ks, 1, F) kernel gradient.
            a = jnp.sum(prev_align, axis=1)[:, :, None]           # (B, T, 1)
            f = jax.lax.conv_general_dilated(
                a.astype(p.loc_conv.dtype), p.loc_conv,
                window_strides=(1,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"))          # (B, T, F)
            f = jnp.dot(f, jnp.pad(p.w_f, ((0, 0), (0, pad))),
                        preferred_element_type=jnp.float32)
            qb = q + jnp.pad(p.bias.reshape(H, self.dim),
                             ((0, 0), (0, pad)))[None]
            use_fused = (self.use_pallas_train and H == 1
                         and p.w_v is not None and p.w_merge is None)
            if use_fused:
                use_fused = jax.default_backend() not in ("cpu",)
            if use_fused:
                # fused energy+softmax+context step with hand VJP: the
                # (B,T,d) tanh chain never touches HBM (fwd, remat, bwd)
                from ..ops.pallas.att_train_kernel import loc_att_train
                enc_len = jnp.maximum(
                    jnp.sum(cache.mask.astype(jnp.int32), axis=1), 1)
                ctx, align = loc_att_train(
                    qb[:, 0].astype(cd), cache.keys[:, 0],
                    f.astype(cd), p.v_energy[0].astype(cd)
                    if pad == 0 else jnp.pad(p.v_energy,
                                             ((0, 0), (0, pad)))[0]
                    .astype(cd),
                    cache.values.astype(cd), enc_len,
                    self.temperature)
                return ctx, align[:, None, :]
            tanh_arg = (qb.astype(cd)[:, :, None, :] + cache.keys
                        + f.astype(cd)[:, None, :, :])
            v_pad = jnp.pad(p.v_energy, ((0, 0), (0, pad)))
            energy = jnp.einsum("bhtd,hd->bht", jnp.tanh(tanh_arg),
                                v_pad.astype(cd),
                                preferred_element_type=jnp.float32)
        energy = energy / self.temperature
        energy = jnp.where(cache.mask[:, None, :], energy, -1e30)
        align = jax.nn.softmax(energy, axis=-1)

        if p.w_v is not None:
            vals = cache.values.reshape(B, T, H, self.v_dim).transpose(0, 2, 1, 3)
            ctx = jnp.einsum("bht,bhtv->bhv", align.astype(cd), vals,
                             preferred_element_type=jnp.float32)
            ctx = ctx.reshape(B, H * self.v_dim)
        else:
            ctx = jnp.einsum("bht,btv->bhv", align.astype(cd), cache.values,
                             preferred_element_type=jnp.float32)
            ctx = ctx.reshape(B, H * self.v_dim)
        if p.w_merge is not None:
            ctx = jnp.dot(ctx, p.w_merge, preferred_element_type=jnp.float32)
        return ctx, align

    def step_beam(self, p: AttentionParams, cache: AttCache,
                  query: jnp.ndarray, prev_align: jnp.ndarray):
        """Beam-folded attention step against an UNEXPANDED cache.

        query (B, K, Dq), prev_align (B, K, H, T); cache holds keys/values at
        batch level (B, ...). Broadcasting the K axis against (B, 1, H, T, d)
        keys lets XLA read the key tensor once instead of K times (the
        repeat-to-(B*K) path was the decode hot spot after CTC scoring).
        Returns (context (B, K, context_dim), align (B, K, H, T)).
        """
        B, H, T, d = cache.keys.shape        # d == dim, or d_pad if padded
        K = query.shape[1]
        pad = d - self.dim
        # precomputed lane-padded params (see AttCache.p_pad): per-step
        # pads of loop invariants are NOT hoisted out of the while body by
        # XLA; the padded w_q additionally removes the per-step pad +
        # relayout of the (B, K, H, dim) query activations. Zero columns —
        # bit-identical to padding after the matmul.
        if cache.p_pad is not None:
            w_q_p, w_f_p, bias_p, v_en_p = cache.p_pad
            q = jnp.dot(query, w_q_p,
                        preferred_element_type=jnp.float32).reshape(
                            B, K, H, d)
        else:
            w_f_p = (jnp.pad(p.w_f, ((0, 0), (0, pad)))
                     if p.w_f is not None else None)
            bias_p = (jnp.pad(p.bias.reshape(H, self.dim),
                              ((0, 0), (0, pad)))
                      if p.bias is not None else None)
            v_en_p = (jnp.pad(p.v_energy, ((0, 0), (0, pad)))
                      if p.v_energy is not None else None)
            q = jnp.dot(query, p.w_q, preferred_element_type=jnp.float32)
            q = jnp.pad(q.reshape(B, K, H, self.dim),
                        ((0, 0), (0, 0), (0, 0), (0, pad)))

        cd = cache.keys.dtype  # f32, or bf16 under decode-time amp
        if self.mode == "dot":
            energy = jnp.einsum("bkhd,bhtd->bkht", q.astype(cd), cache.keys,
                                preferred_element_type=jnp.float32)
        else:
            # location features via the Toeplitz band matmul (see _loc_band):
            # (B*K, T) @ (T, T*F) -> (B*K, T, F), then project F -> d. Two
            # clean MXU matmuls, no conv, no layout copies — and ~7x fewer
            # FLOPs than folding w_f into the conv kernel did.
            a = jnp.sum(prev_align, axis=2).reshape(B * K, T)
            fsm = jnp.dot(a, cache.loc_band,
                          preferred_element_type=jnp.float32)
            F = cache.loc_band.shape[-1] // T
            if not (self.use_pallas and H == 1 and p.w_v is not None):
                f = jnp.dot(fsm.reshape(B * K * T, F), w_f_p,
                            preferred_element_type=jnp.float32)
                f = f.reshape(B, K, T, d)
                qb = q + bias_p[None, None]
                # the (B,K,H,T,d) tanh chain runs in the cache dtype (bf16
                # under amp: halves the step's dominant HBM traffic); the
                # energy reduction and softmax accumulate in f32
                tanh_arg = (qb.astype(cd)[:, :, :, None, :]
                            + cache.keys[:, None]
                            + f.astype(cd)[:, :, None, :, :])  # (B,K,H,T,d)
                energy = jnp.einsum("bkhtd,hd->bkht", jnp.tanh(tanh_arg),
                                    v_en_p.astype(cd),
                                    preferred_element_type=jnp.float32)
                energy = energy / self.temperature
                energy = jnp.where(cache.mask[:, None, None, :], energy,
                                   -1e30)
                align = jax.nn.softmax(energy, axis=-1)
                if p.w_v is not None:
                    vals = cache.values.reshape(B, T, H, self.v_dim)
                    ctx = jnp.einsum("bkht,bthv->bkhv", align.astype(cd),
                                     vals,
                                     preferred_element_type=jnp.float32)
                else:
                    ctx = jnp.einsum("bkht,btv->bkhv", align.astype(cd),
                                     cache.values,
                                     preferred_element_type=jnp.float32)
                ctx = ctx.reshape(B, K, H * self.v_dim)
                if p.w_merge is not None:
                    ctx = jnp.dot(ctx, p.w_merge,
                                  preferred_element_type=jnp.float32)
                return ctx, align
            from ..ops.pallas.att_kernel import loc_attention_fused
            qb = q[:, :, 0] + bias_p[0][None, None]
            enc_len = jnp.sum(cache.mask.astype(jnp.int32), axis=1)
            ctx, align = loc_attention_fused(  # kernel is f32-only
                qb, cache.keys[:, 0].astype(jnp.float32),
                fsm.reshape(B, K, T, F),
                w_f_p, v_en_p[0],
                cache.values.astype(jnp.float32), enc_len,
                temperature=self.temperature)
            return ctx, align[:, :, None, :]
        energy = energy / self.temperature
        energy = jnp.where(cache.mask[:, None, None, :], energy, -1e30)
        align = jax.nn.softmax(energy, axis=-1)               # (B, K, H, T)

        if p.w_v is not None:
            vals = cache.values.reshape(B, T, H, self.v_dim)
            ctx = jnp.einsum("bkht,bthv->bkhv", align.astype(cd), vals,
                             preferred_element_type=jnp.float32)
        else:
            ctx = jnp.einsum("bkht,btv->bkhv", align.astype(cd),
                             cache.values,
                             preferred_element_type=jnp.float32)
        ctx = ctx.reshape(B, K, H * self.v_dim)
        if p.w_merge is not None:
            ctx = jnp.dot(ctx, p.w_merge, preferred_element_type=jnp.float32)
        return ctx, align
