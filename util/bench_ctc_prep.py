#!/usr/bin/env python
"""Microbench: the beam decoder's loop-INVARIANT CTC prep at subword vocabs.

At V=5120 the round-3 profile attributed ~56 ms/batch (30% of decode wall)
to the prep chain outside the beam scan: ctc_output's f32 log_softmax over
(B,T,V), pad_ctc_log_probs, exp -> probs, bf16 cast. This script times the
chain and its pieces on-chip to find the real cost structure before
optimizing (ref behavior: src/asr.py ctc_layer + log_softmax; the prep
split is this framework's design, SURVEY.md 2.16).

Run on the TPU host; never concurrently with pytest (1 host core).
"""
import os
import time
from functools import partial
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path.home() / ".cache" / "jax_asr"))

import numpy as np
import jax
import jax.numpy as jnp

from end_to_end_asr_pytorch_tpu.ops import ctc_prefix

B, T, H = 128, 112, 1024
ITERS = 20


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms


def current_prep(enc, w, b, enc_len):
    logits = jnp.dot(enc, w, preferred_element_type=jnp.float32) + b
    ctc_lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ctc_lp = ctc_prefix.pad_ctc_log_probs(ctc_lp, enc_len)
    blank_lp = jnp.maximum(ctc_lp[:, :, 0], ctc_prefix.CLIP)
    probs = jnp.exp(ctc_lp).astype(jnp.bfloat16)
    return ctc_lp, probs, blank_lp


def fused_prep(enc, w, b, enc_len):
    """Candidate optimization: one subtraction pass for lp, bf16 exp for
    probs (probs are only consumed by the f32-accumulating psi einsum)."""
    logits = jnp.dot(enc, w, preferred_element_type=jnp.float32) + b
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)       # (B,T,1)
    pad = (jnp.arange(T)[None, :] >= enc_len[:, None])[..., None]
    ctc_lp = jnp.where(pad, jnp.where(jnp.arange(logits.shape[-1]) == 0,
                                      0.0, ctc_prefix.NEG_INF),
                       logits - lse)
    blank_lp = jnp.maximum(ctc_lp[:, :, 0], ctc_prefix.CLIP)
    probs = jnp.exp(ctc_lp.astype(jnp.bfloat16))
    return ctc_lp, probs, blank_lp


def main():
    print(f"devices: {jax.devices()}")
    for V in (1024, 5120, 16384):
        rng = np.random.RandomState(0)
        enc = jnp.asarray(rng.randn(B, T, H), jnp.bfloat16)
        w = jnp.asarray(rng.randn(H, V) * 0.03, jnp.bfloat16)
        b = jnp.zeros((V,), jnp.float32)
        enc_len = jnp.full((B,), T - 5, jnp.int32)
        logits = jnp.dot(enc, w, preferred_element_type=jnp.float32) + b
        lp = jax.nn.log_softmax(logits, axis=-1)

        pieces = {
            "full_current": jax.jit(current_prep),
            "full_fused": jax.jit(fused_prep),
            "matmul_only": jax.jit(lambda e, ww, bb: jnp.dot(
                e, ww, preferred_element_type=jnp.float32) + bb),
            "logsoftmax_only": jax.jit(
                lambda x: jax.nn.log_softmax(x, axis=-1)),
            "exp_f32": jax.jit(jnp.exp),
            "exp_to_bf16": jax.jit(lambda x: jnp.exp(x).astype(jnp.bfloat16)),
            "exp_in_bf16": jax.jit(
                lambda x: jnp.exp(x.astype(jnp.bfloat16))),
            "pad_only": jax.jit(partial(ctc_prefix.pad_ctc_log_probs)),
        }
        res = {}
        res["full_current"] = timeit(pieces["full_current"], enc, w, b,
                                     enc_len)
        res["full_fused"] = timeit(pieces["full_fused"], enc, w, b, enc_len)
        res["matmul_only"] = timeit(pieces["matmul_only"], enc, w, b)
        res["logsoftmax_only"] = timeit(pieces["logsoftmax_only"], logits)
        res["exp_f32"] = timeit(pieces["exp_f32"], lp)
        res["exp_to_bf16"] = timeit(pieces["exp_to_bf16"], lp)
        res["exp_in_bf16"] = timeit(pieces["exp_in_bf16"], lp)
        res["pad_only"] = timeit(pieces["pad_only"], lp, enc_len)
        # numerics: psi-relevant delta between current and fused probs
        ref = current_prep(enc, w, b, enc_len)
        new = fused_prep(enc, w, b, enc_len)
        dprob = float(jnp.max(jnp.abs(ref[1].astype(jnp.float32)
                                      - new[1].astype(jnp.float32))))
        dlp = float(jnp.max(jnp.abs(jnp.clip(ref[0], -50, 0)
                                    - jnp.clip(new[0], -50, 0))))
        print(f"V={V}: " + "  ".join(f"{k}={v:.2f}ms"
                                     for k, v in res.items()))
        print(f"  max|probs_cur-probs_fused|={dprob:.2e}  "
              f"max|lp_cur-lp_fused| (clipped)={dlp:.2e}")


if __name__ == "__main__":
    main()
