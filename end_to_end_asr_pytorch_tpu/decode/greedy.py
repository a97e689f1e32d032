"""Greedy decoding: CTC best-path and attention self-feeding argmax.

Replaces the reference's validation-time greedy decode (SURVEY.md 2.4) with
fully-batched on-device scans — no per-utterance Python loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.asr import ASR, ASRParams
from ..utils.text import EOS_IDX


def ctc_greedy(ctc_output: jnp.ndarray) -> jnp.ndarray:
    """(B, T, V) log-probs -> (B, T) best-path ids (collapse happens in the
    tokenizer's ignore_repeat decode, as the reference does)."""
    return jnp.argmax(ctc_output, axis=-1).astype(jnp.int32)


def att_greedy(model: ASR, p: ASRParams, enc: jnp.ndarray,
               enc_len: jnp.ndarray, max_step: int,
               plugin=None, plugin_params=None,
               amp: bool = False) -> jnp.ndarray:
    """Self-fed argmax decode for ``max_step`` steps -> (B, U) ids.
    Stops contributing after the first <eos> (ids forced to eos thereafter,
    which the tokenizer's decode truncates).

    When an embedding-regularizer ``plugin`` with ``fuse > 0`` is given, the
    per-step distribution is the fused ``l*P_emb + (1-l)*P_char`` — the
    reference applies fusion wherever it decodes (SURVEY.md 2.18), including
    validation greedy decode."""
    B = enc.shape[0]
    cache, state, align = model.init_decode(p, enc, enc_len)
    sos = jnp.full((B,), EOS_IDX, jnp.int32)
    fuse = plugin is not None and plugin.apply_fuse
    # first-layer lookup fast path (same table as the training scan and the
    # beam loop): no embedding row-gathers inside the step. Gated on amp,
    # matching the beam decoder's policy — non-amp decode keeps the original
    # exact-f32 op sequence (the one-hot table matmul would bf16-round at
    # DEFAULT precision on TPU and can flip argmax near ties).
    tables = model.precompute_decode_tables(p) if amp else None

    def step(carry, _):
        state, align, prev_tok, done = carry
        logits, state, align, _ = model.decode_step(
            p, cache, state, align, prev_tok, tables=tables)
        if fuse:
            logits = plugin.fused_log_prob(plugin_params, state.h[-1], logits)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pred = jnp.where(done, EOS_IDX, pred)
        done = jnp.logical_or(done, pred == EOS_IDX)
        return (state, align, pred, done), pred

    # exact early exit: once every row is done, each remaining step writes
    # EOS_IDX — which the output buffer is pre-filled with, so stopping the
    # loop is output-identical to scanning all max_step steps (the beam
    # decoder's early_stop needs a score bound; here it is this trivial).
    done0 = jnp.zeros((B,), bool)
    ids_buf = jnp.full((max_step, B), EOS_IDX, jnp.int32)

    def cond(s):
        t, carry, _ = s
        return jnp.logical_and(t < max_step, ~jnp.all(carry[3]))

    def body(s):
        t, carry, buf = s
        carry, pred = step(carry, None)
        buf = jax.lax.dynamic_update_slice(buf, pred[None], (t, 0))
        return (t + 1, carry, buf)

    _, _, ids = jax.lax.while_loop(
        cond, body, (jnp.int32(0), (state, align, sos, done0), ids_buf))
    return jnp.swapaxes(ids, 0, 1)
