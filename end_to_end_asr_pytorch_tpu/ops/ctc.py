"""CTC loss: log-space forward algorithm as a time scan.

Replaces the reference's ``torch.nn.CTCLoss`` / cuDNN CTC (SURVEY.md 2.4,
blank = 0 per the tokenizer index contract in 2.9). TPU-first design:

  * The (T, S) forward lattice is computed by a ``lax.scan`` over time with
    the whole (B, S) wavefront updated per step on the VPU — no data-dependent
    control flow, static shapes, padded frames hold the carry.
  * Gradients come from jax autodiff through the scan, which yields exactly
    the CTC backward recursion (checkpointed scan keeps memory linear in T).
  * A fused Pallas wavefront kernel is the planned fast path
    (ops/pallas/ctc_kernel.py); this module is its reference and fallback.

Shapes: log_probs (B, T, V) [model emits log-softmax already, as the
reference's ctc_layer does], labels (B, U) right-padded with 0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    all_inf = m <= NEG_INF / 2
    m_safe = jnp.where(all_inf, 0.0, m)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    # when not all_inf the max term contributes exp(0)=1, so s >= 1 and both
    # log(s) and its 1/s backward are finite; guard the all_inf lane to keep
    # NaNs out of the autodiff graph (grad of where still sees both branches).
    s = jnp.where(all_inf, 1.0, s)
    return jnp.where(all_inf, NEG_INF, m_safe + jnp.log(s))


def extend_labels(labels: jnp.ndarray, blank: int = 0) -> jnp.ndarray:
    """(B, U) -> (B, 2U+1) with blanks interleaved: [b, l1, b, l2, ..., b]."""
    B, U = labels.shape
    ext = jnp.full((B, 2 * U + 1), blank, labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_loss(log_probs: jnp.ndarray, logit_lengths: jnp.ndarray,
             labels: jnp.ndarray, label_lengths: jnp.ndarray,
             blank: int = 0) -> jnp.ndarray:
    """Per-utterance negative log-likelihood, shape (B,).

    Invalid samples (label_len == 0 or logit_len < label constraints) produce
    +inf-free large values; callers mask/skip as the reference's NaN-skip does.
    """
    B, T, V = log_probs.shape
    U = labels.shape[1]
    S = 2 * U + 1
    ext = extend_labels(labels, blank)                      # (B, S)
    ext_len = 2 * label_lengths + 1                         # (B,)

    # skip-transition allowed: s>=2, ext[s] != blank, ext[s] != ext[s-2]
    skip_ok = jnp.zeros((B, S), bool)
    skip_ok = skip_ok.at[:, 2:].set(
        (ext[:, 2:] != blank) & (ext[:, 2:] != ext[:, :-2]))

    # emission log-probs per lattice state: (B, T, S)
    emit = jnp.take_along_axis(
        log_probs, ext[:, None, :].astype(jnp.int32), axis=2)

    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, emit[:, 0, 1], NEG_INF))

    def shift1(a):
        return jnp.concatenate([jnp.full((B, 1), NEG_INF), a[:, :-1]], axis=1)

    def shift2(a):
        return jnp.concatenate([jnp.full((B, 2), NEG_INF), a[:, :-2]], axis=1)

    def step(alpha, inp):
        emit_t, t = inp
        a_stay = alpha
        a_prev = shift1(alpha)
        a_skip = jnp.where(skip_ok, shift2(alpha), NEG_INF)
        new = _logaddexp3(a_stay, a_prev, a_skip) + emit_t
        valid = (t < logit_lengths)[:, None]
        return jnp.where(valid, new, alpha), None

    emit_tm = jnp.moveaxis(emit, 1, 0)                      # (T, B, S)
    ts = jnp.arange(1, T)
    alpha, _ = jax.lax.scan(
        jax.checkpoint(step), alpha0, (emit_tm[1:], ts))

    idx_last = jnp.clip(ext_len - 1, 0, S - 1)
    idx_prev = jnp.clip(ext_len - 2, 0, S - 1)
    a_last = jnp.take_along_axis(alpha, idx_last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(alpha, idx_prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
    total = jnp.logaddexp(a_last, a_prev)
    return -total


def ctc_loss_mean(log_probs, logit_lengths, labels, label_lengths,
                  blank: int = 0) -> jnp.ndarray:
    """torch.nn.CTCLoss(reduction='mean', zero_infinity=True) semantics:
    each sample's NLL divided by its label length, then averaged over the
    batch — what the reference's training loss uses (SURVEY.md 2.4).
    Rows with no feasible alignment (NLL ~1e30 from the NEG_INF guards)
    contribute zero, and the where also zeroes their cotangent so no
    gradient garbage leaks from either CTC backend."""
    nll = ctc_loss(log_probs, logit_lengths, labels, label_lengths, blank)
    denom = jnp.maximum(label_lengths, 1).astype(nll.dtype)
    return jnp.mean(jnp.where(nll < 1e29, nll / denom, 0.0))
