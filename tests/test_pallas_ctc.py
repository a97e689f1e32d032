"""Pallas CTC forward-backward kernel vs the jnp scan reference (interpret
mode on CPU; compiled parity is exercised on real TPU by the solvers)."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops.ctc import ctc_loss
from end_to_end_asr_pytorch_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas


def _case(seed=0, B=3, T=12, V=6, U=5):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, V).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    logit_lens = jnp.array([T, T - 3, T - 5][:B], jnp.int32)
    labels = rng.randint(1, V, size=(B, U)).astype(np.int32)
    label_lens = np.array([U, U - 2, U - 3][:B], np.int32)
    for b in range(B):
        labels[b, label_lens[b]:] = 0
    return lp, logit_lens, jnp.asarray(labels), jnp.asarray(label_lens)


def test_pallas_ctc_matches_scan():
    lp, ll, lab, lal = _case(seed=2)
    ref = np.asarray(ctc_loss(lp, ll, lab, lal))
    got = np.asarray(ctc_loss_pallas(lp, ll, lab, lal, 0, True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_ctc_grad_matches_scan():
    lp, ll, lab, lal = _case(seed=3)
    gref = jax.grad(lambda x: jnp.sum(ctc_loss(x, ll, lab, lal)))(lp)
    ggot = jax.grad(
        lambda x: jnp.sum(ctc_loss_pallas(x, ll, lab, lal, 0, True)))(lp)
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_ctc_repeated_labels_and_batch_pad():
    # B=3 forces batch-tile padding (BT=8 > 3); repeats exercise skip mask
    lp = jax.nn.log_softmax(
        jnp.asarray(np.random.RandomState(4).randn(3, 10, 5), jnp.float32), -1)
    labels = jnp.asarray([[1, 1, 2, 2], [3, 3, 3, 0], [4, 0, 0, 0]], jnp.int32)
    label_lens = jnp.asarray([4, 3, 1], jnp.int32)
    logit_lens = jnp.asarray([10, 9, 6], jnp.int32)
    ref = np.asarray(ctc_loss(lp, logit_lens, labels, label_lens))
    got = np.asarray(ctc_loss_pallas(lp, logit_lens, labels, label_lens,
                                     0, True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_infeasible_row_emits_zero_grad():
    """Regression: for rows with no feasible alignment the kernel used to
    emit dense -1 gradients (alpha+beta-logz cancels the two -1e30
    absorptions to 0 wherever exactly one side is finite). The kernel must
    emit exactly zero for such rows even when the upstream cotangent is
    nonzero, and the feasible rows must stay intact."""
    rng = np.random.RandomState(11)
    B, T, V, U = 2, 10, 6, 4
    logits = rng.randn(B, T, V).astype(np.float32)
    labels = np.array([[1, 2, 3, 4], [2, 2, 2, 2]], np.int32)
    label_lens = np.array([U, U], np.int32)
    logit_lens = np.array([T, 3], np.int32)      # row 1 infeasible

    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)

    def loss_sum(x):
        # sum with unit upstream g per row: any kernel garbage would leak
        return jnp.sum(ctc_loss_pallas(x, logit_lens, labels, label_lens,
                                       0, True))

    g_pallas = np.asarray(jax.grad(loss_sum)(lp))
    assert np.all(g_pallas[1] == 0.0), "infeasible row leaked gradient"

    def loss_sum_ref(x):
        nll = ctc_loss(x, logit_lens, labels, label_lens)
        return jnp.sum(jnp.where(nll < 1e29, nll, 0.0))

    g_ref = np.asarray(jax.grad(loss_sum_ref)(lp))
    np.testing.assert_allclose(g_pallas[0], g_ref[0], rtol=1e-4, atol=1e-5)
    # the per-sample sentinel is preserved for self-masking callers
    nll = np.asarray(ctc_loss_pallas(lp, logit_lens, labels, label_lens,
                                     0, True))
    assert nll[1] > 1e29 and nll[0] < 1e3
