"""CTC loss parity vs torch.nn.CTCLoss (values and gradients)."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops.ctc import ctc_loss, ctc_loss_mean


def _case(seed=0, B=3, T=12, V=6, U=5):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, V).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    logit_lens = np.array([T, T - 3, T - 5], np.int32)[:B]
    labels = rng.randint(1, V, size=(B, U)).astype(np.int32)
    label_lens = np.array([U, U - 2, U - 3], np.int32)[:B]
    for b in range(B):
        labels[b, label_lens[b]:] = 0
    return logits, np.asarray(log_probs), logit_lens, labels, label_lens


def _torch_nll(logits, logit_lens, labels, label_lens):
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)
    return torch.nn.functional.ctc_loss(
        lp, torch.from_numpy(labels), torch.from_numpy(logit_lens),
        torch.from_numpy(label_lens), blank=0, reduction="none",
        zero_infinity=False)


def test_ctc_loss_matches_torch():
    logits, log_probs, logit_lens, labels, label_lens = _case()
    got = np.asarray(ctc_loss(log_probs, logit_lens, labels, label_lens))
    ref = _torch_nll(logits, logit_lens, labels, label_lens).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_ctc_loss_mean_matches_torch_mean():
    logits, log_probs, logit_lens, labels, label_lens = _case(seed=1)
    got = float(ctc_loss_mean(log_probs, logit_lens, labels, label_lens))
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)
    ref = torch.nn.functional.ctc_loss(
        lp, torch.from_numpy(labels), torch.from_numpy(logit_lens),
        torch.from_numpy(label_lens), blank=0, reduction="mean").item()
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_ctc_grad_matches_torch():
    logits, _, logit_lens, labels, label_lens = _case(seed=2)

    def loss_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return jnp.sum(ctc_loss(lp, logit_lens, labels, label_lens))

    got = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    tl = torch.from_numpy(logits).requires_grad_(True)
    lp = torch.log_softmax(tl, dim=-1).transpose(0, 1)
    loss = torch.nn.functional.ctc_loss(
        lp, torch.from_numpy(labels), torch.from_numpy(logit_lens),
        torch.from_numpy(label_lens), blank=0, reduction="sum")
    loss.backward()
    np.testing.assert_allclose(got, tl.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_single_label_and_tiny():
    # degenerate shapes: U=1, T=2
    log_probs = jax.nn.log_softmax(jnp.zeros((1, 2, 3)), axis=-1)
    nll = ctc_loss(log_probs, np.array([2]), np.array([[1]]), np.array([1]))
    # paths: (b,1),(1,b),(1,1) each prob (1/3)^2 => nll = -log(3/9)
    np.testing.assert_allclose(float(nll[0]), -np.log(3 / 9.0), rtol=1e-5)


def test_ctc_jit_and_repeated_labels():
    rng = np.random.RandomState(3)
    logits = rng.randn(2, 10, 5).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = np.array([[1, 1, 2, 2], [3, 3, 3, 0]], np.int32)
    label_lens = np.array([4, 3], np.int32)
    logit_lens = np.array([10, 9], np.int32)
    f = jax.jit(ctc_loss)
    got = np.asarray(f(log_probs, logit_lens, labels, label_lens))
    ref = _torch_nll(logits, logit_lens, labels, label_lens).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_infeasible_row_zero_infinity_mean_and_grads():
    """A row whose logit_len is shorter than its label string's minimum CTC
    path must contribute ZERO to ctc_loss_mean and ZERO gradient (torch
    CTCLoss(zero_infinity=True) semantics), while per-sample ctc_loss still
    reports the ~1e30 sentinel for callers that mask themselves."""
    rng = np.random.RandomState(7)
    B, T, V, U = 3, 12, 6, 5
    logits = rng.randn(B, T, V).astype(np.float32)
    labels = rng.randint(1, V, size=(B, U)).astype(np.int32)
    labels[1] = [2, 2, 2, 2, 2]          # adjacent repeats: min path 2U-1+... > 3
    label_lens = np.array([U, U, U - 2], np.int32)
    logit_lens = np.array([T, 3, T], np.int32)   # row 1 infeasible

    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    nll = np.asarray(ctc_loss(lp, logit_lens, labels, label_lens))
    assert nll[1] > 1e29 and np.all(nll[[0, 2]] < 1e3)

    # mean matches torch zero_infinity=True on the mixed batch
    got = float(ctc_loss_mean(lp, logit_lens, labels, label_lens))
    tlp = torch.log_softmax(torch.from_numpy(logits), -1).transpose(0, 1)
    ref = torch.nn.functional.ctc_loss(
        tlp, torch.from_numpy(labels), torch.from_numpy(logit_lens),
        torch.from_numpy(label_lens), blank=0, reduction="mean",
        zero_infinity=True).item()
    np.testing.assert_allclose(got, ref, rtol=1e-4)

    # gradients of the zero_infinity mean: infeasible row exactly zero,
    # feasible rows match torch
    def loss_fn(lg):
        return ctc_loss_mean(jax.nn.log_softmax(lg, -1), logit_lens,
                             labels, label_lens)
    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))
    assert np.all(g[1] == 0.0), "infeasible row leaked gradient"
    tl = torch.from_numpy(logits).requires_grad_(True)
    torch.nn.functional.ctc_loss(
        torch.log_softmax(tl, -1).transpose(0, 1), torch.from_numpy(labels),
        torch.from_numpy(logit_lens), torch.from_numpy(label_lens), blank=0,
        reduction="mean", zero_infinity=True).backward()
    np.testing.assert_allclose(g[[0, 2]], tl.grad.numpy()[[0, 2]],
                               rtol=1e-3, atol=1e-5)
