"""Fused LSTM time-scan kernel vs the jnp scan reference (values + grads,
forward and reverse directions, with length masks)."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops.rnn import LSTMWeights, init_lstm, lstm_scan
from end_to_end_asr_pytorch_tpu.ops.pallas.lstm_kernel import lstm_scan_fused

T, B, D, H = 10, 4, 6, 8
LENS = [10, 7, 4, 10]


def _setup(seed=0):
    w = init_lstm(jax.random.PRNGKey(seed), D, H)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(T, B, D), jnp.float32)
    mask = jnp.asarray(np.arange(T)[:, None] < np.asarray(LENS)[None, :])
    x_proj = jnp.dot(x, w.w_ih) + w.b
    return w, x, x_proj, mask


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_forward_matches_scan(reverse):
    w, x, x_proj, mask = _setup()
    ref = lstm_scan(w, x, mask, reverse=reverse)
    got = lstm_scan_fused(x_proj, w.w_hh, mask, reverse, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_gradients_match_scan(reverse):
    w, x, x_proj, mask = _setup(seed=1)
    rng = np.random.RandomState(2)
    # weighted sum so every output position contributes a distinct cotangent
    cot = jnp.asarray(rng.randn(T, B, H), jnp.float32)

    def loss_ref(xp, whh):
        # reproduce lstm_scan but from x_proj to isolate identical inputs
        w2 = LSTMWeights(w.w_ih, whh, w.b)
        ys = lstm_scan(w2, x, mask, reverse=reverse)
        return jnp.sum(ys * cot)

    def loss_fused(xp, whh):
        ys = lstm_scan_fused(xp, whh, mask, reverse, True)
        return jnp.sum(ys * cot)

    # reference grads w.r.t. x_proj require chain through x: compare dw_hh
    # directly, and dx_proj via the fused path against autodiff of a scan
    # built on x_proj:
    from end_to_end_asr_pytorch_tpu.ops import rnn as rnn_ops

    def scan_from_xproj(xp, whh):
        def step(carry, inp):
            h, c = carry
            xpt, mt = inp
            gates = xpt + jnp.dot(h, whh)
            i, f, g, o = (gates[..., :H], gates[..., H:2*H],
                          gates[..., 2*H:3*H], gates[..., 3*H:])
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            mt = mt[:, None]
            h = jnp.where(mt, h_new, h)
            c = jnp.where(mt, c_new, c)
            return (h, c), jnp.where(mt, h_new, 0.0)
        h0 = jnp.zeros((B, H))
        _, ys = jax.lax.scan(step, (h0, h0), (xp, mask),
                             reverse=reverse)
        return jnp.sum(ys * cot)

    g_ref = jax.grad(scan_from_xproj, argnums=(0, 1))(x_proj, w.w_hh)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(x_proj, w.w_hh)
    np.testing.assert_allclose(np.asarray(g_fused[0]), np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fused[1]), np.asarray(g_ref[1]),
                               rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------- GRU twin
from end_to_end_asr_pytorch_tpu.ops.rnn import GRUWeights, init_gru, gru_scan
from end_to_end_asr_pytorch_tpu.ops.pallas.gru_kernel import gru_scan_fused


def _gru_setup(seed=0):
    w = init_gru(jax.random.PRNGKey(seed), D, H)
    # non-zero b_hh to exercise the separate-bias semantics
    w = GRUWeights(w.w_ih, w.w_hh,
                   w.b_ih + 0.1, w.b_hh + 0.05)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(T, B, D), jnp.float32)
    mask = jnp.asarray(np.arange(T)[:, None] < np.asarray(LENS)[None, :])
    x_proj = jnp.dot(x, w.w_ih) + w.b_ih
    return w, x, x_proj, mask


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_fused_forward_matches_scan(reverse):
    w, x, x_proj, mask = _gru_setup()
    ref = gru_scan(w, x, mask, reverse=reverse)
    got = gru_scan_fused(x_proj, w.w_hh, w.b_hh, mask, reverse, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_fused_grads_match_scan(reverse):
    w, x, x_proj, mask = _gru_setup(seed=3)
    rng = np.random.RandomState(4)
    cot = jnp.asarray(rng.randn(T, B, H), jnp.float32)

    def ref_loss(xp, whh, bhh):
        from end_to_end_asr_pytorch_tpu.ops.rnn import gru_cell

        def step(h, inp):
            xpt, mt = inp
            hp = jnp.dot(h, whh) + bhh
            r = jax.nn.sigmoid(xpt[..., :H] + hp[..., :H])
            z = jax.nn.sigmoid(xpt[..., H:2*H] + hp[..., H:2*H])
            n = jnp.tanh(xpt[..., 2*H:] + r * hp[..., 2*H:])
            h_new = (1.0 - z) * n + z * h
            mt = mt[:, None]
            h = jnp.where(mt, h_new, h)
            return h, jnp.where(mt, h_new, 0.0)
        h0 = jnp.zeros((B, H))
        _, ys = jax.lax.scan(step, h0, (xp, mask), reverse=reverse)
        return jnp.sum(ys * cot)

    def fused_loss(xp, whh, bhh):
        ys = gru_scan_fused(xp, whh, bhh, mask, reverse, True)
        return jnp.sum(ys * cot)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(x_proj, w.w_hh, w.b_hh)
    g_fus = jax.grad(fused_loss, argnums=(0, 1, 2))(x_proj, w.w_hh, w.b_hh)
    for a, b in zip(g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kind", ["lstm", "gru"])
def test_fused_bf16_io(kind):
    """bf16 x_proj/ys I/O (the amp streaming mode): values track the f32
    fused path to bf16 rounding, grads keep the primal dtype contract."""
    if kind == "lstm":
        w, x, x_proj, mask = _setup(seed=7)
        run = lambda xp, dt: lstm_scan_fused(
            xp.astype(dt), w.w_hh, mask, False, True)
    else:
        w, x, x_proj, mask = _gru_setup(seed=7)
        run = lambda xp, dt: gru_scan_fused(
            xp.astype(dt), w.w_hh, w.b_hh, mask, False, True)

    ref = run(x_proj, jnp.float32)
    got = run(x_proj, jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0, atol=0.05)
    # grad wrt a bf16 primal must come back bf16 (custom_vjp dtype contract)
    g = jax.grad(lambda xp: jnp.sum(run(xp, jnp.bfloat16).astype(
        jnp.float32)))(x_proj.astype(jnp.bfloat16))
    assert g.dtype == jnp.bfloat16
    g_ref = jax.grad(lambda xp: jnp.sum(run(xp, jnp.float32)))(x_proj)
    np.testing.assert_allclose(np.asarray(g, np.float32), np.asarray(g_ref),
                               rtol=0, atol=0.1)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_unrolled_path(reverse):
    """T divisible by UNROLL exercises the multi-step-per-block kernels."""
    T2 = 12
    w = init_lstm(jax.random.PRNGKey(5), D, H)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(T2, B, D), jnp.float32)
    lens = [12, 9, 5, 12]
    mask = jnp.asarray(np.arange(T2)[:, None] < np.asarray(lens)[None, :])
    x_proj = jnp.dot(x, w.w_ih) + w.b
    ref = lstm_scan(w, x, mask, reverse=reverse)
    got = lstm_scan_fused(x_proj, w.w_hh, mask, reverse, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    cot = jnp.asarray(rng.randn(T2, B, H), jnp.float32)

    def scan_loss(xp, whh):
        def step(carry, inp):
            h, c = carry
            xpt, mt = inp
            gates = xpt + jnp.dot(h, whh)
            i, f, g_, o = (gates[..., :H], gates[..., H:2*H],
                           gates[..., 2*H:3*H], gates[..., 3*H:])
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g_)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            mt = mt[:, None]
            return ((jnp.where(mt, h_new, h), jnp.where(mt, c_new, c)),
                    jnp.where(mt, h_new, 0.0))
        h0 = jnp.zeros((B, H))
        _, ys = jax.lax.scan(step, (h0, h0), (xp, mask), reverse=reverse)
        return jnp.sum(ys * cot)

    g_ref = jax.grad(scan_loss, argnums=(0, 1))(x_proj, w.w_hh)
    g_fus = jax.grad(lambda xp, whh: jnp.sum(
        lstm_scan_fused(xp, whh, mask, reverse, True) * cot),
        argnums=(0, 1))(x_proj, w.w_hh)
    for a, b in zip(g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_fused_unrolled_path(reverse):
    """GRU twin of test_fused_unrolled_path: T divisible by UNROLL
    exercises the multi-step-per-block kernels (values + grads)."""
    T2 = 12
    w = init_gru(jax.random.PRNGKey(8), D, H)
    w = GRUWeights(w.w_ih, w.w_hh, w.b_ih + 0.1, w.b_hh + 0.05)
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(T2, B, D), jnp.float32)
    lens = [12, 9, 5, 12]
    mask = jnp.asarray(np.arange(T2)[:, None] < np.asarray(lens)[None, :])
    x_proj = jnp.dot(x, w.w_ih) + w.b_ih
    ref = gru_scan(w, x, mask, reverse=reverse)
    got = gru_scan_fused(x_proj, w.w_hh, w.b_hh, mask, reverse, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    cot = jnp.asarray(rng.randn(T2, B, H), jnp.float32)

    def ref_loss(xp, whh, bhh):
        def step(h, inp):
            xpt, mt = inp
            hp = jnp.dot(h, whh) + bhh
            r = jax.nn.sigmoid(xpt[..., :H] + hp[..., :H])
            z = jax.nn.sigmoid(xpt[..., H:2*H] + hp[..., H:2*H])
            n = jnp.tanh(xpt[..., 2*H:] + r * hp[..., 2*H:])
            h_new = (1.0 - z) * n + z * h
            mt = mt[:, None]
            return jnp.where(mt, h_new, h), jnp.where(mt, h_new, 0.0)
        h0 = jnp.zeros((B, H))
        _, ys = jax.lax.scan(step, h0, (xp, mask), reverse=reverse)
        return jnp.sum(ys * cot)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(x_proj, w.w_hh, w.b_hh)
    g_fus = jax.grad(lambda xp, whh, bhh: jnp.sum(
        gru_scan_fused(xp, whh, bhh, mask, reverse, True) * cot),
        argnums=(0, 1, 2))(x_proj, w.w_hh, w.b_hh)
    for a, b in zip(g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
