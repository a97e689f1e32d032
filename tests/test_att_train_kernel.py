"""Fused train-attention kernel (hand VJP) vs the jnp reference, interpret
mode. Forward ctx/align and ALL input gradients must match autodiff of the
plain composition."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops.pallas.att_train_kernel import (
    loc_att_train)

B, T, D, VD = 8, 12, 16, 16
TAU = 0.5


def ref(q, keys, f, v, vals, enc_len):
    targ = q[:, None, :] + keys + f
    energy = jnp.einsum("btd,d->bt", jnp.tanh(targ), v) / TAU
    mask = jnp.arange(T)[None, :] < enc_len[:, None]
    energy = jnp.where(mask, energy, -1e30)
    align = jax.nn.softmax(energy, axis=-1)
    ctx = jnp.einsum("bt,btv->bv", align, vals)
    return ctx, align


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, D), jnp.float32)
    keys = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    f = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(D), jnp.float32)
    vals = jnp.asarray(rng.randn(B, T, VD), jnp.float32)
    enc_len = jnp.asarray(rng.randint(3, T + 1, (B,)), jnp.int32)
    return q, keys, f, v, vals, enc_len


def test_forward_matches_reference():
    q, keys, f, v, vals, enc_len = _inputs()
    ctx_k, align_k = loc_att_train(q, keys, f, v, vals, enc_len, TAU, True)
    ctx_r, align_r = ref(q, keys, f, v, vals, enc_len)
    np.testing.assert_allclose(np.asarray(ctx_k), np.asarray(ctx_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(align_k), np.asarray(align_r),
                               rtol=2e-5, atol=2e-6)


def test_gradients_match_reference():
    q, keys, f, v, vals, enc_len = _inputs(1)
    rng = np.random.RandomState(2)
    # cotangents for BOTH outputs (align feeds the next step's conv)
    dctx = jnp.asarray(rng.randn(B, VD), jnp.float32)
    dalign = jnp.asarray(rng.randn(B, T), jnp.float32)

    def loss_k(q, keys, f, v, vals):
        ctx, align = loc_att_train(q, keys, f, v, vals, enc_len, TAU, True)
        return jnp.sum(ctx * dctx) + jnp.sum(align * dalign)

    def loss_r(q, keys, f, v, vals):
        ctx, align = ref(q, keys, f, v, vals, enc_len)
        return jnp.sum(ctx * dctx) + jnp.sum(align * dalign)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(q, keys, f, v, vals)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(q, keys, f, v, vals)
    names = ["dq", "dkeys", "df", "dv", "dvals"]
    for n, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5, err_msg=n)


def test_masked_frames_get_no_gradient():
    q, keys, f, v, vals, enc_len = _inputs(3)
    enc_len = jnp.full((B,), T // 2, jnp.int32)

    def loss(keys, vals):
        ctx, align = loc_att_train(q, keys, f, v, vals, enc_len, TAU, True)
        return jnp.sum(ctx ** 2) + jnp.sum(align[:, :T // 2] ** 2)

    dkeys, dvals = jax.grad(loss, argnums=(0, 1))(keys, vals)
    assert np.all(np.asarray(dkeys)[:, T // 2:] == 0.0)
    assert np.all(np.asarray(dvals)[:, T // 2:] == 0.0)


def test_odd_batch_falls_back_to_single_row_blocks():
    """B not divisible by 8 takes the BB=1 grid; same numerics."""
    rng = np.random.RandomState(5)
    Bo = 3
    q = jnp.asarray(rng.randn(Bo, D), jnp.float32)
    keys = jnp.asarray(rng.randn(Bo, T, D), jnp.float32)
    f = jnp.asarray(rng.randn(Bo, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(D), jnp.float32)
    vals = jnp.asarray(rng.randn(Bo, T, VD), jnp.float32)
    enc_len = jnp.asarray(rng.randint(3, T + 1, (Bo,)), jnp.int32)

    def loss_k(q, keys, f, v, vals):
        ctx, align = loc_att_train(q, keys, f, v, vals, enc_len, TAU, True)
        return jnp.sum(ctx ** 2) + jnp.sum(align ** 2)

    def loss_r(q, keys, f, v, vals):
        ctx, align = ref_bt(q, keys, f, v, vals, enc_len, Bo)
        return jnp.sum(ctx ** 2) + jnp.sum(align ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 3))(q, keys, f, v, vals)
    gr = jax.grad(loss_r, argnums=(0, 1, 3))(q, keys, f, v, vals)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


def ref_bt(q, keys, f, v, vals, enc_len, Bx):
    targ = q[:, None, :] + keys + f
    energy = jnp.einsum("btd,d->bt", jnp.tanh(targ), v) / TAU
    mask = jnp.arange(T)[None, :] < enc_len[:, None]
    energy = jnp.where(mask, energy, -1e30)
    align = jax.nn.softmax(energy, axis=-1)
    ctx = jnp.einsum("bt,btv->bv", align, vals)
    return ctx, align


def test_gradients_under_jit_with_traced_enc_len():
    """Regression: enc_len arrives as a TRACER inside the jitted train step
    (it rode nondiff_argnums once, which jax.grad-under-jit rejects)."""
    q, keys, f, v, vals, enc_len = _inputs(3)

    @jax.jit
    def loss_k(q, keys, f, v, vals, enc_len):
        ctx, align = loc_att_train(q, keys, f, v, vals, enc_len, TAU, True)
        return jnp.sum(ctx ** 2) + jnp.sum(align ** 2)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 4)))(q, keys, f, v, vals,
                                                   enc_len)
    def loss_r(q, keys, f, v, vals):
        ctx, align = ref(q, keys, f, v, vals, enc_len)
        return jnp.sum(ctx ** 2) + jnp.sum(align ** 2)
    gr = jax.grad(loss_r, argnums=(0, 4))(q, keys, f, v, vals)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
