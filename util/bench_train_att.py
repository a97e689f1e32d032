#!/usr/bin/env python
"""A/B the fused train-attention kernel (ops/pallas/att_train_kernel.py):
ms/step bf16 at the flagship B=128/U=96 train shape, kernel on vs off.

Usage: python util/bench_train_att.py [on|off|both]
Measured-result discipline (NOTES.md): the kernel ships default-off; wire
it (attention.use_pallas_train) only if this A/B wins on-chip. Do not run
concurrently with other TPU work (single host core)."""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path.home() / ".cache" / "jax_asr"))
import numpy as np
from bench import AUDIO_CFG, MODEL_CFG, VOCAB, make_waves

B, U = 128, 96
AMP = True


def run(use_kernel: bool, remat: bool = True):
    import jax, jax.numpy as jnp
    import optax
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    from end_to_end_asr_pytorch_tpu.ops.audio import create_transform
    from end_to_end_asr_pytorch_tpu.ops.pallas.ctc_kernel import (
        ctc_loss_pallas)
    from end_to_end_asr_pytorch_tpu.optim import Optimizer
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import masked_ce

    cfg = dict(MODEL_CFG)
    cfg["attention"] = dict(cfg["attention"], use_pallas_train=use_kernel)
    cfg["label_scan_remat"] = remat
    frontend, feat_dim = create_transform(AUDIO_CFG)
    model = ASR(feat_dim, VOCAB, cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = Optimizer({"optimizer": "Adadelta", "lr": 1.0}, grad_clip=5.0)
    opt_state = opt.init(params)

    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t)

    def train_step(ps, os_, wv, wl_, tx, tl, rng):
        def loss_fn(pp):
            feat, feat_len = frontend(wv, wl_)
            mp = cast(pp) if AMP else pp
            if AMP:
                feat = feat.astype(jnp.bfloat16)
            ctc_out, enc_len, att_out, _, _ = model.forward(
                mp, feat, feat_len, tx.shape[1], 0.9, teacher=tx,
                train=True, rng=rng)
            ctc_out = ctc_out.astype(jnp.float32)
            att_out = att_out.astype(jnp.float32)
            nll = ctc_loss_pallas(ctc_out, enc_len, tx, tl)
            return (0.5 * jnp.mean(nll / jnp.maximum(tl, 1))
                    + 0.5 * masked_ce(att_out, tx))
        loss, grads = jax.value_and_grad(loss_fn)(ps)
        ups, os_ = opt.tx.update(grads, os_, ps)
        return optax.apply_updates(ps, ups), os_, loss

    fn = jax.jit(train_step, donate_argnums=(0, 1))
    waves, lens = make_waves(B)
    w, wl = jnp.asarray(waves), jnp.asarray(lens)
    rngnp = np.random.RandomState(0)
    tx = jnp.asarray(rngnp.randint(2, VOCAB, (B, U)), jnp.int32)
    tl = jnp.full((B,), U, jnp.int32)
    ps = jax.tree_util.tree_map(jnp.copy, params)
    os_ = jax.tree_util.tree_map(
        lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, opt_state)
    t0 = time.perf_counter()
    ps, os_, loss = fn(ps, os_, w, wl, tx, tl, jax.random.PRNGKey(2))
    import jax as _j; _j.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        ps, os_, loss = fn(ps, os_, w, wl, tx, tl, jax.random.PRNGKey(3 + i))
    _j.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"use_kernel={use_kernel} remat={remat}: {dt*1e3:.1f} ms/step "
          f"({B/dt:.0f} utts/s) loss={float(loss):.4f} "
          f"compile={compile_s:.0f}s", flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("off", "both"):
        run(False)
    if which in ("on", "both"):
        run(True)
    if which == "on_noremat":
        run(True, remat=False)
    if which == "off_noremat":
        run(False, remat=False)
