#!/usr/bin/env python
"""Capture a jax.profiler trace of the train step or beam decode on the
real chip, then print the hotspot aggregation (util/profile_hotspots.py).

Usage (never concurrently with pytest — 1 host core):
  python util/profile_run.py train [--batch 128] [--steps 3] [--amp]
  python util/profile_run.py decode [--batch 128] [--steps 3]

Writes the trace under /tmp/jaxprof-<mode> and prints top hotspots by
source line.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=("train", "decode"))
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--amp", action="store_true")
    ap.add_argument("--labels", type=int, default=96)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from bench import AUDIO_CFG, DECODE_CFG, LM_CFG, MODEL_CFG, VOCAB, \
        make_waves
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    from end_to_end_asr_pytorch_tpu.models.lm import RNNLM
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    from end_to_end_asr_pytorch_tpu.ops.audio import create_transform
    from end_to_end_asr_pytorch_tpu.utils import profiler

    frontend, feat_dim = create_transform(AUDIO_CFG)
    model = ASR(feat_dim, VOCAB, MODEL_CFG)
    params = model.init(jax.random.PRNGKey(0))
    B = args.batch
    waves, lens = make_waves(B)
    w, wl = jnp.asarray(waves), jnp.asarray(lens)

    if args.mode == "decode":
        lm = RNNLM(VOCAB, LM_CFG)
        lm_params = lm.init(jax.random.PRNGKey(1))
        decoder = BeamDecoder(model, DECODE_CFG, lm=lm)
        fn = jax.jit(lambda p, lp, a, al: decoder.forward(
            p, *frontend(a, al), lm_params=lp))
        fargs = (params, lm_params, w, wl)
    else:
        from end_to_end_asr_pytorch_tpu.ops.ctc import ctc_loss
        from end_to_end_asr_pytorch_tpu.ops.pallas.ctc_kernel import \
            ctc_loss_pallas
        from end_to_end_asr_pytorch_tpu.solvers.train_asr import masked_ce
        U = args.labels
        rng = np.random.RandomState(0)
        text = jnp.asarray(rng.randint(2, VOCAB, (B, U)), jnp.int32)
        text_len = jnp.full((B,), U, jnp.int32)
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)
        amp = args.amp
        ctc_fn = ctc_loss_pallas if jax.default_backend() != "cpu" \
            else ctc_loss

        def train_step(p, os, a, al, txt, tl, rng):
            def loss_fn(pp):
                feat, feat_len = frontend(a, al)
                if amp:
                    pp = jax.tree_util.tree_map(
                        lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, pp)
                    feat = feat.astype(jnp.bfloat16)
                ctc_out, enc_len, att_out, _, _ = model.forward(
                    pp, feat, feat_len, U, 1.0, teacher=txt, train=True,
                    rng=rng)
                ctc_out = ctc_out.astype(jnp.float32)
                att_out = att_out.astype(jnp.float32)
                nll = ctc_fn(ctc_out, enc_len, txt, tl)
                ctc_l = jnp.mean(nll / jnp.maximum(tl, 1))
                att_l = masked_ce(att_out, txt)
                return 0.5 * ctc_l + 0.5 * att_l
            loss, grads = jax.value_and_grad(loss_fn)(p)
            upd, os = tx.update(grads, os, p)
            return optax.apply_updates(p, upd), os, loss

        fn0 = jax.jit(train_step, donate_argnums=(0, 1))
        key = jax.random.PRNGKey(2)

        # warmup/compile
        params2, opt_state2, loss = fn0(params, opt_state, w, wl, text,
                                        text_len, key)
        jax.block_until_ready(loss)
        logdir = "/tmp/jaxprof-train"
        import shutil
        shutil.rmtree(logdir, ignore_errors=True)
        import time
        t0 = time.perf_counter()
        with profiler.trace(logdir):
            for _ in range(args.steps):
                params2, opt_state2, loss = fn0(params2, opt_state2, w, wl,
                                                text, text_len, key)
            jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"train step: {dt*1e3:.1f} ms  -> {B/dt:.1f} utts/sec  "
              f"(amp={amp})")
        _agg(logdir)
        return

    # decode path
    out = fn(*fargs)
    jax.block_until_ready(out)
    logdir = "/tmp/jaxprof-decode"
    import shutil
    import time
    shutil.rmtree(logdir, ignore_errors=True)
    t0 = time.perf_counter()
    with profiler.trace(logdir):
        for _ in range(args.steps):
            out = fn(*fargs)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"decode: {dt*1e3:.1f} ms -> {B/dt:.1f} utts/sec")
    _agg(logdir)


def _agg(logdir):
    import subprocess
    subprocess.run([sys.executable,
                    str(Path(__file__).parent / "profile_hotspots.py"),
                    logdir, "--top", "40"], check=False)


if __name__ == "__main__":
    main()
