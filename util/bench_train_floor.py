#!/usr/bin/env python
"""Train-step roofline: is 29.5-30.2% MFU structural at LAS shapes?

VERDICT r4 weak #2: the "structural" claim lives in scattered comments;
this script produces the floor numbers for BASELINE.md's train-floor
subsection. For the flagship train step (B=128, U=96, bf16 + f32):

  1. XLA compiled cost_analysis flops + "bytes accessed" for the FULL
     train step (fwd + remat recompute + bwd + Adadelta update). Note
     the flops number is PROGRAM flops (includes the label-scan remat
     recompute), so mfu here is hardware FLOP utilization, an upper
     bound on model-flop MFU.
  2. Measured ms/step (value-fetch sync, 10 iters — see bench_details.py
     for the donated-buffer block_until_ready gotcha).
  3. Floors: flop_floor = flops/PEAK_BF16, byte_floor = bytes/PEAK_BW.
     structural_floor = max of the two; gap = measured / floor.
  4. The serial-dependency ledger: the step contains
     label scan U=96 (fwd) + 96 (bwd, save-nothing remat recompute+grad)
     + pBLSTM time scans at T=176/88/44 fwd + bwd — every step a data
     dependence XLA cannot parallelize. measured_ms / serial_steps gives
     the achieved per-scan-step latency to compare against the ~90
     small-fused-op dispatch profile (NOTES round-2 train log).

Run on the TPU host, chip idle. Writes bench_train_floor.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

PEAK_BW = 819e9     # v5e HBM, bytes/sec
PEAK_BF16 = 197e12  # v5e MXU, FLOP/s


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "jax_asr"))
    import jax.numpy as jnp
    import optax
    from bench import AUDIO_CFG, MODEL_CFG, VOCAB, make_waves
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    from end_to_end_asr_pytorch_tpu.ops.audio import create_transform
    from end_to_end_asr_pytorch_tpu.ops.pallas.ctc_kernel import (
        ctc_loss_pallas)
    from end_to_end_asr_pytorch_tpu.optim import Optimizer
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import masked_ce

    B, U = 128, 96
    frontend, feat_dim = create_transform(AUDIO_CFG)
    model = ASR(feat_dim, VOCAB, MODEL_CFG)
    params = model.init(jax.random.PRNGKey(0))
    opt = Optimizer({"optimizer": "Adadelta", "lr": 1.0}, grad_clip=5.0)
    opt_state = opt.init(params)
    waves, lens = make_waves(B)
    w, wl = jnp.asarray(waves), jnp.asarray(lens)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(2, VOCAB, (B, U)), jnp.int32)
    text_len = jnp.full((B,), U, jnp.int32)

    def _cast_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, tree)

    def make_step(amp):
        def train_step(ps, os_, wv, wl_, tx, tl, key):
            def loss_fn(pp):
                feat, feat_len = frontend(wv, wl_)
                mp = _cast_bf16(pp) if amp else pp
                if amp:
                    feat = feat.astype(jnp.bfloat16)
                ctc_out, enc_len, att_out, _, _ = model.forward(
                    mp, feat, feat_len, tx.shape[1], 0.9, teacher=tx,
                    train=True, rng=key)
                ctc_out = ctc_out.astype(jnp.float32)
                att_out = att_out.astype(jnp.float32)
                nll = ctc_loss_pallas(ctc_out, enc_len, tx, tl)
                return (0.5 * jnp.mean(nll / jnp.maximum(tl, 1))
                        + 0.5 * masked_ce(att_out, tx))
            loss, grads = jax.value_and_grad(loss_fn)(ps)
            updates, os_ = opt.tx.update(grads, os_, ps)
            return optax.apply_updates(ps, updates), os_, loss
        return jax.jit(train_step, donate_argnums=(0, 1))

    # serial-dependency ledger (see module docstring): T_enc=176 after the
    # VGG 4x subsample; pBLSTM halves T per layer above the first.
    t_enc = 176
    serial_steps = (U * 2                      # label scan fwd + remat bwd
                    + (t_enc + t_enc // 2 + t_enc // 4) * 2)  # time scans

    rows = []
    for amp in (True, False):
        step_fn = make_step(amp)
        compiled = step_fn.lower(params, opt_state, w, wl, text, text_len,
                                 jax.random.PRNGKey(2)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))

        ps = jax.tree_util.tree_map(jnp.copy, params)
        os_ = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, opt_state)
        keys = [jax.random.PRNGKey(3 + i) for i in range(11)]
        ps, os_, loss = step_fn(ps, os_, w, wl, text, text_len, keys[10])
        _ = float(loss)
        t0 = time.perf_counter()
        for i in range(10):
            ps, os_, loss = step_fn(ps, os_, w, wl, text, text_len, keys[i])
        _ = float(loss)
        dt = (time.perf_counter() - t0) / 10

        flop_floor = flops / PEAK_BF16
        byte_floor = bytes_acc / PEAK_BW
        floor = max(flop_floor, byte_floor)
        rows.append({
            "mode": "bf16" if amp else "f32",
            "batch": B, "labels": U,
            "ms_per_step": round(dt * 1e3, 1),
            "utts_per_sec": round(B / dt, 1),
            "program_flops": flops,
            "bytes_accessed": bytes_acc,
            "achieved_tflops": round(flops / dt / 1e12, 2),
            "hw_flop_util_vs_197T": round(flops / dt / PEAK_BF16, 4),
            "achieved_hbm_gbps": round(bytes_acc / dt / 1e9, 1),
            "flop_floor_ms": round(flop_floor * 1e3, 1),
            "byte_floor_ms": round(byte_floor * 1e3, 1),
            "structural_floor_ms": round(floor * 1e3, 1),
            "measured_over_floor": round(dt / floor, 2),
            "serial_scan_steps": serial_steps,
            "us_per_serial_step": round(dt / serial_steps * 1e6, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    out_file = Path(__file__).parent.parent / "bench_train_floor.json"
    out_file.write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
