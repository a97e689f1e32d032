#!/usr/bin/env python
"""Extended benchmark: model-FLOPs / MFU accounting + mixed-bucket decode.

bench.py prints the driver's single headline JSON line; this script adds the
analyses BASELINE.md reports (round-1 verdict item 9):

  1. FLOPs from XLA's compiled cost analysis for the decode program ->
     achieved model-TFLOP/s and %% of the v5e chip's 197 TFLOP/s bf16 peak
     (beam decode is latency/bandwidth-bound, so MFU is expectedly low —
     the number documents HOW far from compute-bound this workload is).
  2. Mixed-bucket steady state: utterances of 2/4/7/15 s decoded as their
     bucketed static shapes — counts XLA compilations (one per bucket) and
     measures amortized throughput + real-time factor over the mixture.

Writes bench_details.json and prints a human-readable summary.
Run on the TPU host, never concurrently with pytest (1 host core).
"""
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from bench import (AUDIO_CFG, DECODE_CFG, LM_CFG, MODEL_CFG, VOCAB,
                   make_waves)

V5E_PEAK_BF16 = 197e12  # TFLOP/s, one v5e chip


def main():
    import jax
    # one shared persistent cache across every entry point (main.py,
    # bench_vocab.py, transcribe.py all use ~/.cache/jax_asr)
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "jax_asr"))
    import jax.numpy as jnp
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    from end_to_end_asr_pytorch_tpu.models.lm import RNNLM
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    from end_to_end_asr_pytorch_tpu.ops.audio import create_transform

    frontend, feat_dim = create_transform(AUDIO_CFG)
    model = ASR(feat_dim, VOCAB, MODEL_CFG)
    params = model.init(jax.random.PRNGKey(0))
    lm = RNNLM(VOCAB, LM_CFG)
    lm_params = lm.init(jax.random.PRNGKey(1))
    decoder = BeamDecoder(model, DECODE_CFG, lm=lm)

    fwd = jax.jit(lambda p, lp, w, wl: decoder.forward(
        p, *frontend(w, wl), lm_params=lp))

    out = {}

    # ------------------------------------------------ 1. FLOPs / MFU
    B = 128
    waves, lens = make_waves(B)
    w, wl = jnp.asarray(waves), jnp.asarray(lens)
    compiled = fwd.lower(params, lm_params, w, wl).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops_per_batch = float(ca.get("flops", 0.0))
    bytes_per_batch = float(ca.get("bytes accessed", 0.0))

    r = fwd(params, lm_params, w, wl)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        r = fwd(params, lm_params, w, wl)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters

    tflops = flops_per_batch / dt / 1e12
    out["decode_batch128"] = {
        "utts_per_sec": round(B / dt, 1),
        "model_flops_per_utt": flops_per_batch / B,
        "achieved_tflops_per_sec": round(tflops, 2),
        "mfu_vs_197T_bf16_peak": round(tflops / 197.0, 4),
        "hbm_bytes_per_batch": bytes_per_batch,
        "achieved_hbm_gbps": round(bytes_per_batch / dt / 1e9, 1),
    }

    # ------------------------------------------ 2. mixed-bucket decode
    # a LibriSpeech-like length mixture; each length lands in its bucketed
    # static shape => one XLA compile per bucket, then steady state
    buckets = [(2.0, 32), (4.0, 32), (7.0, 32), (15.0, 16)]
    n_compiles = 0
    total_utts = 0
    total_audio = 0.0
    batches = []
    for secs, n in buckets:
        bw, bl = make_waves(n, secs=secs)
        batches.append((jnp.asarray(bw), jnp.asarray(bl), secs, n))
    t_compile0 = time.perf_counter()
    for bw, bl, secs, n in batches:
        r = fwd(params, lm_params, bw, bl)   # compile (cache-miss) per shape
        jax.block_until_ready(r)
        n_compiles += 1
    compile_wall = time.perf_counter() - t_compile0

    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        for bw, bl, secs, n in batches:
            r = fwd(params, lm_params, bw, bl)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    total_utts = sum(n for _, _, _, n in batches) * reps
    total_audio = sum(secs * n for _, _, secs, n in batches) * reps
    out["mixed_buckets"] = {
        "buckets": [{"secs": s, "batch": n} for _, _, s, n in batches],
        "xla_compilations": n_compiles,
        "first_pass_wall_s": round(compile_wall, 1),
        "steady_utts_per_sec": round(total_utts / dt, 1),
        "steady_inv_rtf": round(total_audio / dt, 1),
    }

    # ------------------------------------------------ 3. train-step MFU
    import optax
    from end_to_end_asr_pytorch_tpu.ops.pallas.ctc_kernel import (
        ctc_loss_pallas)
    from end_to_end_asr_pytorch_tpu.optim import Optimizer
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import masked_ce

    opt = Optimizer({"optimizer": "Adadelta", "lr": 1.0}, grad_clip=5.0)
    opt_state = opt.init(params)

    def _cast_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, tree)

    def make_step(amp):
        def train_step(ps, os_, wv, wl_, tx, tl, rng):
            def loss_fn(pp):
                feat, feat_len = frontend(wv, wl_)
                mp = _cast_bf16(pp) if amp else pp
                if amp:
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
            updates, os_ = opt.tx.update(grads, os_, ps)
            return optax.apply_updates(ps, updates), os_, loss
        return jax.jit(train_step, donate_argnums=(0, 1))

    rng = np.random.RandomState(0)
    U = 96  # ~chars in a 7 s utterance
    text = jnp.asarray(rng.randint(2, VOCAB, (B, U)), jnp.int32)
    text_len = jnp.full((B,), U, jnp.int32)
    for amp in (False, True):
        step_fn = make_step(amp)
        compiled = step_fn.lower(params, opt_state, w, wl, text, text_len,
                                 jax.random.PRNGKey(2)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        tr_flops = float(ca.get("flops", 0.0))
        # fresh copies: the step donates its params/opt_state buffers
        ps = jax.tree_util.tree_map(jnp.copy, params)
        os_ = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, opt_state)
        # value-fetch sync + pre-built keys (see LM section note below)
        tkeys = [jax.random.PRNGKey(3 + i) for i in range(20)]
        ps, os_, loss = step_fn(ps, os_, w, wl, text, text_len,
                                jax.random.PRNGKey(2))
        _ = float(loss)
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            ps, os_, loss = step_fn(ps, os_, w, wl, text, text_len,
                                    tkeys[i])
        _ = float(loss)
        dt = (time.perf_counter() - t0) / iters
        tflops = tr_flops / dt / 1e12
        out[f"train_batch128_{'bf16' if amp else 'f32'}"] = {
            "ms_per_step": round(dt * 1e3, 1),
            "utts_per_sec": round(B / dt, 1),
            "model_flops_per_step": tr_flops,
            "achieved_tflops_per_sec": round(tflops, 2),
            "mfu_vs_197T_bf16_peak": round(tflops / 197.0, 4),
        }

    # ------------------------------------------------ 4. LM train throughput
    from end_to_end_asr_pytorch_tpu.models.lm import RNNLM as _RNNLM
    lm_tr = _RNNLM(VOCAB, LM_CFG)
    lm_ps = lm_tr.init(jax.random.PRNGKey(7))
    lm_opt = Optimizer({"optimizer": "Adam", "lr": 1e-3}, grad_clip=5.0)
    lm_os = lm_opt.init(lm_ps)
    BL, UL = 256, 96

    def lm_step(ps, os_, tx_, tl_, rng):
        def loss_fn(p):
            sos = jnp.full((BL, 1), 1, jnp.int32)
            inp = jnp.concatenate([sos, tx_[:, :-1]], axis=1)
            logits = lm_tr.forward(p, inp, tl_, train=True, rng=rng)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, tx_[..., None], axis=-1)[..., 0]
            mask = (jnp.arange(UL)[None] < tl_[:, None]).astype(nll.dtype)
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(ps)
        ups, os_ = lm_opt.tx.update(grads, os_, ps)
        return optax.apply_updates(ps, ups), os_, loss

    lm_fn = jax.jit(lm_step, donate_argnums=(0, 1))
    ltx = jnp.asarray(np.random.RandomState(1).randint(2, VOCAB, (BL, UL)),
                      jnp.int32)
    ltl = jnp.full((BL,), UL, jnp.int32)
    # Pre-build keys and sync with a VALUE FETCH: through the axon tunnel,
    # block_until_ready on this small donated-scalar step can return before
    # execution completes (measured 0.09 ms/step "timings"); float(l) forces
    # real completion (costs one ~1.5 ms RTT across the 20-step loop).
    lkeys = [jax.random.PRNGKey(9 + i) for i in range(21)]
    lm_ps, lm_os, l = lm_fn(lm_ps, lm_os, ltx, ltl, lkeys[20])
    _ = float(l)
    t0 = time.perf_counter()
    for i in range(20):
        lm_ps, lm_os, l = lm_fn(lm_ps, lm_os, ltx, ltl, lkeys[i])
    _ = float(l)
    dt = (time.perf_counter() - t0) / 20
    out["lm_train_batch256"] = {
        "ms_per_step": round(dt * 1e3, 2),
        "tokens_per_sec": round(BL * UL / dt, 0),
    }

    Path("bench_details.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
