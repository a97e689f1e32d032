"""Early-exit A/B on a TRAINED checkpoint: 20-iteration timed trials of the
jitted beam decode with early_stop on vs off, same batch, same weights.

The CLI's per-split utts/sec is a single-shot number over 2 batches through
the TPU tunnel — it swings 2x (NOTES gotchas). This harness is the reliable
instrument: steady-state per-iteration time after a warmup run, value-fetch
synced. Usage:

    python bench_earlystop.py [config] [ckpt]   # defaults: long-subword

Prints one JSON line per variant plus a summary delta. Run on an idle chip.
"""
import json
import sys
import time

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    cfg_path = args[0] if len(args) > 0 else \
        "config/synthetic/las_subword_long.yaml"
    ckpt = args[1] if len(args) > 1 else \
        "ckpt/las_subword_long_sd0/best_att.pth"
    import jax
    if "--cpu" in sys.argv:   # NEVER touch the chip when another job holds it
        jax.config.update("jax_platforms", "cpu")
    import yaml
    from end_to_end_asr_pytorch_tpu.data.dataset import load_dataset
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    from end_to_end_asr_pytorch_tpu.ops.audio import create_transform
    from end_to_end_asr_pytorch_tpu.utils.checkpoint import load_checkpoint

    cfg = yaml.safe_load(open(cfg_path))
    # second slot = the TEST loader (mode='test' returns (dev, test, ...)):
    # this harness's numbers are correlated with the CLI's test-split rates
    _, tt_set, feat_dim, vocab, _, _ = load_dataset(
        1, True, False, False, mode="test", **cfg["data"])
    frontend, _ = create_transform(cfg["data"]["audio"])
    model = ASR(feat_dim, vocab, cfg["model"])
    params = load_checkpoint(ckpt, model.init(jax.random.PRNGKey(0)))["model"]

    batch = next(iter(tt_set))
    wave = np.asarray(batch["wave"], np.float32)
    wave_len = np.asarray(batch["wave_len"], np.int32)
    B = wave.shape[0]
    secs = float(wave_len.sum()) / 16000.0
    print(f"batch {B} utts, {secs:.1f} audio-sec, vocab {vocab}",
          file=sys.stderr)

    results = {}
    for es in (False, True):
        dc = dict(cfg["decode"])
        dc["early_stop"] = es
        dc.pop("lm_path", None)
        dc["lm_weight"] = 0.0   # isolate the beam loop; LM adds a constant
        dec = BeamDecoder(model, dc)
        fn = jax.jit(lambda p, w, wl: dec.forward(p, *frontend(w, wl)))
        out = fn(params, wave, wave_len)
        jax.block_until_ready(out)          # compile + warmup
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(params, wave, wave_len)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20
        rate = B / dt
        results[es] = (rate, out)
        print(json.dumps({"metric": "decode_utts_per_sec",
                          "early_stop": es, "value": round(rate, 1),
                          "ms_per_batch": round(dt * 1e3, 2)}))
    r_off, o_off = results[False]
    r_on, o_on = results[True]
    same = bool(np.array_equal(np.asarray(o_off.tokens),
                               np.asarray(o_on.tokens)))
    print(json.dumps({"metric": "early_stop_speedup",
                      "value": round(r_on / r_off, 4),
                      "outputs_identical": same}))


if __name__ == "__main__":
    main()
