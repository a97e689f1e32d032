#!/usr/bin/env python
"""Vocab-scaling decode benchmark: beam throughput at subword vocab sizes.

LibriSpeech deployments use subword vocabs (1k-16k), not the char-31 vocab
bench.py's flagship number is measured at. This script measures the full
beam+LM+CTC decode at V in {31, 1024, 5120, 16384} in candidate-restricted
CTC scoring mode (the production path for large V: phase-1 psi row-gathers
C candidate rows instead of reading the whole (B,T,V) probs tensor per
step) and, where it fits, full-vocab scoring for comparison.

Writes bench_vocab.json rows for BASELINE.md's V-scaling table.
Run on the TPU host; never concurrently with pytest (1 host core).
"""
import json
import os
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path.home() / ".cache" / "jax_asr"))

import numpy as np

from bench import AUDIO_CFG, DECODE_CFG, LM_CFG, MODEL_CFG, SECS, make_waves

BATCH = 128
ITERS = 20  # 10-iter trials swing +-10% through the TPU tunnel


def run_one(V, ctc_candidates, batch=BATCH, iters=ITERS):
    import jax
    import jax.numpy as jnp
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    from end_to_end_asr_pytorch_tpu.models.lm import RNNLM
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    from end_to_end_asr_pytorch_tpu.ops.audio import create_transform

    frontend, feat_dim = create_transform(AUDIO_CFG)
    model = ASR(feat_dim, V, MODEL_CFG)
    params = model.init(jax.random.PRNGKey(0))
    lm = RNNLM(V, LM_CFG)
    lm_params = lm.init(jax.random.PRNGKey(1))
    cfg = dict(DECODE_CFG)
    if ctc_candidates is not None:
        cfg["ctc_candidates"] = ctc_candidates
    else:
        cfg["ctc_candidates"] = V  # force full-vocab CTC scoring
    decoder = BeamDecoder(model, cfg, lm=lm)

    fwd = jax.jit(lambda p, lp, w, wl: decoder.forward(
        p, *frontend(w, wl), lm_params=lp))

    waves, lens = make_waves(batch)
    w, wl = jnp.asarray(waves), jnp.asarray(lens)
    t0 = time.perf_counter()
    out = fwd(params, lm_params, w, wl)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, lm_params, w, wl)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {
        "V": V,
        "ctc_candidates": cfg["ctc_candidates"],
        "mode": "full" if cfg["ctc_candidates"] >= V else "candidate",
        "batch": batch,
        "utts_per_sec": round(batch / dt, 1),
        "ms_per_batch": round(dt * 1e3, 1),
        "inv_rtf": round(batch * SECS / dt, 1),
        "first_call_s": round(compile_s, 1),
    }


def main():
    rows = []
    configs = [
        (31, None),          # char flagship (C=128 default >= V -> full)
        (1024, 32),
        (1024, 128),
        (1024, None),        # full-vocab scoring comparison
        (5120, 128),
        (5120, None),
        (16384, 128),
        (16384, None),
    ]
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for V, C in configs:
        tag = f"{V}/{C}"
        if only and tag not in only:
            continue
        r = run_one(V, C)
        rows.append(r)
        print(json.dumps(r), flush=True)
    out_file = Path(__file__).parent / "bench_vocab.json"
    old = json.loads(out_file.read_text()) if out_file.exists() else []
    # replace rows with the same (V, ctc_candidates)
    keyed = {(r["V"], r["ctc_candidates"]): r for r in old}
    for r in rows:
        keyed[(r["V"], r["ctc_candidates"])] = r
    out_file.write_text(json.dumps(
        sorted(keyed.values(), key=lambda r: (r["V"], r["ctc_candidates"])),
        indent=1))


if __name__ == "__main__":
    main()
