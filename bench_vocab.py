#!/usr/bin/env python
"""Vocab-scaling decode benchmark: beam throughput at subword vocab sizes.

LibriSpeech deployments use subword vocabs (1k-16k), not the char-31 vocab
bench.py's flagship number is measured at. This script measures the full
beam+LM+CTC decode at V in {31, 1024, 5120, 16384}: full-vocab CTC scoring
(the default and the fast path on TPU), candidate-restricted mode for
comparison (a search-space knob; measured slower at every V — see
BASELINE.md), and the opt-in int8-quantized psi matmul (`psi_quant`).

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


def run_one(V, ctc_candidates, psi_quant=False, approx_topk=False,
            ctc_window=0, batch=BATCH, iters=ITERS):
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
    if psi_quant:
        cfg["psi_quant"] = psi_quant
    if approx_topk:
        cfg["approx_topk"] = approx_topk
    if ctc_window:
        cfg["ctc_window"] = ctc_window
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
        "psi_quant": psi_quant or False,
        "approx_topk": approx_topk or 0.0,   # keep columns single-typed
        "ctc_window": ctc_window or 0,

        "mode": ("full" if cfg["ctc_candidates"] >= V else "candidate")
                + ("+q8" if psi_quant else "")
                + (f"+atk{approx_topk}" if approx_topk else "")
                + (f"+w{ctc_window}" if ctc_window else ""),
        "batch": batch,
        "utts_per_sec": round(batch / dt, 1),
        "ms_per_batch": round(dt * 1e3, 1),
        "inv_rtf": round(batch * SECS / dt, 1),
        "first_call_s": round(compile_s, 1),
    }


def main():
    rows = []
    configs = [
        (31, None, False, False),   # char flagship (C=128 default -> full)
        (1024, 32, False, False),
        (1024, 128, False, False),
        (1024, None, False, False),  # full-vocab scoring comparison
        (5120, 128, False, False),
        (5120, None, False, False),
        (16384, 128, False, False),
        (16384, None, False, False),
        (1024, None, "int8", False),
        (5120, None, "int8", False),
        (16384, None, "int8", False),
        (1024, None, False, 0.95),
        (5120, None, False, 0.95),
        (16384, None, False, 0.95),
        (16384, None, False, 0.99),
        # combined levers: the production large-V config if each is
        # WER-neutral on the trained checkpoints (util/run_sub5k.sh A/B)
        (5120, None, "int8", 0.95),
        (16384, None, "int8", 0.95),
        # windowed phase-1 psi (ctc_window; WER-neutral on the trained
        # V=4591 checkpoint — see BASELINE.md sub5k A/B)
        (1024, None, False, False, 32),
        (5120, None, False, False, 32),
        (16384, None, False, False, 32),
        (16384, None, False, 0.95, 32),
    ]
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for cfg_row in configs:
        V, C, Q, A = cfg_row[:4]
        W = cfg_row[4] if len(cfg_row) > 4 else 0
        tag = (f"{V}/{C}" + ("/q8" if Q else "")
               + (f"/atk{A}" if A else "") + (f"/w{W}" if W else ""))
        if only and tag not in only:
            continue
        r = run_one(V, C, Q, A, W)
        rows.append(r)
        print(json.dumps(r), flush=True)
    out_file = Path(__file__).parent / "bench_vocab.json"
    old = json.loads(out_file.read_text()) if out_file.exists() else []
    # replace rows with the same (V, ctc_candidates)
    key = lambda r: (r["V"], r["ctc_candidates"],
                     str(r.get("psi_quant") or ""),
                     str(r.get("approx_topk") or ""),
                     str(r.get("ctc_window") or ""))
    keyed = {key(r): r for r in old}
    for r in rows:
        keyed[key(r)] = r
    out_file.write_text(json.dumps(sorted(keyed.values(), key=key), indent=1))


if __name__ == "__main__":
    main()
