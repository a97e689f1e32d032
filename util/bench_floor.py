#!/usr/bin/env python
"""Large-V decode roofline: where does V=16384 sit against the HBM floor?

VERDICT r4 item 4: close the large-V decode axis with a floor analysis.
This script produces the numbers BASELINE.md's "large-V floor" subsection
reports, for V in {5120, 16384} (exact and +approx_topk):

  1. XLA's own traffic model: compiled cost_analysis "bytes accessed" for
     the full decode program (early_stop forced OFF so the label loop is a
     lax.scan with a STATIC trip count — the while_loop early-exit variant
     would count the body once; outputs are identical on random weights,
     which never trigger the exit).
  2. Measured steady-state ms/batch (20 iters; 10-iter trials swing +-10%
     through the tunnel) -> achieved HBM GB/s = bytes / time.
  3. The analytic hard floor: the psi phase-1 einsum must re-read the
     loop-invariant (B,T,V) bf16 probs operand every label step — the one
     read no exact algorithm that scores all V continuations can avoid
     (candidate-restricted gathers measured 2-9x slower, BASELINE.md).
     floor_ms = steps * B*T*V*2 / PEAK_BW; ceiling_utts = B / floor_ms.

Also re-measures (--cold) the V=1024/w32 first-compile outlier (978 s in
the round-4 sweep vs 13-33 s for every other row) with a throwaway
compilation-cache dir, to distinguish an XLA pathology from a one-off
remote-compile stall through the chip tunnel.

Run on the TPU host, chip idle (NEVER while a training job holds the
chip — second-client RPCs hang the trainer). Writes bench_floor.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_BW = 819e9     # v5e HBM, bytes/sec
PEAK_BF16 = 197e12  # v5e MXU, FLOP/s


def run_one(V, approx_topk=False, iters=20):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "jax_asr"))
    import jax.numpy as jnp
    from bench import AUDIO_CFG, DECODE_CFG, LM_CFG, MODEL_CFG, make_waves
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    from end_to_end_asr_pytorch_tpu.models.lm import RNNLM
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    from end_to_end_asr_pytorch_tpu.ops.audio import create_transform

    B = 128
    frontend, feat_dim = create_transform(AUDIO_CFG)
    model = ASR(feat_dim, V, MODEL_CFG)
    params = model.init(jax.random.PRNGKey(0))
    lm = RNNLM(V, LM_CFG)
    lm_params = lm.init(jax.random.PRNGKey(1))
    cfg = dict(DECODE_CFG)
    cfg["ctc_candidates"] = V          # full-vocab CTC scoring (the default)
    cfg["early_stop"] = False          # static-trip-count scan: cost
    if approx_topk:                    # analysis counts every label step
        cfg["approx_topk"] = approx_topk
    decoder = BeamDecoder(model, cfg, lm=lm)

    fwd = jax.jit(lambda p, lp, w, wl: decoder.forward(
        p, *frontend(w, wl), lm_params=lp))
    waves, lens = make_waves(B)
    w, wl = jnp.asarray(waves), jnp.asarray(lens)

    compiled = fwd.lower(params, lm_params, w, wl).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    out = fwd(params, lm_params, w, wl)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, lm_params, w, wl)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    # analytic hard floor: psi operand re-read per label step
    import math
    T_enc = 176                        # 7 s -> 704 frames -> VGG 4x
    steps = max(1, int(math.ceil(decoder.max_len_ratio * T_enc)))
    psi_bytes_step = B * T_enc * V * 2          # bf16 (B,T,V) probs
    floor_s = steps * psi_bytes_step / PEAK_BW
    return {
        "V": V,
        "mode": "full" + (f"+atk{approx_topk}" if approx_topk else ""),
        "batch": B,
        "label_steps": int(steps),
        "ms_per_batch": round(dt * 1e3, 1),
        "utts_per_sec": round(B / dt, 1),
        "xla_bytes_per_batch": bytes_acc,
        "xla_flops_per_batch": flops,
        "achieved_hbm_gbps": round(bytes_acc / dt / 1e9, 1),
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "psi_operand_mb_per_step": round(psi_bytes_step / 1e6, 1),
        "psi_floor_ms_per_batch": round(floor_s * 1e3, 1),
        "ceiling_utts_psi_only_at_peak_bw": round(B / floor_s, 0),
        "xla_floor_ms_at_peak_bw": round(bytes_acc / PEAK_BW * 1e3, 1),
        "ceiling_utts_xla_bytes_at_peak_bw":
            round(B / (bytes_acc / PEAK_BW), 0),
    }


def cold_compile_w32():
    """Re-measure the V=1024/w32 first compile with a cold cache."""
    import os
    import tempfile
    cache = tempfile.mkdtemp(prefix="jax_coldcache_")
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp
    from bench import AUDIO_CFG, DECODE_CFG, LM_CFG, MODEL_CFG, make_waves
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    from end_to_end_asr_pytorch_tpu.models.lm import RNNLM
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    from end_to_end_asr_pytorch_tpu.ops.audio import create_transform

    V, B = 1024, 128
    frontend, feat_dim = create_transform(AUDIO_CFG)
    model = ASR(feat_dim, V, MODEL_CFG)
    params = model.init(jax.random.PRNGKey(0))
    lm = RNNLM(V, LM_CFG)
    lm_params = lm.init(jax.random.PRNGKey(1))
    cfg = dict(DECODE_CFG)
    cfg["ctc_candidates"] = V
    cfg["ctc_window"] = 32
    decoder = BeamDecoder(model, cfg, lm=lm)
    fwd = jax.jit(lambda p, lp, w, wl: decoder.forward(
        p, *frontend(w, wl), lm_params=lp))
    waves, lens = make_waves(B)
    w, wl = jnp.asarray(waves), jnp.asarray(lens)
    t0 = time.perf_counter()
    out = fwd(params, lm_params, w, wl)
    import jax as _j
    _j.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {"V": V, "mode": "full+w32", "cold_first_call_s": round(dt, 1)}


def main():
    if "--cold" in sys.argv:
        row = cold_compile_w32()
        print(json.dumps(row), flush=True)
        out_file = Path(__file__).parent.parent / "bench_floor.json"
        rows = (json.loads(out_file.read_text())
                if out_file.exists() else [])
        rows = [r for r in rows if "cold_first_call_s" not in r]
        rows.append(row)
        out_file.write_text(json.dumps(rows, indent=1))
        return
    rows = []
    for V in (5120, 16384):
        for atk in (False, 0.95):
            r = run_one(V, atk)
            rows.append(r)
            print(json.dumps(r), flush=True)
    out_file = Path(__file__).parent.parent / "bench_floor.json"
    old = (json.loads(out_file.read_text()) if out_file.exists() else [])
    old = [r for r in old if "cold_first_call_s" in r]
    out_file.write_text(json.dumps(old + rows, indent=1))


if __name__ == "__main__":
    main()
