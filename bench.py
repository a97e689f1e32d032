#!/usr/bin/env python
"""Benchmark: batched on-device joint CTC-attention beam decode throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utts/sec/chip", "vs_baseline": N}

Metric matches BASELINE.json: test-set decode throughput (utts/sec/chip) at
LibriSpeech-like shapes (LAS + VGG encoder, location-aware attention, joint
CTC rescoring + RNN-LM shallow fusion, beam 8). ``vs_baseline`` is measured
against the reference-style CPU-PyTorch per-utterance Python beam decoder
(bench_baseline.py), whose utts/sec is cached in bench_baseline.json —
rerun ``python bench_baseline.py`` to refresh it on this machine.

Weights are random: decode FLOPs/throughput are weight-independent, and no
trained LibriSpeech checkpoint exists in this sandbox (see BASELINE.md).
"""
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

# LibriSpeech-scale flagship decode config (shared with bench_baseline.py)
MODEL_CFG = {
    "ctc_weight": 0.5,
    "encoder": {
        "prenet": "vgg", "module": "LSTM", "bidirection": True,
        "dim": [512, 512, 512], "dropout": [0.0] * 3,
        "layer_norm": [False] * 3, "proj": [False] * 3,
        "sample_rate": [1, 1, 1], "sample_style": "drop",
    },
    "attention": {"mode": "loc", "dim": 300, "num_head": 1,
                  "temperature": 0.5, "v_proj": True,
                  "loc_kernel_size": 100, "loc_kernel_num": 10},
    "decoder": {"module": "LSTM", "dim": 512, "layer": 1, "dropout": 0.0},
}
LM_CFG = {"module": "LSTM", "dim": 512, "emb_dim": 512, "layer": 1}
AUDIO_CFG = {"feat_type": "fbank", "feat_dim": 40, "cmvn": True}
DECODE_CFG = {"beam_size": 8, "min_len_ratio": 0.05, "max_len_ratio": 0.6,
              "ctc_weight": 0.3, "lm_weight": 0.3}
VOCAB = 31
BATCH = 128            # throughput-optimal on one v5e chip (measured: 16 ->
                       # 1341, 32 -> 1548, 128 -> 1743, 256 -> 1585 utts/s)
N_BATCHES = 8          # timed batches (after warmup/compile); the TPU
                       # tunnel shows ~±6% run-to-run noise at small N
SECS = 7.0             # ~LibriSpeech test-clean mean utterance length
SEED = 0


def make_waves(n, secs=SECS, sr=16000, seed=SEED):
    rng = np.random.RandomState(seed)
    s = int(secs * sr)
    # pad to the framework's canonical frame quantum
    t_pad = ((s // 160 + 1 + 63) // 64) * 64
    s_pad = (t_pad - 1) * 160
    waves = rng.randn(n, s_pad).astype(np.float32) * 0.1
    lens = np.full((n,), s, np.int32)
    return waves, lens


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

    waves, lens = make_waves(BATCH)
    w = jnp.asarray(waves)
    wl = jnp.asarray(lens)
    out = fwd(params, lm_params, w, wl)          # warmup + compile
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(N_BATCHES):
        out = fwd(params, lm_params, w, wl)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    n_utts = BATCH * N_BATCHES
    utts_per_sec = n_utts / dt
    audio_secs = n_utts * SECS
    rtf_inv = audio_secs / dt                     # x real-time

    base_file = Path(__file__).parent / "bench_baseline.json"
    vs = None
    if base_file.exists():
        base = json.loads(base_file.read_text())
        if base.get("utts_per_sec"):
            vs = utts_per_sec / base["utts_per_sec"]

    print(json.dumps({
        "metric": "batched joint CTC-att+LM beam decode throughput "
                  f"(beam {DECODE_CFG['beam_size']}, {SECS:.0f}s utts, "
                  f"LAS-512 VGG, 1 chip; inv-RTF {rtf_inv:.1f}x)",
        "value": round(utts_per_sec, 3),
        "unit": "utts/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
