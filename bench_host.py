#!/usr/bin/env python
"""Cold-cache host data-path benchmark: FLAC decode -> batch assembly.

All steady-state CLI numbers ride the decoded-waveform LRU cache; this
measures what the HOST can feed with the cache disabled — the number that
decides whether a host core count can keep a TPU train step busy on real
(FLAC) data. Reports utts/sec and audio-seconds/sec of end-to-end batch
assembly (native C++ FLAC decode via ctypes, int16 packing, padding,
batching) at n_jobs in {0, 1, 2, 4} loader threads; the C++ decoder drops
the GIL, so threads should scale until the core count runs out.

Writes bench_host.json. Pure host benchmark — safe to run without the TPU,
but do NOT run concurrently with TPU benches (shared host core).
"""
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

N_UTTS = 96
BATCH = 16
# ~7 s utterances (LibriSpeech test-clean mean): 12-14 words x ~6.5 chars
# x 0.08 s/char tone
WORDS = (12, 14)


def build_flac_corpus(root: Path, n: int) -> None:
    from end_to_end_asr_pytorch_tpu.data import synthetic
    from end_to_end_asr_pytorch_tpu.data.audio_io import load_audio
    from tests.flac_encoder import encode_flac

    synthetic.generate_corpus(str(root), n_train=n, n_dev=2, n_test=2,
                              min_words=WORDS[0], max_words=WORDS[1])
    for wav in root.rglob("*.wav"):
        wave, sr = load_audio(str(wav))
        pcm = np.clip(np.round(wave * 32768.0), -32768, 32767).astype(np.int16)
        wav.with_suffix(".flac").write_bytes(encode_flac(pcm, sr=sr))
        wav.unlink()


def main():
    from end_to_end_asr_pytorch_tpu.data.dataset import AudioBatchLoader
    from end_to_end_asr_pytorch_tpu.data.librispeech import LibriDataset
    from end_to_end_asr_pytorch_tpu.utils import native
    from end_to_end_asr_pytorch_tpu.utils.text import load_text_encoder

    tmp = Path(tempfile.mkdtemp(prefix="bench_host_"))
    out = {"native_flac_decoder": native.get_lib() is not None,
           "n_utts": N_UTTS, "batch": BATCH}
    try:
        build_flac_corpus(tmp, N_UTTS)
        tok = load_text_encoder("character", str(tmp / "vocab.txt"))
        ds = LibriDataset(str(tmp), ["train-clean"], tok)
        rows = []
        for n_jobs in (0, 1, 2, 4):
            loader = AudioBatchLoader(ds, BATCH, shuffle=False,
                                      n_jobs=n_jobs, cache_bytes=0)
            # warm the page cache / first-touch costs, then time 2 epochs
            for _ in loader.epoch_iter(shuffle=False):
                pass
            t0 = time.perf_counter()
            n = 0
            audio = 0.0
            for _ in range(2):
                for b in loader.epoch_iter(shuffle=False):
                    n += int((b["text_len"] > 0).sum())
                    audio += float(b["wave_len"].sum()) / 16000.0
            dt = time.perf_counter() - t0
            rows.append({
                "n_jobs": n_jobs,
                "utts_per_sec": round(n / dt, 1),
                "audio_sec_per_sec": round(audio / dt, 1),
            })
            print(json.dumps(rows[-1]), flush=True)
        out["cold_cache"] = rows

        # cache-warm comparison at n_jobs=0 (the steady-state CLI regime)
        loader = AudioBatchLoader(ds, BATCH, shuffle=False, n_jobs=0)
        for _ in loader.epoch_iter(shuffle=False):
            pass
        t0 = time.perf_counter()
        n = 0
        audio = 0.0
        for _ in range(2):
            for b in loader.epoch_iter(shuffle=False):
                n += int((b["text_len"] > 0).sum())
                audio += float(b["wave_len"].sum()) / 16000.0
        dt = time.perf_counter() - t0
        out["warm_cache_n0"] = {"utts_per_sec": round(n / dt, 1),
                                "audio_sec_per_sec": round(audio / dt, 1)}
        print(json.dumps(out["warm_cache_n0"]), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    Path(__file__).with_name("bench_host.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
