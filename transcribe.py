#!/usr/bin/env python
"""Batch transcription tool: audio files in, transcripts out.

A production-facing surface the reference lacks (its only decode path walks a
corpus with ground truth): point this at arbitrary WAV/FLAC files and get
transcripts, decoded with the same fully-batched on-device beam search as
`main.py --test`.

  python transcribe.py --config config/libri/asr_example.yaml \
      --load ckpt/.../best_att.pth audio1.wav audio2.flac dir_of_audio/ \
      [--beam 8] [--batch 16] [--output out.tsv]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def collect_files(paths):
    exts = {".wav", ".flac", ".npy"}
    out = []
    for p in map(Path, paths):
        if p.is_dir():
            out.extend(sorted(q for q in p.rglob("*")
                              if q.suffix.lower() in exts))
        elif p.suffix.lower() in exts:
            out.append(p)
        else:
            # an explicitly-named file must never be dropped silently
            print(f"warning: skipping {p} (unsupported suffix)",
                  file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("audio", nargs="+", help="audio files or directories")
    ap.add_argument("--config", required=True)
    ap.add_argument("--load", required=True, help="ASR checkpoint")
    ap.add_argument("--beam", type=int, default=None,
                    help="override decode.beam_size")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--output", default=None, help="TSV output (default stdout)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import os
    # one shared persistent compile cache across every entry point (env var
    # must be set BEFORE jax is imported — jax reads it at import time)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          str(Path.home() / ".cache" / "jax_asr"))
    import jax
    if args.cpu:
        # the axon TPU plugin ignores the JAX_PLATFORMS env var; only the
        # config route works (same as main.py setup_backend)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from end_to_end_asr_pytorch_tpu.config import load_config
    from end_to_end_asr_pytorch_tpu.data.audio_io import load_audio
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    from end_to_end_asr_pytorch_tpu.decode.greedy import ctc_greedy
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    from end_to_end_asr_pytorch_tpu.ops.audio import create_transform
    from end_to_end_asr_pytorch_tpu.utils.checkpoint import load_checkpoint
    from end_to_end_asr_pytorch_tpu.utils.text import load_text_encoder

    cfg = load_config(args.config)
    tokenizer = load_text_encoder(**cfg["data"]["text"])
    frontend, feat_dim = create_transform(cfg["data"]["audio"])
    model = ASR(feat_dim, tokenizer.vocab_size, cfg["model"])
    params = model.init(jax.random.PRNGKey(0))
    params = load_checkpoint(args.load, params)["model"]

    decode_cfg = dict(cfg.get("decode", {}))
    decode_cfg["lm_weight"] = 0.0  # LM fusion via main.py --test; keep simple
    if args.beam:
        decode_cfg["beam_size"] = args.beam

    if model.enable_att:
        decoder = BeamDecoder(model, decode_cfg)
        decode = jax.jit(lambda p, w, wl: decoder.forward(
            p, *frontend(w, wl)))
    else:
        def ctc_path(p, w, wl):
            feat, feat_len = frontend(w, wl)
            enc, enc_len = model.encode(p, feat, feat_len)
            return ctc_greedy(model.ctc_output(p, enc)), enc_len
        decode = jax.jit(ctc_path)

    files = collect_files(args.audio)
    if not files:
        sys.exit("no audio files found")
    rows = []
    t0 = time.perf_counter()
    audio_secs = 0.0
    for i in range(0, len(files), args.batch):
        chunk = files[i:i + args.batch]
        waves = []
        sr_expect = frontend.sample_rate
        for f in chunk:
            w, sr = load_audio(str(f))
            if sr != sr_expect:
                sys.exit(f"{f}: sample rate {sr} != the model's configured "
                         f"{sr_expect} Hz — resample the audio first "
                         "(silently framing at the wrong rate would produce "
                         "confidently wrong transcripts)")
            waves.append(w)
        audio_secs += sum(len(w) for w in waves) / float(sr_expect)
        s_max = max(len(w) for w in waves)
        t_pad = ((s_max // 160 + 1 + 63) // 64) * 64
        s_pad = max((t_pad - 1) * 160, s_max)
        wave = np.zeros((len(chunk), s_pad), np.float32)
        wave_len = np.zeros((len(chunk),), np.int32)
        for b, w in enumerate(waves):
            wave[b, :len(w)] = w
            wave_len[b] = len(w)
        if model.enable_att:
            out = decode(params, jnp.asarray(wave), jnp.asarray(wave_len))
            toks, lens = np.asarray(out.tokens), np.asarray(out.lengths)
            for b, f in enumerate(chunk):
                rows.append((str(f), tokenizer.decode(
                    toks[b, 0, :lens[b, 0]].tolist())))
        else:
            ids, enc_len = decode(params, jnp.asarray(wave),
                                  jnp.asarray(wave_len))
            ids, enc_len = np.asarray(ids), np.asarray(enc_len)
            for b, f in enumerate(chunk):
                rows.append((str(f), tokenizer.decode(
                    ids[b, :enc_len[b]].tolist(), ignore_repeat=True)))
    dt = time.perf_counter() - t0
    text = "\n".join(f"{f}\t{hyp}" for f, hyp in rows)
    if args.output:
        Path(args.output).write_text(text + "\n")
    else:
        print(text)
    print(f"# {len(files)} files, {audio_secs:.1f}s audio in {dt:.1f}s "
          f"({audio_secs / dt:.1f}x real-time incl. compile)", file=sys.stderr)


if __name__ == "__main__":
    main()
