"""Pretrained-embedding table generation for the plugin (SURVEY.md 2.19).

Mirror of the reference's ``src/bert_embedding.py:generate_embedding``: build
a (vocab, emb_dim) table, one row per tokenizer vocab entry, from a
pretrained transformer (HuggingFace ``transformers`` is in the image). Zero
network egress in this sandbox means hub downloads fail — pass a LOCAL model
path, or use ``method='hash'`` to produce a deterministic random-projection
table (offline stand-in with the same interface/shape contract).

Usage:
  python -m end_to_end_asr_pytorch_tpu.utils.bert_embedding \
      --vocab_file v.txt --mode character --output emb.npy \
      [--model bert-base-uncased | --method hash --dim 256]
"""
from __future__ import annotations

import argparse
import hashlib

import numpy as np

from .text import load_text_encoder


def _hash_embedding(tokens, dim: int) -> np.ndarray:
    """Deterministic pseudo-embeddings: each token's bytes seed a gaussian
    row. Not semantic — an offline fallback preserving the pipeline."""
    out = np.zeros((len(tokens), dim), np.float32)
    for i, tok in enumerate(tokens):
        seed = int.from_bytes(hashlib.sha256(tok.encode()).digest()[:4],
                              "little")
        out[i] = np.random.RandomState(seed).randn(dim).astype(np.float32)
    return out


def generate_embedding(vocab_file: str, mode: str, output: str,
                       model: str | None = None, method: str = "auto",
                       dim: int = 256) -> np.ndarray:
    tok = load_text_encoder(mode, vocab_file)
    pieces = [tok._id_to_piece(i) if i >= 3 else f"<{i}>"
              for i in range(tok.vocab_size)]
    table = None
    if method in ("auto", "bert") and model:
        try:
            import torch
            from transformers import AutoModel, AutoTokenizer
            bert_tok = AutoTokenizer.from_pretrained(model)
            bert = AutoModel.from_pretrained(model).eval()
            rows = []
            with torch.no_grad():
                for piece in pieces:
                    ids = bert_tok(piece, return_tensors="pt",
                                   add_special_tokens=True)
                    hidden = bert(**ids).last_hidden_state[0]
                    rows.append(hidden.mean(0).numpy())
            table = np.stack(rows).astype(np.float32)
        except Exception as e:  # offline / missing weights
            if method == "bert":
                raise
            print(f"[bert_embedding] transformer path failed ({e}); "
                  f"falling back to hash embeddings")
    if table is None:
        table = _hash_embedding(pieces, dim)
    np.save(output, table)
    return table


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vocab_file", required=True)
    ap.add_argument("--mode", default="character",
                    choices=["character", "word", "subword"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--model", default=None)
    ap.add_argument("--method", default="auto",
                    choices=["auto", "bert", "hash"])
    ap.add_argument("--dim", type=int, default=256)
    args = ap.parse_args()
    t = generate_embedding(args.vocab_file, args.mode, args.output,
                           args.model, args.method, args.dim)
    print(f"wrote {t.shape} embedding table to {args.output}")


if __name__ == "__main__":
    main()
