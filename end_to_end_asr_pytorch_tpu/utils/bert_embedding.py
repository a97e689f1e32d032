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


def load_vec_table(vec_file: str, tokenizer) -> np.ndarray:
    """fasttext/word2vec text ``.vec`` -> the plugin's (vocab, dim) table.

    Parity with the reference plugin's fasttext path (SURVEY.md 2.18: the
    embedding regularizer consumes fasttext OR BERT embeddings): the text
    format is one ``word v1 .. vdim`` row per line, with an optional
    ``count dim`` header line. Rows are aligned to the tokenizer's vocab
    order; a piece is looked up verbatim, then lowercased, then with a
    leading sentencepiece word marker (U+2581) stripped. Pieces absent
    from the file (reserved ids 0-2 always are) get zero rows — the
    plugin normalizes with a 1e-8 floor, so their cosine target is simply
    uninformative rather than NaN.
    """
    vecs = {}
    dim = None
    with open(vec_file, "r", encoding="utf-8") as f:
        for ln_no, ln in enumerate(f):
            parts = ln.rstrip("\n").split(" ")
            if ln_no == 0 and len(parts) == 2:
                continue  # "count dim" header
            if len(parts) < 2:
                continue
            word, vals = parts[0], parts[1:]
            if vals and vals[-1] == "":  # fasttext writes a trailing space
                vals = vals[:-1]
            if dim is None:
                dim = len(vals)
            elif len(vals) != dim:
                raise ValueError(
                    f"{vec_file}:{ln_no + 1}: row has {len(vals)} dims, "
                    f"expected {dim}")
            vecs[word] = np.asarray(vals, np.float32)
    if dim is None:
        raise ValueError(f"{vec_file}: no embedding rows found")
    table = np.zeros((tokenizer.vocab_size, dim), np.float32)
    hit = 0
    for i in range(3, tokenizer.vocab_size):
        piece = tokenizer._id_to_piece(i)
        row = vecs.get(piece)
        if row is None:
            row = vecs.get(piece.lower())
        if row is None and piece.startswith("▁") and len(piece) > 1:
            # stripped word marker: retry case-sensitively AND lowercased
            # ('▁The' must still hit a lowercase fasttext file's 'the')
            row = vecs.get(piece[1:])
            if row is None:
                row = vecs.get(piece[1:].lower())
        if row is not None:
            table[i] = row
            hit += 1
    print(f"[vec_table] {vec_file}: matched {hit}/{tokenizer.vocab_size - 3} "
          f"vocab pieces (dim {dim})")
    return table


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
