"""Dataset loading and static-shape batching.

Capability parity with the reference's ``src/data.py`` (SURVEY.md 2.10):
``load_dataset(...) -> (tr_set, dv_set, feat_dim, vocab_size, tokenizer, msg)``
and ``load_textset(...)`` for LM training, with length-sorted bucketing and
ascending-order curriculum support.

TPU-first differences from the reference's DataLoader design:
  * Batches carry RAW waveforms (padded) — feature extraction happens on
    device inside the jitted step (ops/audio.py), not in CPU worker processes.
  * Every batch is padded to one of a SMALL set of canonical shapes: frame
    counts are rounded up to a multiple of ``frame_quantum`` (default 64
    frames = 0.64 s) and label lengths to ``text_quantum``, bounding XLA
    recompilation (SURVEY.md section 5 long-context row). ``frame_quantum``
    must be a multiple of the encoder's total time-downsample factor.
  * Bucketing = sort by length, chunk into batches of near-equal length, then
    shuffle batch ORDER per epoch (reference sorts within buckets too).
"""
from __future__ import annotations

import itertools
from collections import OrderedDict
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

DEFAULT_CACHE_BYTES = 2 << 30  # 2 GiB of decoded f32 waveforms


class LRUWaveCache:
    """Byte-budget LRU for decoded waveforms.

    An unbounded cache OOMs by design at LibriSpeech-960 scale (~100 GB of
    f32); this keeps the hot set (small-corpus runs still get 100% hits)
    while bounding host memory. Items larger than the whole budget are never
    cached.
    """

    def __init__(self, max_bytes: int):
        import threading
        self.max_bytes = int(max_bytes)
        self._items: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self.nbytes = 0
        # the loader's n_jobs>1 assembly pool hits the cache concurrently;
        # the recency/eviction bookkeeping is a multi-op sequence that the
        # GIL alone does not make atomic
        self._lock = threading.Lock()

    def get(self, key: int) -> Optional[np.ndarray]:
        with self._lock:
            w = self._items.get(key)
            if w is not None:
                self._items.move_to_end(key)
            return w

    def put(self, key: int, wave: np.ndarray) -> None:
        nb = wave.nbytes
        with self._lock:
            if nb > self.max_bytes or key in self._items:
                return
            while self.nbytes + nb > self.max_bytes and self._items:
                _, old = self._items.popitem(last=False)
                self.nbytes -= old.nbytes
            self._items[key] = wave
            self.nbytes += nb

    def __len__(self):
        return len(self._items)

from .librispeech import LibriDataset
from ..ops.audio import create_transform
from ..utils.text import load_text_encoder

HOP = 160  # 10 ms at 16 kHz; kept in sync with ops/audio defaults


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class AudioBatchLoader:
    """Iterable over fixed-shape numpy batches of (wave, wave_len, text,
    text_len, names)."""

    def __init__(self, dataset: LibriDataset, batch_size: int,
                 frame_quantum: int = 64, text_quantum: int = 16,
                 shuffle: bool = True, ascending: bool = False,
                 seed: int = 0, cache_waves: bool = True, n_jobs: int = 0,
                 bucketing: bool = True,
                 cache_bytes: int = DEFAULT_CACHE_BYTES):
        self.ds = dataset
        self.batch_size = batch_size
        self.n_jobs = n_jobs
        self.frame_quantum = frame_quantum
        self.text_quantum = text_quantum
        self.shuffle = shuffle and not ascending
        self.ascending = ascending
        self.rng = np.random.RandomState(seed)
        self._wave_cache: Optional[LRUWaveCache] = (
            LRUWaveCache(cache_bytes) if cache_waves and cache_bytes > 0
            else None)
        n = len(dataset)
        idx = list(range(n))  # dataset is pre-sorted ascending by size
        if not bucketing:
            # reference semantics: random batch composition instead of
            # near-equal-length buckets (more padding, less length bias)
            self.rng.shuffle(idx)
        self.batches = [idx[i:i + batch_size] for i in range(0, n, batch_size)]

    def __len__(self):
        return len(self.batches)

    @staticmethod
    def _pack_i16(w: np.ndarray) -> np.ndarray:
        """Store PCM16-exact waveforms as int16: halves the wave cache AND
        the per-batch host->device transfer (the CLI train loop's dominant
        cost on slow links); ops/audio dequantizes on device bit-exactly
        (i/32768 is exact in f32). Non-PCM16 sources stay float32."""
        if w.dtype == np.int16:
            return w
        s = w.astype(np.float64) * 32768.0
        if (s.size and -32768.0 <= s.min() and s.max() <= 32767.0
                and np.array_equal(s, np.rint(s))):
            return s.astype(np.int16)
        return w

    def _wave(self, i: int) -> np.ndarray:
        if self._wave_cache is not None:
            w = self._wave_cache.get(i)
            if w is None:
                w = self._pack_i16(self.ds.load_wave(i))
                self._wave_cache.put(i, w)
            return w
        return self._pack_i16(self.ds.load_wave(i))

    def _pad_samples(self, s_max: int) -> int:
        t_needed = s_max // HOP + 1
        t_pad = _round_up(t_needed, self.frame_quantum)
        s_pad = (t_pad - 1) * HOP
        if s_pad < s_max:
            t_pad += self.frame_quantum
            s_pad = (t_pad - 1) * HOP
        return s_pad

    def make_batch(self, ids: List[int]) -> Dict[str, Any]:
        waves = [self._wave(i) for i in ids]
        texts = [self.ds.text_ids(i) for i in ids]
        s_pad = self._pad_samples(max(len(w) for w in waves))
        u_pad = _round_up(max(len(t) for t in texts), self.text_quantum)
        B = len(ids)
        # int16 wire format when every row is PCM16-exact (see _pack_i16)
        wave_dtype = (np.int16 if all(w.dtype == np.int16 for w in waves)
                      else np.float32)
        if wave_dtype == np.float32:
            waves = [w.astype(np.float32) / 32768.0
                     if w.dtype == np.int16 else w for w in waves]
        wave = np.zeros((B, s_pad), wave_dtype)
        wave_len = np.zeros((B,), np.int32)
        text = np.zeros((B, u_pad), np.int32)
        text_len = np.zeros((B,), np.int32)
        for b, (w, t) in enumerate(zip(waves, texts)):
            wave[b, :len(w)] = w
            wave_len[b] = len(w)
            text[b, :len(t)] = t
            text_len[b] = len(t)
        return {
            "wave": wave, "wave_len": wave_len,
            "text": text, "text_len": text_len,
            "name": [self.ds.utt_id(i) for i in ids],
            "text_raw": [self.ds.text_raw(i) for i in ids],
        }

    def epoch_iter(self, shuffle: Optional[bool] = None
                   ) -> Iterator[Dict[str, Any]]:
        """One epoch; shuffle=False yields length-ascending order (curriculum,
        reference SURVEY.md 2.4). With n_jobs > 0, batches are assembled by a
        pool of n_jobs threads so audio decode overlaps device compute AND
        scales across host cores (the native FLAC decoder releases the GIL) —
        the TPU analog of the reference's DataLoader worker processes.

        Windowed in-order delivery over a ThreadPoolExecutor: up to
        2*n_jobs batches are in flight; .result() propagates worker
        exceptions; abandoning the epoch early (the max_step break) closes
        the generator, which cancels pending work and shuts the pool down —
        the same cancellation contract prefetch_to_device keeps for its
        device-transfer thread."""
        order = list(range(len(self.batches)))
        if self.shuffle if shuffle is None else shuffle:
            self.rng.shuffle(order)
        if self.n_jobs <= 0:
            for bi in order:
                yield self.make_batch(self.batches[bi])
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        window = max(2, 2 * self.n_jobs)
        ex = ThreadPoolExecutor(max_workers=self.n_jobs)
        futs: "deque" = deque()
        it = iter(order)
        try:
            for bi in itertools.islice(it, window):
                futs.append(ex.submit(self.make_batch, self.batches[bi]))
            while futs:
                item = futs.popleft().result()  # raises worker exceptions
                nxt = next(it, None)
                if nxt is not None:
                    futs.append(ex.submit(self.make_batch,
                                          self.batches[nxt]))
                yield item
        finally:
            while futs:
                futs.popleft().cancel()
            ex.shutdown(wait=False, cancel_futures=True)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        return self.epoch_iter()


class TextBatchLoader:
    """LM batches: (text, text_len) only."""

    def __init__(self, dataset: LibriDataset, batch_size: int,
                 text_quantum: int = 16, shuffle: bool = True, seed: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        self.text_quantum = text_quantum
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        idx = sorted(range(len(dataset)), key=lambda i: len(dataset.text_ids(i)))
        self.batches = [idx[i:i + batch_size]
                        for i in range(0, len(idx), batch_size)]

    def __len__(self):
        return len(self.batches)

    def make_batch(self, ids: List[int]) -> Dict[str, Any]:
        texts = [self.ds.text_ids(i) for i in ids]
        u_pad = _round_up(max(len(t) for t in texts), self.text_quantum)
        B = len(ids)
        text = np.zeros((B, u_pad), np.int32)
        text_len = np.zeros((B,), np.int32)
        for b, t in enumerate(texts):
            text[b, :len(t)] = t
            text_len[b] = len(t)
        return {"text": text, "text_len": text_len}

    def __iter__(self):
        order = list(range(len(self.batches)))
        if self.shuffle:
            self.rng.shuffle(order)
        for bi in order:
            yield self.make_batch(self.batches[bi])


def _make_corpus(corpus_cfg: Dict[str, Any], splits, tokenizer) -> LibriDataset:
    name = corpus_cfg.get("name", "librispeech").lower()
    if name in ("librispeech", "synthetic"):  # synthetic uses libri layout
        return LibriDataset(corpus_cfg["path"], splits, tokenizer)
    raise NotImplementedError(f"corpus {name!r}")


def load_dataset(n_jobs: int, use_gpu: bool, pin_memory: bool,
                 ascending: bool, corpus: Dict[str, Any],
                 audio: Dict[str, Any], text: Dict[str, Any],
                 mode: str = "train", frame_quantum: int = 64):
    """Mirror of reference ``src/data.py:load_dataset`` (SURVEY.md 2.10).

    mode='train': returns (tr_set, dv_set, feat_dim, vocab_size, tokenizer, msg)
    mode='test' : tr_set is the dev split, dv_set is the test split, batch=1
                  semantics are NOT forced — on-device decode is batched.
    """
    tokenizer = load_text_encoder(text["mode"], text["vocab_file"])
    _, feat_dim = create_transform(audio)
    bs = int(corpus.get("batch_size", 8))
    bucketing = bool(corpus.get("bucketing", True))
    # corpus.cache_bytes: byte budget for the decoded-waveform LRU
    # (0 disables; default 2 GiB)
    cache_bytes = int(corpus.get("cache_bytes", DEFAULT_CACHE_BYTES))
    if mode == "train":
        tr_ds = _make_corpus(corpus, corpus["train_split"], tokenizer)
        dv_ds = _make_corpus(corpus, corpus["dev_split"], tokenizer)
        tr_set = AudioBatchLoader(tr_ds, bs, frame_quantum=frame_quantum,
                                  shuffle=not ascending, ascending=ascending,
                                  n_jobs=n_jobs, bucketing=bucketing,
                                  cache_bytes=cache_bytes)
        dv_set = AudioBatchLoader(dv_ds, bs, frame_quantum=frame_quantum,
                                  shuffle=False, cache_bytes=cache_bytes)
    else:
        dv_ds = _make_corpus(corpus, corpus["dev_split"], tokenizer)
        tt_ds = _make_corpus(corpus, corpus.get("test_split", corpus["dev_split"]),
                             tokenizer)
        tr_set = AudioBatchLoader(dv_ds, bs, frame_quantum=frame_quantum,
                                  shuffle=False, cache_bytes=cache_bytes)
        dv_set = AudioBatchLoader(tt_ds, bs, frame_quantum=frame_quantum,
                                  shuffle=False, cache_bytes=cache_bytes)
    a_name, b_name = ("train", "dev") if mode == "train" else ("dev", "test")
    msg = [
        f"I/O spec  | audio feat = {audio.get('feat_type', 'fbank')} "
        f"(dim {feat_dim}) | tokenizer = {text['mode']} "
        f"(vocab {tokenizer.vocab_size})",
        f"Corpus    | {corpus.get('name')} at {corpus['path']} | "
        f"{a_name} {len(tr_set.ds)} utts / {b_name} {len(dv_set.ds)} utts | "
        f"batch {bs}",
    ]
    return tr_set, dv_set, feat_dim, tokenizer.vocab_size, tokenizer, msg


class TextLineDataset:
    """Text-only sentences (one per line) with the ``text_ids``/``text_raw``
    API TextBatchLoader needs — LM training on corpora larger than the
    paired audio (a split entry ending in ``.txt`` selects this; e.g. the
    synthetic generator's ``lm_text.txt``)."""

    def __init__(self, path: str, files, tokenizer):
        self.tokenizer = tokenizer
        lines: List[str] = []
        for f in files:
            fp = Path(path) / f
            lines += [ln.strip().lower()
                      for ln in fp.read_text().splitlines() if ln.strip()]
        if not lines:
            raise RuntimeError(f"no text lines under {path} {list(files)}")
        self._raw = lines
        self._ids = [tokenizer.encode(ln) for ln in lines]

    def __len__(self):
        return len(self._ids)

    def text_ids(self, i: int) -> List[int]:
        return self._ids[i]

    def text_raw(self, i: int) -> str:
        return self._raw[i]


def _make_textset(corpus_cfg: Dict[str, Any], splits, tokenizer):
    if isinstance(splits, str):
        splits = [splits]
    n_txt = sum(str(s).endswith(".txt") for s in splits)
    if n_txt == len(splits):
        return TextLineDataset(corpus_cfg["path"], splits, tokenizer)
    if n_txt:    # reject clearly instead of globbing 'foo.txt' as a corpus
        raise ValueError(
            f"cannot mix text-line files and transcript splits: {splits}")
    return _make_corpus(corpus_cfg, splits, tokenizer)


def load_textset(n_jobs: int, use_gpu: bool, pin_memory: bool,
                 corpus: Dict[str, Any], text: Dict[str, Any]):
    """Mirror of reference ``load_textset`` for LM training (SURVEY.md 2.5).

    Split entries ending in ``.txt`` load as plain text-line files
    (sentence per line) instead of audio-corpus transcripts."""
    tokenizer = load_text_encoder(text["mode"], text["vocab_file"])
    bs = int(corpus.get("batch_size", 32))
    tr_ds = _make_textset(corpus, corpus["train_split"], tokenizer)
    dv_ds = _make_textset(corpus, corpus["dev_split"], tokenizer)
    tr_set = TextBatchLoader(tr_ds, bs)
    dv_set = TextBatchLoader(dv_ds, bs, shuffle=False)
    msg = [f"LM corpus | train {len(tr_ds)} / dev {len(dv_ds)} sentences | "
           f"vocab {tokenizer.vocab_size}"]
    return tr_set, dv_set, tokenizer.vocab_size, tokenizer, msg
