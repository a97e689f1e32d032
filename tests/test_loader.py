"""Batch loader details: thread prefetch equivalence, curriculum ordering."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.data import synthetic
from end_to_end_asr_pytorch_tpu.data.dataset import AudioBatchLoader
from end_to_end_asr_pytorch_tpu.data.librispeech import LibriDataset
from end_to_end_asr_pytorch_tpu.utils.text import load_text_encoder


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    synthetic.generate_corpus(str(root), n_train=10, n_dev=2, n_test=2)
    tok = load_text_encoder("character", str(root / "vocab.txt"))
    return LibriDataset(str(root), ["train-clean"], tok)


def test_prefetch_thread_yields_same_batches(ds):
    a = AudioBatchLoader(ds, 4, shuffle=False, n_jobs=0)
    b = AudioBatchLoader(ds, 4, shuffle=False, n_jobs=2)
    for ba, bb in zip(a.epoch_iter(shuffle=False), b.epoch_iter(shuffle=False)):
        np.testing.assert_array_equal(ba["wave"], bb["wave"])
        np.testing.assert_array_equal(ba["text"], bb["text"])
        assert ba["name"] == bb["name"]


def test_prefetch_thread_abandoned_epoch_stops_worker(ds):
    """A consumer that abandons the epoch early (max_step break) must not
    leave the loader's worker thread blocked forever on q.put: the
    generator's close() sets the cancel event and the thread exits."""
    import threading
    import time

    loader = AudioBatchLoader(ds, 1, shuffle=False, n_jobs=2)
    assert len(loader) >= 4
    before = threading.active_count()
    it = loader.epoch_iter(shuffle=False)
    next(it)            # worker started, queue filling
    it.close()          # abandon mid-epoch -> GeneratorExit -> cancel
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "loader worker thread leaked"


def test_prefetch_thread_propagates_worker_error(ds):
    """An exception inside batch assembly must surface in the consumer, not
    silently truncate the epoch."""
    loader = AudioBatchLoader(ds, 4, shuffle=False, n_jobs=1)
    boom = RuntimeError("decode failed")

    def bad_make_batch(ids):
        raise boom

    loader.make_batch = bad_make_batch
    with pytest.raises(RuntimeError, match="decode failed"):
        list(loader.epoch_iter(shuffle=False))


def test_curriculum_order_is_length_ascending(ds):
    loader = AudioBatchLoader(ds, 4, shuffle=True, seed=1)
    ordered = list(loader.epoch_iter(shuffle=False))
    max_lens = [b["wave_len"].max() for b in ordered]
    assert max_lens == sorted(max_lens)
    # shuffled epoch visits the same batches in some other order (usually)
    shuffled = list(loader.epoch_iter(shuffle=True))
    assert sorted(b["name"][0] for b in shuffled) == \
        sorted(b["name"][0] for b in ordered)


def test_bucketing_off_randomizes_batch_composition(ds):
    on = AudioBatchLoader(ds, 4, shuffle=False, bucketing=True)
    off = AudioBatchLoader(ds, 4, shuffle=False, bucketing=False, seed=3)
    assert on.batches != off.batches
    # same utterances overall
    flat = sorted(i for b in off.batches for i in b)
    assert flat == list(range(len(ds)))


def test_wave_cache_lru_eviction(ds):
    """The waveform cache is byte-bounded LRU: a tiny budget must evict
    least-recently-used entries and never exceed the budget."""
    from end_to_end_asr_pytorch_tpu.data.dataset import LRUWaveCache
    one = ds.load_wave(0).nbytes
    budget = int(one * 2.5)  # fits ~2 of the equal-size synthetic waves
    loader = AudioBatchLoader(ds, 4, shuffle=False, cache_bytes=budget)
    for _ in loader.epoch_iter(shuffle=False):
        assert loader._wave_cache.nbytes <= budget
    assert len(loader._wave_cache) >= 1  # something stayed cached
    # direct LRU semantics
    c = LRUWaveCache(one * 2)
    w = ds.load_wave(0)
    c.put(0, w)
    c.put(1, w)
    c.get(0)           # 0 now most-recent
    c.put(2, w)        # evicts 1, not 0
    assert c.get(0) is not None and c.get(1) is None and c.get(2) is not None
    assert c.nbytes <= one * 2
    # an item larger than the whole budget is never cached
    big = LRUWaveCache(one - 1)
    big.put(0, w)
    assert len(big) == 0


def test_wave_cache_disabled(ds):
    loader = AudioBatchLoader(ds, 4, shuffle=False, cache_bytes=0)
    assert loader._wave_cache is None
    next(iter(loader.epoch_iter(shuffle=False)))


def test_int16_wire_format_is_bit_exact(ds):
    """PCM16 sources ride to the device as int16 (half the transfer); the
    frontend dequant must reproduce the float path bit-for-bit."""
    import jax.numpy as jnp
    from end_to_end_asr_pytorch_tpu.ops.audio import create_transform

    loader = AudioBatchLoader(ds, 4, shuffle=False, n_jobs=0)
    batch = loader.make_batch(loader.batches[0])
    assert batch["wave"].dtype == np.int16  # synthetic corpus is PCM16 wav
    frontend, _ = create_transform(
        {"feat_type": "fbank", "feat_dim": 40, "cmvn": True,
         "use_pallas": False})
    f_i16, l_i16 = frontend(jnp.asarray(batch["wave"]),
                            jnp.asarray(batch["wave_len"]))
    f_f32, l_f32 = frontend(
        jnp.asarray(batch["wave"].astype(np.float32) / 32768.0),
        jnp.asarray(batch["wave_len"]))
    np.testing.assert_array_equal(np.asarray(f_i16), np.asarray(f_f32))
    np.testing.assert_array_equal(np.asarray(l_i16), np.asarray(l_f32))


def test_non_pcm16_waves_stay_float32(tmp_path):
    """A waveform that is not int16-representable must keep the f32 path."""
    from end_to_end_asr_pytorch_tpu.data.dataset import AudioBatchLoader as L
    w = np.array([0.1, -0.25, 0.3333], np.float32)  # 0.1*32768 not integral
    packed = L._pack_i16(w)
    assert packed.dtype == np.float32
    exact = np.array([0.5, -1.0, 0.25], np.float32)  # all k/32768 multiples
    assert L._pack_i16(exact).dtype == np.int16


def test_flac_corpus_end_to_end_train(tmp_path):
    """The LibriSpeech on-disk reality: FLAC files + trans.txt, decoded by
    the native C++ decoder, packed int16, trained for a few steps — the
    full corpus->loader->device->train integration for the reference's
    actual data format (SURVEY.md 2.11)."""
    from tests.flac_encoder import encode_flac
    from end_to_end_asr_pytorch_tpu.data.audio_io import load_audio

    root = tmp_path / "flac_corpus"
    synthetic.generate_corpus(str(root), n_train=8, n_dev=4, n_test=4,
                              max_words=2)
    n_conv = 0
    for wav in root.rglob("*.wav"):
        wave, sr = load_audio(str(wav))
        pcm = np.clip(np.round(wave * 32768.0), -32768, 32767).astype(np.int16)
        wav.with_suffix(".flac").write_bytes(encode_flac(pcm, sr=sr))
        wav.unlink()
        n_conv += 1
    assert n_conv == 16 and not list(root.rglob("*.wav"))

    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver
    from tests.test_e2e_train import _asr_config, _paras
    cfg = _asr_config(root, ctc_weight=1.0, max_step=4)
    cfg["data"]["corpus"]["batch_size"] = 4
    solver = Solver(cfg, _paras(tmp_path, "flac"), "train")
    solver.load_data()
    # FLAC decodes PCM16 -> batches must take the int16 wire format
    b = solver.tr_set.make_batch(solver.tr_set.batches[0])
    assert b["wave"].dtype == np.int16
    solver.set_model()
    solver.exec()
    assert solver.step == 4
