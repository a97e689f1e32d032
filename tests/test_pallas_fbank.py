"""Fused Pallas fbank kernel vs the jnp reference path (interpret mode on
CPU; the same comparison runs compiled on real TPU in bench/dev loops)."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops.audio import AudioFrontend
from end_to_end_asr_pytorch_tpu.ops.pallas.fbank_kernel import fbank_fused


def test_fbank_fused_matches_reference():
    fe = AudioFrontend({"feat_type": "fbank", "feat_dim": 40, "cmvn": False,
                        "delta_order": 0, "use_pallas": False})
    rng = np.random.RandomState(0)
    S = (192 - 1) * 160  # 192 frames: 1.5 tiles -> exercises tile padding
    wave = jnp.asarray(rng.randn(2, S).astype(np.float32) * 0.1)
    ref, _ = fe(wave, jnp.full((2,), S, jnp.int32))
    got = fbank_fused(wave, fe._cos, fe._msin, fe._mel, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_frontend_auto_flag_off_on_cpu():
    fe = AudioFrontend({"feat_type": "fbank", "feat_dim": 40})
    assert fe.use_pallas is False  # tests run on the CPU backend


def test_fbank_fused_sub_unaligned_length():
    """Regression: waveform lengths where S + n_fft already covers the last
    tile but is not a multiple of the 80-sample subchunk used to crash the
    (B, n_sub, 80) reshape (e.g. S = 20390: T = 128 is TILE_T-aligned so no
    tail pad was added, yet 20790 % 80 = 70). The padded length must round
    up to whole subchunks; features must match the jnp path."""
    fe = AudioFrontend({"feat_type": "fbank", "feat_dim": 40, "cmvn": False,
                        "delta_order": 0, "use_pallas": False})
    rng = np.random.RandomState(1)
    S = 20390
    wave = jnp.asarray(rng.randn(1, S).astype(np.float32) * 0.1)
    ref, _ = fe(wave, jnp.full((1,), S, jnp.int32))
    got = fbank_fused(wave, fe._cos, fe._msin, fe._mel, interpret=True)
    T = S // 160 + 1
    np.testing.assert_allclose(np.asarray(got)[:, :T], np.asarray(ref)[:, :T],
                               rtol=1e-4, atol=1e-4)
