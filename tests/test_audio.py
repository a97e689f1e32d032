"""Golden tests for the audio front-end vs a torch.stft-based oracle.

torchaudio is not installed in this image, but torchaudio.MelSpectrogram is a
thin composition of torch.stft (center=True, reflect pad, periodic Hann,
power=2) with a melscale_fbanks matmul — so we rebuild that composition with
torch (CPU) and require fp32-level agreement, per the BASELINE.json
requirement of matching reference fbank features within fp32 tolerance.
"""
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops.audio import (
    AudioFrontend,
    create_transform,
    melscale_fbanks,
    delta_filter,
    LOG_EPS,
)

SR = 16000


def _wav(batch=2, seconds=0.5, seed=0):
    rng = np.random.RandomState(seed)
    n = int(SR * seconds)
    return rng.randn(batch, n).astype(np.float32) * 0.1


def torch_power_spec(wav_np, n_fft=400, hop=160):
    wav = torch.from_numpy(wav_np)
    win = torch.hann_window(n_fft, periodic=True)
    spec = torch.stft(wav, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                      window=win, center=True, pad_mode="reflect",
                      return_complex=True, normalized=False, onesided=True)
    return (spec.abs() ** 2).transpose(1, 2).numpy()  # (B, T, n_bins)


def test_power_spectrogram_matches_torch_stft():
    wav = _wav()
    fe = AudioFrontend({"feat_type": "linear", "delta_order": 0, "cmvn": False})
    ref = torch_power_spec(wav)
    frames = fe._frame(wav)
    got = np.asarray(fe._power_spec(frames))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fbank_matches_torch_composition():
    wav = _wav()
    fe, dim = create_transform(
        {"feat_type": "fbank", "feat_dim": 40, "delta_order": 0, "cmvn": False})
    assert dim == 40
    spec = torch_power_spec(wav)  # (B, T, 201)
    mel_fb = melscale_fbanks(201, 40, SR)  # (201, 40)
    ref = np.log(spec @ mel_fb + LOG_EPS)
    wave_len = np.full((wav.shape[0],), wav.shape[1], np.int32)
    got, feat_len = fe(wav, wave_len)
    got = np.asarray(got)
    assert got.shape == ref.shape
    assert int(feat_len[0]) == ref.shape[1]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_deltas_match_torchaudio_convention():
    # torchaudio compute_deltas: conv1d with regression filter, replicate pad
    wav = _wav(batch=1)
    fe, dim = create_transform(
        {"feat_type": "fbank", "feat_dim": 13, "delta_order": 2,
         "delta_window_size": 2, "cmvn": False})
    assert dim == 13 * 3
    wave_len = np.full((1,), wav.shape[1], np.int32)
    got, _ = fe(wav, wave_len)
    got = np.asarray(got)
    base = got[..., :13]

    kern = torch.tensor(delta_filter(2))[None, None, :].repeat(13, 1, 1)
    x = torch.from_numpy(base).transpose(1, 2)  # (B, D, T)
    xp = torch.nn.functional.pad(x, (2, 2), mode="replicate")
    ref_d1 = torch.nn.functional.conv1d(xp, kern, groups=13).transpose(1, 2).numpy()
    np.testing.assert_allclose(got[..., 13:26], ref_d1, rtol=1e-4, atol=1e-5)


def test_cmvn_zero_mean_unit_var_on_valid_frames():
    wav = _wav(batch=2, seconds=1.0)
    fe, dim = create_transform({"feat_type": "fbank", "feat_dim": 40, "cmvn": True})
    wave_len = np.array([wav.shape[1], wav.shape[1] // 2], np.int32)
    feat, feat_len = fe(wav, wave_len)
    feat, feat_len = np.asarray(feat), np.asarray(feat_len)
    for b in range(2):
        valid = feat[b, : feat_len[b]]
        np.testing.assert_allclose(valid.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(valid.var(0), 1.0, atol=1e-2)
    # padded frames zeroed
    assert np.all(feat[1, feat_len[1]:] == 0.0)


def test_mfcc_shapes_and_finite():
    wav = _wav()
    fe, dim = create_transform(
        {"feat_type": "mfcc", "feat_dim": 13, "n_mels": 40, "delta_order": 1,
         "cmvn": True})
    assert dim == 26
    feat, feat_len = fe(wav, np.full((2,), wav.shape[1], np.int32))
    assert feat.shape[-1] == 26
    assert np.isfinite(np.asarray(feat)).all()


def test_frontend_is_jittable():
    import jax
    wav = _wav()
    fe, _ = create_transform({"feat_type": "fbank", "feat_dim": 40, "delta_order": 1})
    wave_len = np.full((2,), wav.shape[1], np.int32)
    jitted = jax.jit(fe.__call__)
    a, al = jitted(wav, wave_len)
    b, bl = fe(wav, wave_len)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_frontend_degenerate_short_waveform():
    """Sub-window clips (< n_fft/2 samples) must produce finite features
    instead of crashing the reflect pad (torch.stft errors on these; the
    framework zero-extends — documented divergence for degenerate input)."""
    import jax.numpy as jnp
    fe = AudioFrontend({"feat_type": "fbank", "feat_dim": 40})
    wave = jnp.zeros((2, 150), jnp.float32)  # < n_fft//2+1 = 201 samples
    feat, flen = fe(wave, jnp.array([150, 80], jnp.int32))
    assert np.isfinite(np.asarray(feat)).all()
    assert feat.shape[0] == 2
