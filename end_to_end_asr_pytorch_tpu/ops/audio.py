"""Audio feature front-end: framing, STFT, mel projection, deltas, CMVN.

Capability parity with the reference's ``src/audio.py`` (SURVEY.md 2.12):
``create_transform(audio_cfg) -> (frontend, feat_dim)`` supporting
``feat_type: fbank|mfcc|linear``, ``frame_length``/``frame_shift`` in ms,
``delta_order``/``delta_window_size``, and per-utterance ``cmvn``.

TPU-first design notes (not a port):
  * The reference runs torchaudio on CPU inside DataLoader workers; here the
    whole front-end is a pure jax function over *batched* waveforms that jits
    onto the TPU and fuses into the training step, so raw int16-scale audio is
    what crosses the host->device boundary (~60x smaller than f32 features
    with deltas).
  * The DFT is a matmul against fixed cos/sin matrices rather than an FFT:
    n_fft is small (400), the MXU eats a (B*T, n_fft) x (n_fft, 2*n_bins)
    matmul, and it fuses with the downstream mel matmul.
  * Conventions pinned to torchaudio.MelSpectrogram defaults so reference
    features match within fp32 tolerance: periodic Hann window, center=True
    reflect padding, power=2.0, HTK mel scale, no filterbank norm
    (torchaudio melscale_fbanks(norm=None, mel_scale='htk')).

A fused Pallas kernel for this pipeline lives in ops/pallas/fbank_kernel.py;
this module is the reference implementation it is tested against.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

LOG_EPS = 1e-10  # matches torch.log(mel + 1e-10) style flooring


def hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def melscale_fbanks(n_freqs: int, n_mels: int, sample_rate: int,
                    f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """Triangular mel filterbank, HTK scale, no normalization — the
    torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk') matrix.
    Returns (n_freqs, n_mels) float32."""
    f_max = f_max or sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]                  # rising edge
    up = slopes[:, 2:] / f_diff[1:]                       # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def dft_matrices(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-input DFT as two matmuls: returns cos (n_fft, n_bins) and
    -sin (n_fft, n_bins) with n_bins = n_fft//2 + 1."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def dct_matrix(n_mels: int, n_mfcc: int) -> np.ndarray:
    """DCT-II with ortho norm, (n_mels, n_mfcc) — torchaudio create_dct."""
    n = np.arange(n_mels)[:, None]
    k = np.arange(n_mfcc)[None, :]
    m = np.cos(np.pi / n_mels * (n + 0.5) * k) * np.sqrt(2.0 / n_mels)
    m[:, 0] = 1.0 / np.sqrt(n_mels)
    return m.astype(np.float32)


def delta_filter(window_size: int) -> np.ndarray:
    """Regression delta filter of half-width ``window_size`` (torchaudio
    compute_deltas with win_length = 2*window_size+1)."""
    n = window_size
    denom = 2.0 * sum(i * i for i in range(1, n + 1))
    return (np.arange(-n, n + 1, dtype=np.float32) / denom)


class AudioFrontend:
    """Pure-jax batched feature extractor.

    __call__(waveform (B, S) float32, wave_len (B,) int32)
        -> (features (B, T, D) float32, feat_len (B,) int32)
    All shapes static; padded samples produce padded frames that are masked
    by feat_len downstream.
    """

    def __init__(self, audio_cfg: Dict[str, Any]):
        self.cfg = dict(audio_cfg)
        self.feat_type = audio_cfg.get("feat_type", "fbank")
        self.num_feat = int(audio_cfg.get("feat_dim", 40))
        sr = int(audio_cfg.get("sample_rate", 16000))
        frame_ms = float(audio_cfg.get("frame_length", 25))
        shift_ms = float(audio_cfg.get("frame_shift", 10))
        self.sample_rate = sr
        self.n_fft = int(sr * frame_ms / 1000)
        self.hop = int(sr * shift_ms / 1000)
        self.n_bins = self.n_fft // 2 + 1
        self.delta_order = int(audio_cfg.get("delta_order", 0))
        self.delta_window = int(audio_cfg.get("delta_window_size", 2))
        self.apply_cmvn = bool(audio_cfg.get("cmvn", True))

        # periodic Hann (torch.hann_window default)
        n = np.arange(self.n_fft)
        window = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / self.n_fft)).astype(np.float32)
        cos_m, msin_m = dft_matrices(self.n_fft)
        self._cos = jnp.asarray(cos_m * window[:, None])
        self._msin = jnp.asarray(msin_m * window[:, None])

        if self.feat_type in ("fbank", "mfcc"):
            n_mels = self.num_feat if self.feat_type == "fbank" else int(
                audio_cfg.get("n_mels", max(self.num_feat, 40)))
            self._mel = jnp.asarray(melscale_fbanks(self.n_bins, n_mels, sr))
            self._n_mels = n_mels
        if self.feat_type == "mfcc":
            self._dct = jnp.asarray(dct_matrix(self._n_mels, self.num_feat))
        if self.feat_type == "linear":
            self.num_feat = self.n_bins

        self.feat_dim = self.num_feat * (1 + self.delta_order)
        self._dfilt = jnp.asarray(delta_filter(self.delta_window))

        # fused Pallas fast path (TPU, fbank, 80-divisible geometry)
        use_pallas = audio_cfg.get("use_pallas", "auto")
        if use_pallas == "auto":
            use_pallas = (self.feat_type == "fbank"
                          and self.n_fft % 80 == 0 and self.hop % 80 == 0
                          and jax.default_backend() not in ("cpu",))
        self.use_pallas = bool(use_pallas)

    # -- shape helpers (host side, static) --------------------------------
    def num_frames(self, num_samples: int) -> int:
        """Frame count with center=True padding: floor(S/hop) + 1."""
        return num_samples // self.hop + 1

    # -- jax ops ----------------------------------------------------------
    def _frame(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, S) -> (B, T, n_fft) with center reflect padding."""
        pad = self.n_fft // 2
        if wav.shape[1] <= pad:
            # reflect padding needs S > pad (torch.stft errors here too);
            # zero-extend degenerate sub-window clips instead of crashing —
            # only reachable for < n_fft/2 samples (~12.5 ms at 16 kHz)
            wav = jnp.pad(wav, ((0, 0), (0, pad + 1 - wav.shape[1])))
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        B, S = wav.shape
        T = (S - self.n_fft) // self.hop + 1
        idx = (jnp.arange(T)[:, None] * self.hop + jnp.arange(self.n_fft)[None, :])
        return wav[:, idx]

    def _power_spec(self, frames: jnp.ndarray) -> jnp.ndarray:
        re = jnp.einsum("btn,nk->btk", frames, self._cos,
                        preferred_element_type=jnp.float32, precision="highest")
        im = jnp.einsum("btn,nk->btk", frames, self._msin,
                        preferred_element_type=jnp.float32, precision="highest")
        return re * re + im * im

    def _deltas(self, feat: jnp.ndarray) -> jnp.ndarray:
        """(B, T, D) -> concat[feat, delta, delta2...] along D (replicate pad
        in time, as torchaudio compute_deltas)."""
        outs = [feat]
        cur = feat
        w = self.delta_window
        for _ in range(self.delta_order):
            padded = jnp.pad(cur, ((0, 0), (w, w), (0, 0)), mode="edge")
            # conv over time as weighted sum of shifted slices (small window)
            T = feat.shape[1]
            cur = sum(self._dfilt[j] * jax.lax.dynamic_slice_in_dim(padded, j, T, axis=1)
                      for j in range(2 * w + 1))
            outs.append(cur)
        return jnp.concatenate(outs, axis=-1)

    def _cmvn(self, feat: jnp.ndarray, feat_len: jnp.ndarray) -> jnp.ndarray:
        """Per-utterance mean/var over valid frames only."""
        T = feat.shape[1]
        mask = (jnp.arange(T)[None, :] < feat_len[:, None])[..., None]
        cnt = jnp.maximum(feat_len, 1)[:, None, None].astype(feat.dtype)
        mean = jnp.sum(feat * mask, axis=1, keepdims=True) / cnt
        var = jnp.sum((feat - mean) ** 2 * mask, axis=1, keepdims=True) / cnt
        return jnp.where(mask, (feat - mean) * jax.lax.rsqrt(var + 1e-10), 0.0)

    def __call__(self, waveform: jnp.ndarray, wave_len: jnp.ndarray):
        if waveform.dtype == jnp.int16:
            # int16 wire format (data/dataset.py packs PCM16-exact batches as
            # int16 to halve host->device transfer); dequantize on device.
            # i/32768 with |i| <= 32768 is exact in float32, so this
            # reproduces the float path bit-for-bit for PCM16 sources.
            waveform = waveform.astype(jnp.float32) * (1.0 / 32768.0)
        if self.use_pallas and self.feat_type == "fbank":
            from .pallas.fbank_kernel import fbank_fused
            feat = fbank_fused(waveform, self._cos, self._msin, self._mel,
                               n_fft=self.n_fft, hop=self.hop,
                               log_eps=LOG_EPS)
            return self._postprocess(feat, waveform, wave_len)
        frames = self._frame(waveform)
        spec = self._power_spec(frames)
        if self.feat_type == "fbank":
            feat = jnp.log(jnp.einsum(
                "btk,km->btm", spec, self._mel,
                preferred_element_type=jnp.float32, precision="highest") + LOG_EPS)
        elif self.feat_type == "mfcc":
            logmel = jnp.log(jnp.einsum(
                "btk,km->btm", spec, self._mel,
                preferred_element_type=jnp.float32, precision="highest") + LOG_EPS)
            feat = jnp.einsum("btm,mc->btc", logmel, self._dct,
                              preferred_element_type=jnp.float32, precision="highest")
        elif self.feat_type == "linear":
            feat = jnp.log(spec + LOG_EPS)
        else:
            raise NotImplementedError(self.feat_type)
        return self._postprocess(feat, waveform, wave_len)

    def _postprocess(self, feat, waveform, wave_len):
        """Shared tail: lengths, deltas, CMVN / pad-zeroing."""
        feat_len = (wave_len // self.hop + 1).astype(jnp.int32)
        T = feat.shape[1]
        feat_len = jnp.minimum(feat_len, T)
        if self.delta_order > 0:
            feat = self._deltas(feat)
        if self.apply_cmvn:
            feat = self._cmvn(feat, feat_len)
        else:
            mask = (jnp.arange(T)[None, :] < feat_len[:, None])[..., None]
            feat = jnp.where(mask, feat, 0.0)
        return feat, feat_len


def create_transform(audio_cfg: Dict[str, Any]) -> Tuple[AudioFrontend, int]:
    """Mirror of reference ``src/audio.py:create_transform`` — returns the
    feature pipeline and its output feature dimension."""
    fe = AudioFrontend(audio_cfg)
    return fe, fe.feat_dim
