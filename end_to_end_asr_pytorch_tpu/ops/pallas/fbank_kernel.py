"""Fused log-mel filterbank Pallas kernel.

The BASELINE.json north star names this explicitly: the torchaudio
front-end (framing, STFT, mel projection, log) as ONE fused kernel streaming
raw audio from HBM. The jnp reference implementation (ops/audio.py) first
materializes the (B, T, n_fft) frame tensor in HBM (2.5x the audio bytes,
read back immediately); here frames are built INSIDE VMEM from an 80-sample
subchunk view of the waveform, fed straight to the windowed-DFT matmuls on
the MXU, the mel projection, and the log — one HBM read of the audio, one
HBM write of the (T, n_mels) features.

Framing trick: with hop=160 and n_fft=400 (16 kHz, 25ms/10ms), both are
multiples of 80, so the padded waveform reshaped to (n_sub, 80) subchunks
gives frame i as subchunk rows [2i, 2i+5) — each kernel tile DMAs a
contiguous row range and assembles frames with static slices/reshapes (a
stride-2 row view), no gathers.

Constraint: frame_shift and frame_length in samples must share the divisor
80 (true for the reference's 25/10 ms @ 16 kHz defaults); other geometries
fall back to the jnp path in ops/audio.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 80          # subchunk width shared by hop (160) and n_fft (400)
LANE = 128        # TPU lane width: subchunk rows stored padded to 128
TILE_T = 128      # frames per kernel tile


def _kernel(wave_hbm, cosw_ref, msinw_ref, mel_ref, out_ref, sub_scratch,
            sem, *, n_fft: int, hop: int, log_eps: float):
    b = pl.program_id(0)
    tt = pl.program_id(1)
    sub_per_hop = hop // SUB                    # 2
    sub_per_frame = n_fft // SUB                # 5
    n_rows = TILE_T * sub_per_hop + sub_per_frame - sub_per_hop
    row0 = tt * TILE_T * sub_per_hop

    dma = pltpu.make_async_copy(
        wave_hbm.at[b, pl.ds(row0, n_rows)], sub_scratch.at[pl.ds(0, n_rows)],
        sem)
    dma.start()
    dma.wait()

    sub = sub_scratch[...][:, :SUB]             # (n_rows_pad, SUB)
    parts = []
    for j in range(sub_per_frame):
        block = jax.lax.slice_in_dim(sub, j, j + TILE_T * sub_per_hop, axis=0)
        view = block.reshape(TILE_T, sub_per_hop, SUB)[:, 0, :]
        parts.append(view)
    frames = jnp.concatenate(parts, axis=1)     # (TILE_T, n_fft)

    # full-f32 MXU passes: features must match the reference within fp32
    # tolerance (BASELINE.json), and this kernel is bandwidth- not
    # compute-bound, so the extra passes are free
    re = jnp.dot(frames, cosw_ref[...], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(frames, msinw_ref[...], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im                   # (TILE_T, n_bins)
    mel = jnp.dot(power, mel_ref[...], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0, :, :] = jnp.log(mel + log_eps)


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop", "log_eps", "interpret"))
def fbank_fused(wave: jnp.ndarray, cosw: jnp.ndarray, msinw: jnp.ndarray,
                mel_fb: jnp.ndarray, *, n_fft: int = 400, hop: int = 160,
                log_eps: float = 1e-10, interpret: bool = False
                ) -> jnp.ndarray:
    """wave (B, S) raw audio -> (B, T, n_mels) log-mel, T = S//hop + 1.

    cosw/msinw are the window-premultiplied DFT matrices (n_fft, n_bins);
    mel_fb (n_bins, n_mels). Applies torch-style center reflect padding.
    """
    assert hop % SUB == 0 and n_fft % SUB == 0, "use the jnp fallback"
    B, S = wave.shape
    T = S // hop + 1
    T_pad = ((T + TILE_T - 1) // TILE_T) * TILE_T
    n_bins, n_mels = mel_fb.shape

    pad = n_fft // 2
    wave_p = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    # room for the last tile's frames, rounded up to a whole number of
    # SUB-sample subchunks: for waveform lengths where S + n_fft already
    # covers `need` but is not SUB-aligned, the reshape below would
    # otherwise fail (the extra tail samples are never read — frame DMAs
    # stop at T_pad)
    need = (T_pad - 1) * hop + n_fft
    target = max(need, wave_p.shape[1])
    target = ((target + SUB - 1) // SUB) * SUB
    wave_p = jnp.pad(wave_p, ((0, 0), (0, target - wave_p.shape[1])))
    n_sub = wave_p.shape[1] // SUB
    # subchunk rows padded 80 -> 128 lanes (DMA slices must be lane-aligned);
    # costs one cheap XLA pad of the small waveform, still avoids ever
    # materializing the 2.5x (B, T, n_fft) frame tensor in HBM
    wave_sub = jnp.pad(wave_p.reshape(B, n_sub, SUB),
                       ((0, 0), (0, 0), (0, LANE - SUB)))

    sub_per_hop = hop // SUB
    sub_per_frame = n_fft // SUB
    n_rows = TILE_T * sub_per_hop + sub_per_frame - sub_per_hop
    n_rows_pad = ((n_rows + 7) // 8) * 8

    out = pl.pallas_call(
        functools.partial(_kernel, n_fft=n_fft, hop=hop, log_eps=log_eps),
        grid=(B, T_pad // TILE_T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # full waveform, stays HBM
            pl.BlockSpec((n_fft, n_bins), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, n_mels), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_rows_pad, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(wave_sub, cosw, msinw, mel_fb)
    return out[:, :T]
