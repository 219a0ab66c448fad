"""Log-mel spectrogram frontend, Whisper-exact, designed MXU-first.

The reference delegates this to the ``mlx_whisper`` package (C++/Metal MLX ops;
see reference ``run:3-6`` and SURVEY.md §2.1): Hann-window STFT (n_fft=400,
hop=160), 80- or 128-band Slaney mel filterbank, ``log10`` + dynamic-range
clamp + ``(x+4)/4`` normalization, padded to 30 s windows.

TPU-native design
-----------------
Instead of an FFT (awkward shapes for the MXU: n_fft=400 is neither a power of
two nor lane-aligned), the STFT is computed as a **GEMM-native discrete Fourier
transform** (cf. MelT, PAPERS.md): the windowed real/imaginary DFT bases are
baked into two ``(n_fft, n_freq)`` matrices so the whole frontend is

    frames(3000, 400) @ Wr/Wi(400, 201)  -> two MXU matmuls
    power = re^2 + im^2                  -> VPU elementwise
    power @ mel_T(201, n_mels)           -> one MXU matmul
    log10 / clamp / scale                -> VPU elementwise

XLA fuses the elementwise tail into the matmuls; a fully fused single-pass
Pallas kernel lives in ``whisper_mlx_tpu.ops.mel_pallas``.

Numerics match ``openai/whisper`` ``audio.py`` (and the transformers
``WhisperFeatureExtractor``) bit-for-fp32: periodic Hann window, reflect
padding of n_fft//2 on both sides, last STFT frame dropped, Slaney-normalized
mel filters, ``log10(max(., 1e-10))``, clamp to ``max - 8``, ``(x + 4) / 4``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds per window (reference seek-window size)
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000 samples per 30 s window
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 mel frames per window
N_FREQS = N_FFT // 2 + 1  # 201 rfft bins
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 100
SAMPLES_PER_TOKEN = HOP_LENGTH * 2  # one decoder timestamp token = 20 ms
TOKENS_PER_SECOND = SAMPLE_RATE // SAMPLES_PER_TOKEN  # 50


def _hertz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    log_region = freq >= min_log_hertz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hertz) / min_log_hertz) * logstep,
        mels,
    )
    return mels


def _mel_to_hertz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    log_region = mels >= min_log_mel
    freq = np.where(log_region, min_log_hertz * np.exp(logstep * (mels - min_log_mel)), freq)
    return freq


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int = 80,
    n_fft: int = N_FFT,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Slaney-scale, Slaney-normalized triangular mel filterbank.

    Returns float32 ``(n_mels, n_fft // 2 + 1)``, identical to
    ``librosa.filters.mel(sr=16000, n_fft=400, n_mels=n_mels)`` which is what
    the Whisper reference ships as ``mel_filters.npz`` (80 bands for tiny..
    large-v2, 128 for large-v3 — reference ``run:4`` serves large-v3).
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    mel_min = _hertz_to_mel_slaney(np.array(0.0))
    mel_max = _hertz_to_mel_slaney(np.array(sample_rate / 2.0))
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hertz_slaney(mel_pts)

    # Triangular filters between successive center frequencies.
    fdiff = np.diff(hz_pts)  # (n_mels + 1,)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels + 2, n_freqs)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_freqs)

    # Slaney normalization: each filter integrates to ~1 over Hz.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _dft_bases(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases: ``(n_fft, n_freqs)`` cos / -sin matrices.

    The periodic Hann window is folded into the bases so framing needs no
    separate multiply — the STFT becomes two plain GEMMs on the MXU.
    """
    window = np.hanning(n_fft + 1)[:-1]  # periodic Hann, matches torch.hann_window
    n = np.arange(n_fft)[:, None]  # (n_fft, 1)
    k = np.arange(n_fft // 2 + 1)[None, :]  # (1, n_freqs)
    angle = 2.0 * np.pi * n * k / n_fft
    w_real = (np.cos(angle) * window[:, None]).astype(np.float32)
    w_imag = (-np.sin(angle) * window[:, None]).astype(np.float32)
    return w_real, w_imag


def _frame_signal(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Reflect-pad by n_fft//2 and slice into overlapping frames.

    Matches ``torch.stft(center=True, pad_mode="reflect")``. Last frame is
    dropped by the caller (Whisper discards it).
    """
    pad = n_fft // 2
    padded = jnp.pad(audio, ((pad, pad),), mode="reflect")
    num_frames = 1 + (padded.shape[0] - n_fft) // hop
    # Gather-free framing: an advanced-index gather of (frames, n_fft)
    # positions degenerates on TPU for long audio (minutes for a 5-min
    # clip). Instead decompose into hop-aligned blocks: frame i =
    # rows [i, i+K) of the (n, hop) reshape, built as K shifted row-slices
    # concatenated along lanes — pure reshape/slice/concat, zero gathers,
    # bit-identical values.
    k_blocks = -(-n_fft // hop)  # ceil: 3 for (400, 160)
    n_rows = num_frames + k_blocks
    ext = jnp.pad(padded, ((0, n_rows * hop - padded.shape[0]),))
    rows = ext.reshape(n_rows, hop)
    parts = [rows[k : k + num_frames] for k in range(k_blocks)]
    return jnp.concatenate(parts, axis=1)[:, :n_fft]


def stft_power(audio: jnp.ndarray, n_fft: int = N_FFT, hop: int = HOP_LENGTH) -> jnp.ndarray:
    """Power spectrogram ``(num_frames, n_freqs)`` via GEMM-native DFT."""
    w_real, w_imag = _dft_bases(n_fft)
    frames = _frame_signal(audio.astype(jnp.float32), n_fft, hop)
    frames = frames[:-1]  # Whisper drops the final frame
    # HIGHEST precision: TPU matmuls default to bf16 inputs, but the mel
    # frontend feeds token selection and must stay fp32-exact (SURVEY.md §7
    # "bit-for-bit text parity" hard part). The frontend is ~0.1% of pipeline
    # FLOPs, so full-precision GEMMs cost nothing.
    prec = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, jnp.asarray(w_real), precision=prec)
    im = jnp.dot(frames, jnp.asarray(w_imag), precision=prec)
    return re * re + im * im


@functools.partial(jax.jit, static_argnames=("n_mels", "backend"))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = 80,
    backend: str = "xla",
) -> jnp.ndarray:
    """Whisper log-mel spectrogram ``(num_frames, n_mels)``.

    ``audio`` is f32 PCM at 16 kHz, any length (callers pad to N_SAMPLES for
    30 s windows via :func:`pad_or_trim`).

    backend="xla" uses the GEMM-native path above; backend="pallas" calls the
    fused single-pass Pallas kernel (ops/mel_pallas.py).
    """
    if backend == "pallas":
        from whisper_mlx_tpu.ops.mel_pallas import log_mel_pallas

        return log_mel_pallas(audio, n_mels=n_mels)

    power = stft_power(audio)
    fb = jnp.asarray(mel_filterbank(n_mels).T)  # (n_freqs, n_mels)
    mel = jnp.dot(power, fb, precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return (log_spec + 4.0) / 4.0


def pad_or_trim(audio: jnp.ndarray | np.ndarray, length: int = N_SAMPLES) -> jnp.ndarray:
    """Pad with zeros or trim to exactly ``length`` samples (reference 30 s window)."""
    audio = jnp.asarray(audio)
    if audio.shape[-1] > length:
        return audio[..., :length]
    if audio.shape[-1] < length:
        pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
        return jnp.pad(audio, pad)
    return audio
