"""Host-side audio decode → 16 kHz mono f32 PCM.

The reference shells out to ffmpeg for all decode (provided by its nix shell,
reference ``flake.nix:19``; invoked inside ``mlx_whisper`` — SURVEY.md §2.1).
Decode is host-CPU work in both designs; only the PCM goes to the device.

This module prefers the in-repo native decoder (``whisper_mlx_tpu.native``:
C++ WAV parse + polyphase resample, loaded via ctypes), falls back to a pure
NumPy WAV path, and uses an ffmpeg subprocess for non-WAV containers when
ffmpeg exists on PATH (it is absent in this image, so the gate is soft).
"""

from __future__ import annotations

import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np

SAMPLE_RATE = 16_000


def _parse_wav_chunks(path: str | Path) -> tuple[tuple, bytes]:
    """RIFF walk shared by the f32 decoder and the raw-PCM16 fast path:
    returns the unpacked ``fmt `` tuple and the ``data`` chunk bytes."""
    raw = Path(path).read_bytes()
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        chunk_id = raw[pos : pos + 4]
        (size,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            try:
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            except struct.error as e:  # truncated fmt chunk
                raise ValueError(f"{path}: corrupt WAV fmt chunk ({e})") from e
        elif chunk_id == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    return fmt, data


def _read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Minimal RIFF/WAVE parser: PCM 8/16/24/32-bit int and 32/64-bit float.

    Implemented directly (not via the ``wave`` stdlib module) so that float
    WAVs and >2-channel files decode, and so the native C++ decoder and this
    fallback share one behavior spec.
    """
    fmt, data = _parse_wav_chunks(path)
    return _decode_wav_data(path, fmt, data)


def _decode_wav_data(path: str | Path, fmt: tuple, data: bytes) -> tuple[np.ndarray, int]:
    """Decode already-parsed WAV chunks → (mono f32, rate). Split from
    :func:`_read_wav` so single-read callers (``load_audio_serving``) reuse
    the bytes of one parse instead of re-reading the file."""
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if bits >= 8 and len(data) % (bits // 8):
        # truncated sample at the end of the data chunk: name the file
        # instead of surfacing numpy's raw frombuffer message
        raise ValueError(f"{path}: data chunk is not a whole number of "
                         f"{bits}-bit samples (corrupt/truncated WAV)")
    if audio_format == 1:  # PCM int
        if bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            x = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = (x - ((x & 0x800000) << 1)).astype(np.float32) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8").astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported WAV format code {audio_format}")
    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(x, dtype=np.float32), rate


def load_audio_pcm16(path: str | Path, sample_rate: int = SAMPLE_RATE) -> np.ndarray | None:
    """Raw-PCM16 fast path for the serving upload: returns the mono ``<i2``
    samples when ``path`` is already a 16-bit mono PCM WAV at ``sample_rate``
    — i.e. when no host conversion is needed at all — else ``None`` (callers
    fall back to :func:`load_audio`).

    The batcher uploads this at HALF the f32 bytes and converts on device
    (``x.astype(f32) / 32768`` — int16 values and a /2^15 are both exact in
    f32, so the result is bit-identical to the host conversion). Through the
    axon relay the audio upload is the dominant remaining per-request host
    cost at serving saturation (docs/performance.md).
    """
    path = Path(path)
    if path.suffix.lower() not in (".wav", ".wave"):
        return None
    try:
        fmt, data = _parse_wav_chunks(path)
    except (ValueError, OSError):
        return None  # let load_audio raise the canonical error
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if (audio_format, channels, bits) != (1, 1, 16) or rate != sample_rate:
        return None
    if len(data) % 2:
        # odd data chunk = corrupt 16-bit PCM; fall through so load_audio
        # raises the canonical error (np.frombuffer in _decode_wav_data) —
        # one behavior spec for both paths
        return None
    return np.frombuffer(data, dtype="<i2").copy()


def load_audio_serving(path: str | Path, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Serving loader: ONE file read per request.

    Returns raw ``<i2`` samples when the file is already a 16-bit mono PCM
    WAV at ``sample_rate`` (the batcher uploads half the bytes and converts
    on device — bit-identical), else decodes f32 from the same parsed chunk
    bytes instead of re-reading the file (``load_audio_pcm16`` followed by
    ``load_audio`` read every non-fast-path WAV twice). Non-WAV containers
    and corrupt files delegate to :func:`load_audio` for the canonical
    error/ffmpeg behavior.
    """
    path = Path(path)
    if path.suffix.lower() not in (".wav", ".wave"):
        return load_audio(path, sample_rate)
    try:
        fmt, data = _parse_wav_chunks(path)
    except (ValueError, OSError):
        return load_audio(path, sample_rate)  # canonical error path
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if ((audio_format, channels, bits) == (1, 1, 16)
            and rate == sample_rate and len(data) % 2 == 0):
        return np.frombuffer(data, dtype="<i2").copy()
    audio, rate = _decode_wav_data(path, fmt, data)
    return resample(audio, rate, sample_rate)


def resample(audio: np.ndarray, src_rate: int, dst_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Polyphase resample to ``dst_rate`` (host CPU; scipy kaiser-windowed)."""
    if src_rate == dst_rate:
        return audio
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(src_rate, dst_rate)
    return resample_poly(audio, dst_rate // g, src_rate // g).astype(np.float32)


def _ffmpeg_decode(path: str | Path) -> np.ndarray:
    """Decode arbitrary containers via ffmpeg when present (reference parity:
    ffmpeg subprocess → 16 kHz f32 PCM)."""
    cmd = [
        "ffmpeg", "-nostdin", "-threads", "0", "-i", str(path),
        "-f", "f32le", "-ac", "1", "-acodec", "pcm_f32le", "-ar", str(SAMPLE_RATE), "-",
    ]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    return np.frombuffer(out, dtype=np.float32).copy()


def load_audio(path: str | Path, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Load any audio file → mono f32 PCM at ``sample_rate``.

    WAV decodes natively (C++ fast path when built, NumPy otherwise); other
    containers require ffmpeg on PATH.
    """
    path = Path(path)
    if path.suffix.lower() in (".wav", ".wave"):
        try:
            from whisper_mlx_tpu.native import lib as _native

            if _native is not None:
                audio, rate = _native.read_wav(path)
            else:
                audio, rate = _read_wav(path)
        except ImportError:
            audio, rate = _read_wav(path)
        return resample(audio, rate, sample_rate)
    if shutil.which("ffmpeg"):
        return _ffmpeg_decode(path)
    raise RuntimeError(
        f"cannot decode {path}: not a WAV file and ffmpeg is not installed"
    )
