"""Mel frontend parity vs the transformers WhisperFeatureExtractor oracle.

The reference's mel frontend lives inside mlx_whisper (SURVEY.md §2.1); its
numerics are identical to openai/whisper's audio.py, which the transformers
WhisperFeatureExtractor reimplements in NumPy. That extractor is the offline
golden oracle here.
"""

import numpy as np
import pytest

from tests.conftest import make_speechy_audio
from whisper_mlx_tpu.audio import (
    N_FRAMES,
    N_SAMPLES,
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_trim,
)


def _oracle_mel(audio: np.ndarray, n_mels: int) -> np.ndarray:
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=n_mels)
    out = fe(audio, sampling_rate=16_000, return_tensors="np", padding="max_length")
    return out.input_features[0].T  # (frames, n_mels)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_filterbank_matches_transformers(n_mels):
    from transformers.audio_utils import mel_filter_bank

    oracle = mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=n_mels,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16_000,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns (n_freqs, n_mels)
    ours = mel_filterbank(n_mels)
    np.testing.assert_allclose(ours, oracle, atol=1e-8)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_oracle(n_mels):
    audio = make_speechy_audio(seconds=4.0)
    padded = np.asarray(pad_or_trim(audio, N_SAMPLES))
    ours = np.asarray(log_mel_spectrogram(padded, n_mels=n_mels))
    oracle = _oracle_mel(audio, n_mels)
    assert ours.shape == (N_FRAMES, n_mels)
    np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


def test_pad_or_trim():
    short = np.ones(1000, dtype=np.float32)
    assert pad_or_trim(short).shape == (N_SAMPLES,)
    long = np.ones(N_SAMPLES + 5, dtype=np.float32)
    assert pad_or_trim(long).shape == (N_SAMPLES,)
    assert np.asarray(pad_or_trim(short))[:1000].sum() == 1000


def test_wav_roundtrip(tmp_path):
    import struct

    from whisper_mlx_tpu.audio import load_audio

    audio = make_speechy_audio(seconds=1.0)
    pcm16 = (np.clip(audio, -1, 1) * 32767).astype("<i2")
    data = pcm16.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16_000, 32_000, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    path = tmp_path / "t.wav"
    path.write_bytes(hdr + data)
    loaded = load_audio(path)
    np.testing.assert_allclose(loaded, pcm16.astype(np.float32) / 32768.0, atol=1e-6)


def test_native_audio_parity(tmp_path):
    """C++ WAV decode (native/audio.cc) must match the NumPy fallback."""
    import struct
    import subprocess
    import sys
    from pathlib import Path

    so = Path("whisper_mlx_tpu/native/libwhisper_tpu_native.so")
    if not so.exists():
        rc = subprocess.run(
            [sys.executable, "-m", "whisper_mlx_tpu.native.build"]
        ).returncode
        if rc != 0:
            pytest.skip("native build failed (no g++?)")

    import importlib

    import whisper_mlx_tpu.native as native

    importlib.reload(native)
    assert native.lib is not None

    from whisper_mlx_tpu.audio.decode import _read_wav

    audio = make_speechy_audio(seconds=1.0)
    # stereo 24-bit to exercise the harder path
    pcm = (np.clip(audio, -1, 1) * 8388607).astype(np.int32)
    stereo = np.repeat(pcm, 2)
    b = bytearray()
    for v in stereo:
        b += int(v & 0xFFFFFF).to_bytes(3, "little")
    data = bytes(b)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16_000, 96_000, 6, 24)
    hdr += b"data" + struct.pack("<I", len(data))
    path = tmp_path / "n.wav"
    path.write_bytes(hdr + data)

    a_native, r_native = native.lib.read_wav(path)
    a_py, r_py = _read_wav(path)
    assert r_native == r_py
    np.testing.assert_allclose(a_native, a_py, atol=1e-6)
