from whisper_mlx_tpu.audio.decode import load_audio, SAMPLE_RATE
from whisper_mlx_tpu.audio.mel import (
    N_FFT,
    HOP_LENGTH,
    CHUNK_LENGTH,
    N_SAMPLES,
    N_FRAMES,
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_trim,
)

__all__ = [
    "load_audio",
    "SAMPLE_RATE",
    "N_FFT",
    "HOP_LENGTH",
    "CHUNK_LENGTH",
    "N_SAMPLES",
    "N_FRAMES",
    "log_mel_spectrogram",
    "mel_filterbank",
    "pad_or_trim",
]
