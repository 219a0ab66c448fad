"""whisper_mlx_tpu — a TPU-native speech-to-text + tool-calling LLM stack.

Brand-new framework (JAX / XLA / Pallas / pjit) with the capabilities of the
MLX-based reference stack (geosurge-ai/whisper-mlx):

- ``whisper_mlx_tpu.audio``      audio decode + log-mel frontend (GEMM-native STFT)
- ``whisper_mlx_tpu.ops``        Pallas TPU kernels (mel, flash-attention, quant matmul)
- ``whisper_mlx_tpu.models``     pure-functional Whisper + Qwen models (pytree params)
- ``whisper_mlx_tpu.decoding``   tokenizer, logit filters, greedy/beam decode loops
- ``whisper_mlx_tpu.inference``  transcribe() pipeline + LLM generation engine
- ``whisper_mlx_tpu.checkpoint`` HF safetensors / mlx-community quant loaders
- ``whisper_mlx_tpu.parallel``   device mesh, DP window sharding, TP for the LLM
- ``whisper_mlx_tpu.serving``    daemon HTTP API, sessions, tools, profiles
  (API surface of the reference's ``daemon/server.py``)

The reference's model math lives in external MLX C++/Metal packages
(reference ``requirements.txt:5``, ``run:3``); here it is implemented natively
for TPU.
"""

__version__ = "0.1.0"

from whisper_mlx_tpu.inference.transcribe import transcribe  # noqa: F401

__all__ = ["transcribe", "__version__"]
