"""Pallas TPU kernels + quantization ops.

- :mod:`~whisper_mlx_tpu.ops.mel_pallas` — fused log-mel frontend
- :mod:`~whisper_mlx_tpu.ops.flash_attention` — online-softmax attention
- :mod:`~whisper_mlx_tpu.ops.quant` / ``quant_pallas`` — mlx-compatible
  group quantization + fused dequant matmul
- :mod:`~whisper_mlx_tpu.ops.kv_quant` — int8 KV caches with exact
  scale-folded attention
"""

from whisper_mlx_tpu.ops.quant import QuantTensor, quant_matmul, quantize, quantize_params

__all__ = ["QuantTensor", "quant_matmul", "quantize", "quantize_params"]
