"""Shared checkpoint IO helpers.

``safetensors.numpy`` cannot represent bf16 (NumPy has no bfloat16 dtype),
and many real HF checkpoints ship bf16 — so shard loading tries the numpy
fast path and falls back to torch per shard, upcasting bf16/fp16 → fp32
numpy (our pytrees pick their compute dtype downstream).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_safetensors_dir(model_dir: str | Path) -> dict[str, np.ndarray]:
    """Merge all ``*.safetensors`` shards in a directory → numpy dict."""
    model_dir = Path(model_dir)
    state: dict[str, np.ndarray] = {}
    shards = sorted(model_dir.glob("*.safetensors"))
    if not shards:
        raise FileNotFoundError(f"no *.safetensors under {model_dir}")
    for shard in shards:
        state.update(load_safetensors_file(shard))
    return state


def load_safetensors_file(path: str | Path) -> dict[str, np.ndarray]:
    try:
        from safetensors.numpy import load_file

        return load_file(str(path))
    except (TypeError, ValueError, RuntimeError):
        # bf16 (or other non-numpy dtypes): go through torch
        import torch
        from safetensors.torch import load_file as load_torch

        out = {}
        for key, tensor in load_torch(str(path)).items():
            if tensor.dtype in (torch.bfloat16, torch.float16):
                tensor = tensor.float()
            out[key] = tensor.numpy()
        return out
