"""OpenAI-format Whisper checkpoint loader (original ``.pt`` files).

Third supported checkpoint family alongside HF safetensors (hf_loader) and
mlx-community (quant_loader): the original research release stores
``{"dims": {...}, "model_state_dict": {...}}`` with module naming
``encoder.blocks.N.attn.{query,key,value,out}`` / ``mlp.{0,2}`` and torch
conv layout (out, in, k). The encoder sinusoid table is stored
(``encoder.positional_embedding``) and loaded verbatim — exact float32
argument rounding matters for golden parity (see models/whisper.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.models.whisper import Params, WhisperConfig


def config_from_dims(dims: Mapping[str, Any]) -> WhisperConfig:
    return WhisperConfig(
        n_mels=dims["n_mels"], n_vocab=dims["n_vocab"],
        n_audio_ctx=dims["n_audio_ctx"], n_audio_state=dims["n_audio_state"],
        n_audio_head=dims["n_audio_head"], n_audio_layer=dims["n_audio_layer"],
        n_text_ctx=dims["n_text_ctx"], n_text_state=dims["n_text_state"],
        n_text_head=dims["n_text_head"], n_text_layer=dims["n_text_layer"],
    )


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def convert_openai_state(
    sd: Mapping[str, Any], config: WhisperConfig, dtype=jnp.float32
) -> Params:
    def dense(prefix: str) -> Params:
        node = {"w": _np(sd[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in sd:
            node["b"] = _np(sd[f"{prefix}.bias"])
        return node

    def ln(prefix: str) -> Params:
        return {"g": _np(sd[f"{prefix}.weight"]), "b": _np(sd[f"{prefix}.bias"])}

    def attn(prefix: str) -> Params:
        return {
            "q": dense(f"{prefix}.query"),
            "k": dense(f"{prefix}.key"),
            "v": dense(f"{prefix}.value"),
            "o": dense(f"{prefix}.out"),
        }

    def block(prefix: str, cross: bool) -> Params:
        blk = {
            "attn_ln": ln(f"{prefix}.attn_ln"),
            "attn": attn(f"{prefix}.attn"),
            "mlp_ln": ln(f"{prefix}.mlp_ln"),
            # OpenAI MLP is Sequential(Linear, GELU, Linear) → mlp.0 / mlp.2
            "mlp": {"fc1": dense(f"{prefix}.mlp.0"), "fc2": dense(f"{prefix}.mlp.2")},
        }
        if cross:
            blk["cross_attn_ln"] = ln(f"{prefix}.cross_attn_ln")
            blk["cross_attn"] = attn(f"{prefix}.cross_attn")
        return blk

    params: Params = {
        "encoder": {
            # torch conv1d (out, in, k) → NWC (k, in, out)
            "conv1": {"w": _np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
                       "b": _np(sd["encoder.conv1.bias"])},
            "conv2": {"w": _np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
                       "b": _np(sd["encoder.conv2.bias"])},
            "pos_emb": _np(sd["encoder.positional_embedding"]),
            "blocks": [block(f"encoder.blocks.{i}", cross=False)
                       for i in range(config.n_audio_layer)],
            "ln_post": ln("encoder.ln_post"),
        },
        "decoder": {
            "token_emb": _np(sd["decoder.token_embedding.weight"]),
            "pos_emb": _np(sd["decoder.positional_embedding"]),
            "blocks": [block(f"decoder.blocks.{i}", cross=True)
                       for i in range(config.n_text_layer)],
            "ln": ln("decoder.ln"),
        },
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def load_openai_whisper(path: str | Path, dtype=jnp.float32) -> tuple[Params, WhisperConfig]:
    """Load an original-release ``*.pt`` checkpoint (torch required)."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    config = config_from_dims(ckpt["dims"])
    params = convert_openai_state(ckpt["model_state_dict"], config, dtype)
    return params, config
