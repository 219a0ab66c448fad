"""Checkpoint loaders: HF-format Whisper → whisper_mlx_tpu param pytrees.

The reference downloads mlx-community checkpoints from the HF hub at first
use (reference ``run:4``, SURVEY.md §5 "checkpoint/resume"). This module
covers the same job natively:

- :func:`convert_hf_whisper_state` maps a HuggingFace ``WhisperModel`` /
  ``WhisperForConditionalGeneration`` state dict (torch tensors or numpy)
  onto our pytree layout (models/whisper.py);
- :func:`load_whisper` reads a local HF model directory (config.json +
  ``*.safetensors``) without needing torch;
- the mlx-community **group-quantized** format (uint32-packed int4/int8 +
  per-group scales/biases) is handled in ``quant_loader.py``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.models.whisper import Params, WhisperConfig


def _np(t) -> np.ndarray:
    """torch tensor / numpy array → numpy float32."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def config_from_hf(hf_config: Mapping[str, Any]) -> WhisperConfig:
    return WhisperConfig(
        n_mels=hf_config["num_mel_bins"],
        n_vocab=hf_config["vocab_size"],
        n_audio_ctx=hf_config.get("max_source_positions", 1500),
        n_audio_state=hf_config["d_model"],
        n_audio_head=hf_config["encoder_attention_heads"],
        n_audio_layer=hf_config["encoder_layers"],
        n_text_ctx=hf_config.get("max_target_positions", 448),
        n_text_state=hf_config["d_model"],
        n_text_head=hf_config["decoder_attention_heads"],
        n_text_layer=hf_config["decoder_layers"],
    )


def convert_hf_whisper_state(
    state: Mapping[str, Any], config: WhisperConfig, dtype=jnp.float32
) -> Params:
    """HF ``model.{encoder,decoder}...`` state dict → our pytree.

    HF linear weights are (out, in) → transposed to (in, out); conv weights
    (out, in, k) → (k, in, out) for the NWC TPU layout.
    """
    sd = {re.sub(r"^model\.", "", k): v for k, v in state.items()}

    def dense(prefix: str, bias: bool = True) -> Params:
        p = {"w": _np(sd[f"{prefix}.weight"]).T}
        if bias:
            p["b"] = _np(sd[f"{prefix}.bias"])
        return p

    def ln(prefix: str) -> Params:
        return {"g": _np(sd[f"{prefix}.weight"]), "b": _np(sd[f"{prefix}.bias"])}

    def attn(prefix: str) -> Params:
        return {
            "q": dense(f"{prefix}.q_proj"),
            "k": dense(f"{prefix}.k_proj", bias=False),
            "v": dense(f"{prefix}.v_proj"),
            "o": dense(f"{prefix}.out_proj"),
        }

    def enc_block(i: int) -> Params:
        pre = f"encoder.layers.{i}"
        return {
            "attn_ln": ln(f"{pre}.self_attn_layer_norm"),
            "attn": attn(f"{pre}.self_attn"),
            "mlp_ln": ln(f"{pre}.final_layer_norm"),
            "mlp": {"fc1": dense(f"{pre}.fc1"), "fc2": dense(f"{pre}.fc2")},
        }

    def dec_block(i: int) -> Params:
        pre = f"decoder.layers.{i}"
        return {
            "attn_ln": ln(f"{pre}.self_attn_layer_norm"),
            "attn": attn(f"{pre}.self_attn"),
            "cross_attn_ln": ln(f"{pre}.encoder_attn_layer_norm"),
            "cross_attn": attn(f"{pre}.encoder_attn"),
            "mlp_ln": ln(f"{pre}.final_layer_norm"),
            "mlp": {"fc1": dense(f"{pre}.fc1"), "fc2": dense(f"{pre}.fc2")},
        }

    params: Params = {
        "encoder": {
            "conv1": {
                "w": _np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
                "b": _np(sd["encoder.conv1.bias"]),
            },
            "conv2": {
                "w": _np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
                "b": _np(sd["encoder.conv2.bias"]),
            },
            "pos_emb": _np(sd["encoder.embed_positions.weight"]),
            "blocks": [enc_block(i) for i in range(config.n_audio_layer)],
            "ln_post": ln("encoder.layer_norm"),
        },
        "decoder": {
            "token_emb": _np(sd["decoder.embed_tokens.weight"]),
            "pos_emb": _np(sd["decoder.embed_positions.weight"]),
            "blocks": [dec_block(i) for i in range(config.n_text_layer)],
            "ln": ln("decoder.layer_norm"),
        },
    }
    import jax

    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def load_whisper(model_dir: str | Path, dtype=jnp.float32) -> tuple[Params, WhisperConfig]:
    """Load a local HF Whisper directory (config.json + safetensors shards)."""
    from whisper_mlx_tpu.checkpoint.io_util import load_safetensors_dir

    model_dir = Path(model_dir)
    hf_config = json.loads((model_dir / "config.json").read_text())
    config = config_from_hf(hf_config)
    state = load_safetensors_dir(model_dir)
    params = convert_hf_whisper_state(state, config, dtype)
    return params, config
