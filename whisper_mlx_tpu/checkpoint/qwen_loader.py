"""HF → pytree loader for Qwen2/Qwen3 checkpoints (fp + mlx quantized).

Covers the model ids the reference serves (``mlx-community/Qwen3-32B-4bit``
etc. — reference ``daemon/chat.py:142-147``): HF-format safetensors with
``model.layers.N...`` naming, and MLX quantized exports where each linear
is ``weight`` (packed uint32) + ``scales`` + ``biases``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.models.qwen import Params, QwenConfig
from whisper_mlx_tpu.ops.quant import QuantTensor


def config_from_hf(cfg: Mapping[str, Any]) -> QwenConfig:
    return QwenConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
        head_dim=cfg.get("head_dim"),
        rope_theta=cfg.get("rope_theta", 1e6),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        qk_norm="qwen3" in cfg.get("model_type", ""),
        attention_bias="qwen3" not in cfg.get("model_type", ""),
        max_position_embeddings=cfg.get("max_position_embeddings", 32_768),
    )


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_hf_qwen_state(
    state: Mapping[str, Any], config: QwenConfig,
    quant: dict | None = None, dtype=jnp.float32,
) -> Params:
    sd = {k.removeprefix("model."): v for k, v in state.items()}

    def linear(prefix: str) -> Params:
        if quant is not None and f"{prefix}.scales" in sd:
            node: Params = {
                "w": QuantTensor(
                    jnp.asarray(_np(sd[f"{prefix}.weight"]), jnp.uint32),
                    jnp.asarray(_np(sd[f"{prefix}.scales"]).astype(np.float32)),
                    jnp.asarray(_np(sd[f"{prefix}.biases"]).astype(np.float32)),
                    quant["bits"], quant["group_size"],
                )
            }
        else:
            node = {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).astype(np.float32).T, dtype)}
        if f"{prefix}.bias" in sd:
            node["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]).astype(np.float32), dtype)
        return node

    def norm(key: str):
        return jnp.asarray(_np(sd[key]).astype(np.float32), dtype)

    def layer(i: int) -> Params:
        pre = f"layers.{i}"
        attn: Params = {
            "q": linear(f"{pre}.self_attn.q_proj"),
            "k": linear(f"{pre}.self_attn.k_proj"),
            "v": linear(f"{pre}.self_attn.v_proj"),
            "o": linear(f"{pre}.self_attn.o_proj"),
        }
        if config.qk_norm:
            attn["q_norm"] = norm(f"{pre}.self_attn.q_norm.weight")
            attn["k_norm"] = norm(f"{pre}.self_attn.k_norm.weight")
        return {
            "input_ln": norm(f"{pre}.input_layernorm.weight"),
            "attn": attn,
            "post_ln": norm(f"{pre}.post_attention_layernorm.weight"),
            "mlp": {
                "gate": linear(f"{pre}.mlp.gate_proj"),
                "up": linear(f"{pre}.mlp.up_proj"),
                "down": linear(f"{pre}.mlp.down_proj"),
            },
        }

    if quant is not None and "embed_tokens.scales" in sd:
        embed = QuantTensor(
            jnp.asarray(_np(sd["embed_tokens.weight"]), jnp.uint32),
            jnp.asarray(_np(sd["embed_tokens.scales"]).astype(np.float32)),
            jnp.asarray(_np(sd["embed_tokens.biases"]).astype(np.float32)),
            quant["bits"], quant["group_size"],
        )
    else:
        embed = jnp.asarray(_np(sd["embed_tokens.weight"]).astype(np.float32), dtype)

    params: Params = {
        "embed": embed,
        "layers": [layer(i) for i in range(config.num_hidden_layers)],
        "final_ln": norm("norm.weight"),
    }
    if not config.tie_word_embeddings:
        if "lm_head.weight" in state or "lm_head.scales" in state:
            sd_lm = {k.removeprefix("lm_head."): v for k, v in state.items()
                     if k.startswith("lm_head.")}
            if quant is not None and "scales" in sd_lm:
                params["lm_head"] = {
                    "w": QuantTensor(
                        jnp.asarray(_np(sd_lm["weight"]), jnp.uint32),
                        jnp.asarray(_np(sd_lm["scales"]).astype(np.float32)),
                        jnp.asarray(_np(sd_lm["biases"]).astype(np.float32)),
                        quant["bits"], quant["group_size"],
                    )
                }
            else:
                params["lm_head"] = {
                    "w": jnp.asarray(_np(sd_lm["weight"]).astype(np.float32).T, dtype)
                }
        else:  # checkpoint ties even though config says otherwise
            params["lm_head"] = {
                "w": jnp.asarray(_np(sd["embed_tokens.weight"]).astype(np.float32).T, dtype)
            }
    return params


def load_qwen(model_dir: str | Path, dtype=jnp.float32,
              fuse_projections: bool = True) -> tuple[Params, QwenConfig]:
    from whisper_mlx_tpu.checkpoint.io_util import load_safetensors_dir

    model_dir = Path(model_dir)
    cfg = json.loads((model_dir / "config.json").read_text())
    config = config_from_hf(cfg)
    quant = cfg.get("quantization")
    state = load_safetensors_dir(model_dir)
    params = convert_hf_qwen_state(state, config, quant, dtype)
    if fuse_projections and quant is not None:
        from whisper_mlx_tpu.ops.quant import fuse_qwen_projections

        params = fuse_qwen_projections(params)
    return params, config
