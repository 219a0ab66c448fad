"""mlx-community Whisper checkpoint loader (fp16 and 4/8-bit quantized).

The reference's serving model is ``mlx-community/whisper-large-v3-mlx``
(reference ``run:4``) — MLX-format safetensors with MLX module naming and
optional group quantization. This loader maps that format onto our pytrees
so the same checkpoints work bit-compatibly (SURVEY.md §2.3 row
"MLX quantized matmul kernels").

MLX format facts handled here:
- ``weights.safetensors`` (or ``*.safetensors``) + ``config.json`` with
  ModelDimensions fields and optional ``{"quantization": {group_size,bits}}``;
- linear weights are (out, in); conv1d weights (out, k, in);
- quantized tensors appear as ``X.weight`` (uint32-packed) + ``X.scales`` +
  ``X.biases``; they stay packed in :class:`~whisper_mlx_tpu.ops.quant.QuantTensor`;
- ``decoder.positional_embedding`` is a bare param (no ``.weight`` suffix);
- the encoder sinusoid table is not stored (recomputed, float32).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.models.whisper import Params, WhisperConfig, sinusoids
from whisper_mlx_tpu.ops.quant import QuantTensor


def config_from_mlx(cfg: Mapping[str, Any]) -> WhisperConfig:
    heads = cfg.get("alignment_heads")
    return WhisperConfig(
        n_mels=cfg["n_mels"], n_vocab=cfg["n_vocab"],
        n_audio_ctx=cfg["n_audio_ctx"], n_audio_state=cfg["n_audio_state"],
        n_audio_head=cfg["n_audio_head"], n_audio_layer=cfg["n_audio_layer"],
        n_text_ctx=cfg["n_text_ctx"], n_text_state=cfg["n_text_state"],
        n_text_head=cfg["n_text_head"], n_text_layer=cfg["n_text_layer"],
        # model-specific DTW heads (openai's per-model dump, carried through
        # the mlx conversion as [[layer, head], ...]) — tuple-ized so the
        # frozen config stays hashable as a static jit arg
        alignment_heads=(tuple((int(l), int(h)) for l, h in heads)
                         if heads else None),
    )


def _linear(sd: dict, prefix: str, quant: dict | None, dtype) -> Params:
    """MLX linear → our param node (fp transposed / QuantTensor as-is)."""
    w = sd[f"{prefix}.weight"]
    node: Params
    if quant is not None and f"{prefix}.scales" in sd:
        node = {
            "w": QuantTensor(
                jnp.asarray(np.asarray(w), jnp.uint32),
                jnp.asarray(np.asarray(sd[f"{prefix}.scales"], np.float32)),
                jnp.asarray(np.asarray(sd[f"{prefix}.biases"], np.float32)),
                quant["bits"], quant["group_size"],
            )
        }
    else:
        node = {"w": jnp.asarray(np.asarray(w, np.float32).T, dtype)}
    if f"{prefix}.bias" in sd:
        node["b"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32), dtype)
    return node


def _ln(sd: dict, prefix: str, dtype) -> Params:
    return {
        "g": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32), dtype),
        "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32), dtype),
    }


def convert_mlx_whisper_state(
    sd: Mapping[str, Any], config: WhisperConfig,
    quant: dict | None, dtype=jnp.float32,
) -> Params:
    sd = dict(sd)

    def attn(prefix: str) -> Params:
        return {
            "q": _linear(sd, f"{prefix}.query", quant, dtype),
            "k": _linear(sd, f"{prefix}.key", quant, dtype),
            "v": _linear(sd, f"{prefix}.value", quant, dtype),
            "o": _linear(sd, f"{prefix}.out", quant, dtype),
        }

    def block(prefix: str, cross: bool) -> Params:
        blk = {
            "attn_ln": _ln(sd, f"{prefix}.attn_ln", dtype),
            "attn": attn(f"{prefix}.attn"),
            "mlp_ln": _ln(sd, f"{prefix}.mlp_ln", dtype),
            "mlp": {
                "fc1": _linear(sd, f"{prefix}.mlp1", quant, dtype),
                "fc2": _linear(sd, f"{prefix}.mlp2", quant, dtype),
            },
        }
        if cross:
            blk["cross_attn_ln"] = _ln(sd, f"{prefix}.cross_attn_ln", dtype)
            blk["cross_attn"] = attn(f"{prefix}.cross_attn")
        return blk

    def conv(prefix: str) -> Params:
        # MLX conv1d weight (out, k, in) → ours (k, in, out)
        return {
            "w": jnp.asarray(
                np.asarray(sd[f"{prefix}.weight"], np.float32).transpose(1, 2, 0), dtype
            ),
            "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32), dtype),
        }

    if quant is not None and "decoder.token_embedding.scales" in sd:
        token_emb = QuantTensor(
            jnp.asarray(np.asarray(sd["decoder.token_embedding.weight"]), jnp.uint32),
            jnp.asarray(np.asarray(sd["decoder.token_embedding.scales"], np.float32)),
            jnp.asarray(np.asarray(sd["decoder.token_embedding.biases"], np.float32)),
            quant["bits"], quant["group_size"],
        )
    else:
        token_emb = jnp.asarray(
            np.asarray(sd["decoder.token_embedding.weight"], np.float32), dtype
        )

    return {
        "encoder": {
            "conv1": conv("encoder.conv1"),
            "conv2": conv("encoder.conv2"),
            "pos_emb": jnp.asarray(
                sinusoids(config.n_audio_ctx, config.n_audio_state), dtype
            ),
            "blocks": [
                block(f"encoder.blocks.{i}", cross=False)
                for i in range(config.n_audio_layer)
            ],
            "ln_post": _ln(sd, "encoder.ln_post", dtype),
        },
        "decoder": {
            "token_emb": token_emb,
            "pos_emb": jnp.asarray(
                np.asarray(sd["decoder.positional_embedding"], np.float32), dtype
            ),
            "blocks": [
                block(f"decoder.blocks.{i}", cross=True)
                for i in range(config.n_text_layer)
            ],
            "ln": _ln(sd, "decoder.ln", dtype),
        },
    }


def load_mlx_whisper(model_dir: str | Path, dtype=jnp.float32,
                     fuse_qkv: bool = True,
                     dequant: bool | None = None) -> tuple[Params, WhisperConfig]:
    """Load an mlx-community Whisper model directory.

    ``fuse_qkv`` (quantized checkpoints only) stacks each self-attention
    block's q/k/v QuantTensors into one fused projection — one dequant
    matmul per step instead of three (ops/quant.py fuse_whisper_qkv;
    bit-exact).

    ``dequant`` (default: WTPU_DEQUANT_AT_LOAD env, off) dequantizes the
    4-bit weights to bf16 ONCE at load: whisper fits HBM comfortably in
    bf16, so a 4-bit checkpoint then serves at full bf16 decode speed.
    Keep it off to hold weights int4-resident (8× less weight HBM — the
    larger window batches that buys are the 4-bit path's throughput edge,
    docs/performance.md)."""
    import os

    from whisper_mlx_tpu.checkpoint.io_util import load_safetensors_dir

    model_dir = Path(model_dir)
    cfg = json.loads((model_dir / "config.json").read_text())
    config = config_from_mlx(cfg)
    quant = cfg.get("quantization")
    sd = load_safetensors_dir(model_dir)
    params = convert_mlx_whisper_state(sd, config, quant, dtype)
    if dequant is None:
        dequant = os.environ.get("WTPU_DEQUANT_AT_LOAD") == "1"
    if quant and dequant:
        from whisper_mlx_tpu.ops.quant import dequantize_params

        return dequantize_params(params, dtype=jnp.bfloat16), config
    if fuse_qkv and quant:
        from whisper_mlx_tpu.ops.quant import fuse_whisper_qkv

        params = fuse_whisper_qkv(params)
    return params, config


def export_mlx_whisper(
    params: Params, config: WhisperConfig, out_dir: str | Path,
    quantization: dict | None = None,
) -> None:
    """Write our pytree as an MLX-format checkpoint (round-trip tooling +
    test fixture generator; also lets users re-export quantized models)."""
    from safetensors.numpy import save_file

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sd: dict[str, np.ndarray] = {}

    def put_linear(prefix: str, node: Params) -> None:
        w = node["w"]
        if isinstance(w, QuantTensor):
            sd[f"{prefix}.weight"] = np.asarray(w.w_q)
            sd[f"{prefix}.scales"] = np.asarray(w.scales)
            sd[f"{prefix}.biases"] = np.asarray(w.biases)
        else:
            sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(w, np.float32).T)
        if "b" in node:
            sd[f"{prefix}.bias"] = np.asarray(node["b"], np.float32)

    def put_ln(prefix: str, node: Params) -> None:
        sd[f"{prefix}.weight"] = np.asarray(node["g"], np.float32)
        sd[f"{prefix}.bias"] = np.asarray(node["b"], np.float32)

    def put_attn(prefix: str, node: Params) -> None:
        put_linear(f"{prefix}.query", node["q"])
        put_linear(f"{prefix}.key", node["k"])
        put_linear(f"{prefix}.value", node["v"])
        put_linear(f"{prefix}.out", node["o"])

    enc = params["encoder"]
    for name in ("conv1", "conv2"):
        sd[f"encoder.{name}.weight"] = np.ascontiguousarray(
            np.asarray(enc[name]["w"], np.float32).transpose(2, 0, 1)
        )  # (k,in,out) → (out,k,in)
        sd[f"encoder.{name}.bias"] = np.asarray(enc[name]["b"], np.float32)
    for i, blk in enumerate(enc["blocks"]):
        pre = f"encoder.blocks.{i}"
        put_ln(f"{pre}.attn_ln", blk["attn_ln"])
        put_attn(f"{pre}.attn", blk["attn"])
        put_ln(f"{pre}.mlp_ln", blk["mlp_ln"])
        put_linear(f"{pre}.mlp1", blk["mlp"]["fc1"])
        put_linear(f"{pre}.mlp2", blk["mlp"]["fc2"])
    put_ln("encoder.ln_post", enc["ln_post"])

    dec = params["decoder"]
    emb = dec["token_emb"]
    if isinstance(emb, QuantTensor):
        sd["decoder.token_embedding.weight"] = np.asarray(emb.w_q)
        sd["decoder.token_embedding.scales"] = np.asarray(emb.scales)
        sd["decoder.token_embedding.biases"] = np.asarray(emb.biases)
    else:
        sd["decoder.token_embedding.weight"] = np.asarray(emb, np.float32)
    sd["decoder.positional_embedding"] = np.asarray(dec["pos_emb"], np.float32)
    for i, blk in enumerate(dec["blocks"]):
        pre = f"decoder.blocks.{i}"
        put_ln(f"{pre}.attn_ln", blk["attn_ln"])
        put_attn(f"{pre}.attn", blk["attn"])
        put_ln(f"{pre}.cross_attn_ln", blk["cross_attn_ln"])
        put_attn(f"{pre}.cross_attn", blk["cross_attn"])
        put_ln(f"{pre}.mlp_ln", blk["mlp_ln"])
        put_linear(f"{pre}.mlp1", blk["mlp"]["fc1"])
        put_linear(f"{pre}.mlp2", blk["mlp"]["fc2"])
    put_ln("decoder.ln", dec["ln"])

    save_file(sd, str(out_dir / "weights.safetensors"))
    cfg = {
        "n_mels": config.n_mels, "n_vocab": config.n_vocab,
        "n_audio_ctx": config.n_audio_ctx, "n_audio_state": config.n_audio_state,
        "n_audio_head": config.n_audio_head, "n_audio_layer": config.n_audio_layer,
        "n_text_ctx": config.n_text_ctx, "n_text_state": config.n_text_state,
        "n_text_head": config.n_text_head, "n_text_layer": config.n_text_layer,
    }
    if quantization:
        cfg["quantization"] = quantization
    if config.alignment_heads:
        cfg["alignment_heads"] = [list(p) for p in config.alignment_heads]
    (out_dir / "config.json").write_text(json.dumps(cfg))
