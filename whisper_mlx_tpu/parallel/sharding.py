"""GSPMD sharding rules for Whisper (and the LLM) param pytrees.

Tensor-parallel layout (Megatron-style, expressed as PartitionSpecs — XLA
inserts the psum/all-gather collectives):

- attention q/k/v projections: columns over "tp" (heads split),
  output projection: rows over "tp" (partial sums psum-reduced);
- MLP fc1 columns / fc2 rows over "tp";
- token embedding rows (vocab) over "tp" — splits the logits GEMM;
- LayerNorm / conv stem / positions: replicated (tiny);
- activations: batch over "dp".

Whisper large-v3 (1.5 B params) fits one v5e chip in bf16, so tp=1 is the
default there and "dp" over 30 s windows does the scaling (SURVEY.md §2.4);
tp>1 is required for the Qwen3-32B serving capability of the reference
(reference ``README.md:84``, ``llm.py:32``).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from whisper_mlx_tpu.models.whisper import Params


def _attn_spec(tp: str | None, blk: dict | None = None) -> dict[str, Any]:
    if blk is not None and "qkv" in blk:
        # fused quantized q/k/v (ops/quant.py fuse_whisper_qkv): single-chip
        # serving artifact — replicate (quantized whisper TP is not a served
        # config; whisper fits one chip, SURVEY.md §2.4)
        return {"qkv": {"w": P(), "b": P()}, "o": {"w": P(tp, None), "b": P()}}
    return {
        "q": {"w": P(None, tp), "b": P(tp)},
        "k": {"w": P(None, tp)},
        "v": {"w": P(None, tp), "b": P(tp)},
        "o": {"w": P(tp, None), "b": P()},
    }


def _mlp_spec(tp: str | None) -> dict[str, Any]:
    return {
        "fc1": {"w": P(None, tp), "b": P(tp)},
        "fc2": {"w": P(tp, None), "b": P()},
    }


_LN = {"g": P(), "b": P()}


def whisper_param_specs(params: Params, tp: str | None = "tp") -> Params:
    """PartitionSpec pytree matching ``params``' structure."""

    def enc_block(b):
        return {"attn_ln": _LN, "attn": _attn_spec(tp, b["attn"]),
                "mlp_ln": _LN, "mlp": _mlp_spec(tp)}

    def dec_block(b):
        return {
            "attn_ln": _LN, "attn": _attn_spec(tp, b["attn"]),
            "cross_attn_ln": _LN, "cross_attn": _attn_spec(tp, b["cross_attn"]),
            "mlp_ln": _LN, "mlp": _mlp_spec(tp),
        }

    return {
        "encoder": {
            "conv1": {"w": P(), "b": P()},
            "conv2": {"w": P(), "b": P()},
            "pos_emb": P(),
            "blocks": [enc_block(b) for b in params["encoder"]["blocks"]],
            "ln_post": _LN,
        },
        "decoder": {
            "token_emb": P(tp, None),  # vocab rows split → sharded logits GEMM
            "pos_emb": P(),
            "blocks": [dec_block(b) for b in params["decoder"]["blocks"]],
            "ln": _LN,
        },
    }


def _has_quant_leaves(params) -> bool:
    from whisper_mlx_tpu.ops.quant import QuantTensor

    return any(
        isinstance(leaf, QuantTensor)
        for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, QuantTensor)
        )
    )


def replicate_params(params, mesh: Mesh):
    """Commit every array leaf replicated over the mesh (P() sharding).

    The whisper DP serving layout: large-v3 fits one chip, so params are
    replicated and only the window batch is sharded (SURVEY.md §2.4).
    Works for any pytree, including QuantTensor nodes (their packed-code /
    scale children are plain arrays)."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), params
    )


def shard_params(params: Params, mesh: Mesh, tp: str | None = "tp") -> Params:
    """Commit params to the mesh with TP NamedShardings (device_put once;
    all downstream jits see committed shardings and compile SPMD).

    Quantized (QuantTensor) whisper trees are replicated instead: packed
    mlx-group codes can't be row/column-split along P specs, and quantized
    whisper TP is not a served config (whisper fits one chip — the mesh
    buys DP over windows)."""
    if _has_quant_leaves(params):
        return replicate_params(params, mesh)
    specs = whisper_param_specs(params, tp=tp if tp in mesh.axis_names else None)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_batch(x, mesh: Mesh):
    """Commit a batch-leading array (mel windows / tokens) over "dp"."""
    spec = P("dp", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
