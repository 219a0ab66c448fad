"""GSPMD sharding rules for the Qwen LLM pytree.

Qwen3-32B at 4-bit is ~18 GB (reference ``README.md:84``) — beyond one
v5e chip's 16 GB HBM, so tensor parallelism is required for the
reference's LARGE model size. Megatron layout over the "tp" axis:

- q/k/v projections: columns (heads split — head_dim stays whole);
- o projection: rows (partials psum-reduced by XLA);
- gate/up columns, down rows;
- embedding + lm_head rows (vocab split → sharded logits GEMM);
- RMSNorm gains replicated; per-head q/k norms replicated (hd,).

Quantized params shard the SAME way on their packed axes: w_q/scales/biases
all carry the output dim as dim 0 (MLX layout), so a column-split of the
logical weight is a dim-0 split of the packed tensors for q/k/v/gate/up and
a dim-1 split for o/down — expressed per-leaf below.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from whisper_mlx_tpu.ops.quant import QuantTensor


def _dense_spec(split: str, tp) -> dict:
    """split: 'col' shards the output dim of (in, out) fp weights;
    'row' shards the input dim."""
    if split == "col":
        return {"w": P(None, tp), "b": P(tp)}
    return {"w": P(tp, None), "b": P()}


def _quant_spec(split: str, tp) -> dict:
    # MLX layout (out, in): col-split of the logical weight = dim-0 split.
    # Row split shards only the packed words; per-group scales/biases stay
    # replicated (tiny, and their group count may be < tp).
    if split == "col":
        return {"w_q": P(tp, None), "scales": P(tp, None), "biases": P(tp, None)}
    return {"w_q": P(None, tp), "scales": P(), "biases": P()}


def _leaf_spec(node, split: str, tp):
    if isinstance(node.get("w"), QuantTensor):
        qs = _quant_spec(split, tp)
        spec = {"w": QuantTensor(qs["w_q"], qs["scales"], qs["biases"],
                                 node["w"].bits, node["w"].group_size)}
    else:
        spec = {"w": _dense_spec(split, tp)["w"]}
    if "b" in node:
        spec["b"] = _dense_spec(split, tp)["b"]
    return spec


def qwen_param_specs(params, tp: str | None = "tp"):
    """PartitionSpec pytree matching a qwen param pytree."""

    def layer(blk):
        attn = {
            "q": _leaf_spec(blk["attn"]["q"], "col", tp),
            "k": _leaf_spec(blk["attn"]["k"], "col", tp),
            "v": _leaf_spec(blk["attn"]["v"], "col", tp),
            "o": _leaf_spec(blk["attn"]["o"], "row", tp),
        }
        if "q_norm" in blk["attn"]:
            attn["q_norm"] = P()
            attn["k_norm"] = P()
        return {
            "input_ln": P(),
            "attn": attn,
            "post_ln": P(),
            "mlp": {
                "gate": _leaf_spec(blk["mlp"]["gate"], "col", tp),
                "up": _leaf_spec(blk["mlp"]["up"], "col", tp),
                "down": _leaf_spec(blk["mlp"]["down"], "row", tp),
            },
        }

    specs = {
        "embed": (
            QuantTensor(P(tp, None), P(tp, None), P(tp, None),
                        params["embed"].bits, params["embed"].group_size)
            if isinstance(params["embed"], QuantTensor) else P(tp, None)
        ),
        "layers": [layer(b) for b in params["layers"]],
        "final_ln": P(),
    }
    if "lm_head" in params:
        specs["lm_head"] = _leaf_spec(params["lm_head"], "col", tp)
    return specs


def shard_qwen_params(params, mesh: Mesh, tp: str | None = "tp"):
    specs = qwen_param_specs(params, tp=tp if tp in mesh.axis_names else None)

    def put(a, s):
        return jax.device_put(a, NamedSharding(mesh, s))

    return jax.tree.map(
        put, params, specs, is_leaf=lambda x: isinstance(x, P)
    )
