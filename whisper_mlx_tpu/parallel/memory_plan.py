"""Per-device HBM planning for sharded models — without allocating them.

The reference sizes models against unified host memory ("32B 4-bit ≈ 18 GB",
reference ``README.md:84``); on TPU the budget is per-chip HBM (v5e: 16 GB),
so the serving question is "which (dp, tp) makes this model + KV cache fit?".
This module answers it from ``jax.eval_shape`` abstract pytrees + the same
PartitionSpecs used for real sharding (parallel/sharding_llm.py) — no
weights are materialized, so a 32B plan costs microseconds.

Used by the Qwen3-32B memory-plan test (tests/test_parallel_realshape.py)
and usable at serving time to pick a mesh before loading checkpoints.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Mapping

import jax
from jax.sharding import PartitionSpec as P


def _leaf_bytes(leaf: Any) -> int:
    """Bytes of one abstract array (ShapeDtypeStruct or concrete)."""
    return math.prod(leaf.shape) * leaf.dtype.itemsize if leaf.shape else leaf.dtype.itemsize


def _shard_factor(spec: P, axis_sizes: Mapping[str, int]) -> int:
    """How many ways the spec divides one array across the mesh."""
    factor = 1
    for entry in spec:
        if entry is None:
            continue
        names = entry if isinstance(entry, tuple) else (entry,)
        for name in names:
            factor *= axis_sizes.get(name, 1)
    return factor


@dataclass(frozen=True)
class MemoryPlan:
    total_bytes: int  # unsharded param bytes
    per_device_bytes: int  # largest per-device param residency
    kv_cache_bytes: int  # per-device KV cache for the requested serving shape
    headroom_bytes: int  # budget − (params + kv)

    @property
    def per_device_gib(self) -> float:
        return self.per_device_bytes / 2**30

    @property
    def fits(self) -> bool:
        return self.headroom_bytes > 0


def plan_param_memory(
    abstract_params: Any,
    specs: Any,
    axis_sizes: Mapping[str, int],
) -> tuple[int, int]:
    """→ (total_bytes, per_device_bytes) for a param pytree + matching
    PartitionSpec pytree (same structure; spec leaves are PartitionSpec)."""
    leaves = jax.tree.leaves(abstract_params)
    spec_leaves = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert len(leaves) == len(spec_leaves), (len(leaves), len(spec_leaves))
    total = 0
    per_dev = 0
    for leaf, spec in zip(leaves, spec_leaves):
        b = _leaf_bytes(leaf)
        total += b
        per_dev += -(-b // _shard_factor(spec, axis_sizes))
    return total, per_dev


def abstract_qwen_params(
    config,
    *,
    quant_bits: int | None = None,
    group_size: int = 64,
    dtype_name: str = "bfloat16",
):
    """ShapeDtypeStruct pytree mirroring ``models.qwen.init_params`` output
    (and the MLX packed layout for quantized leaves) — zero allocation, so a
    32B plan is instant. Shapes must stay in lockstep with
    ``qwen_loader.load_qwen`` / ``models.qwen.init_params``."""
    import numpy as np

    from whisper_mlx_tpu.ops.quant import QuantTensor

    dt = np.dtype(dtype_name)

    def arr(*shape):
        return jax.ShapeDtypeStruct(shape, dt)

    def dense(n_in, n_out, bias=False):
        if quant_bits and n_in % group_size == 0 and n_in % (32 // quant_bits) == 0:
            per_word = 32 // quant_bits
            p = {"w": QuantTensor(
                jax.ShapeDtypeStruct((n_out, n_in // per_word), np.dtype("uint32")),
                jax.ShapeDtypeStruct((n_out, n_in // group_size), np.dtype("float16")),
                jax.ShapeDtypeStruct((n_out, n_in // group_size), np.dtype("float16")),
                quant_bits, group_size,
            )}
        else:
            p = {"w": arr(n_in, n_out)}
        if bias:
            p["b"] = arr(n_out)
        return p

    D, I = config.hidden_size, config.intermediate_size
    H, KV, hd = config.num_attention_heads, config.num_key_value_heads, config.hd

    def layer():
        attn = {
            "q": dense(D, H * hd, config.attention_bias),
            "k": dense(D, KV * hd, config.attention_bias),
            "v": dense(D, KV * hd, config.attention_bias),
            "o": dense(H * hd, D),
        }
        if config.qk_norm:
            attn["q_norm"] = arr(hd)
            attn["k_norm"] = arr(hd)
        return {
            "input_ln": arr(D),
            "attn": attn,
            "post_ln": arr(D),
            "mlp": {"gate": dense(D, I), "up": dense(D, I), "down": dense(I, D)},
        }

    embed = arr(config.vocab_size, D)
    if quant_bits:
        # embedding quantizes along D (MLX layout: (vocab, D//per_word))
        per_word = 32 // quant_bits
        embed = QuantTensor(
            jax.ShapeDtypeStruct((config.vocab_size, D // per_word), np.dtype("uint32")),
            jax.ShapeDtypeStruct((config.vocab_size, D // group_size), np.dtype("float16")),
            jax.ShapeDtypeStruct((config.vocab_size, D // group_size), np.dtype("float16")),
            quant_bits, group_size,
        )
    params = {
        "embed": embed,
        "layers": [layer() for _ in range(config.num_hidden_layers)],
        "final_ln": arr(D),
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = dense(D, config.vocab_size)
    return params


def plan_qwen_serving(
    config,
    *,
    tp: int,
    batch_per_device: int = 1,
    max_len: int = 4096,
    quant_bits: int | None = None,
    group_size: int = 64,
    hbm_budget_bytes: int = 16 * 2**30,  # v5e
    cache_dtype_bytes: float = 2,  # bf16 KV; 1 = int8, 0.5 = native int4
    kv_bits: int | None = None,  # overrides cache_dtype_bytes (8 → 1 B, 4 → 0.5 B)
) -> MemoryPlan:
    """Memory plan for serving a Qwen config over a tp-way mesh.

    ``quant_bits`` builds the abstract pytree in MLX 4/8-bit packed layout
    (matching checkpoint/qwen_loader.py outputs) so the plan reflects the
    actual serving artifact.
    """
    from whisper_mlx_tpu.parallel.sharding_llm import qwen_param_specs

    abstract = abstract_qwen_params(config, quant_bits=quant_bits,
                                    group_size=group_size)
    specs = qwen_param_specs(abstract, tp="tp")
    total, per_dev = plan_param_memory(abstract, specs, {"tp": tp})

    # KV cache per device: layers × 2 × kv_heads × max_len × hd × batch.
    # KV heads are NOT tp-split in the current layout (k/v col-split shards
    # the projection, but the cache batch lives per-request) — count full.
    # Quantized caches add per-(kv, t) bf16 scales (models/qwen.py).
    if kv_bits is not None:
        cache_dtype_bytes = kv_bits / 8
    kv = int(
        config.num_hidden_layers * 2 * batch_per_device
        * config.num_key_value_heads * max_len
        * (config.hd * cache_dtype_bytes + (2 if cache_dtype_bytes < 2 else 0))
    )
    return MemoryPlan(
        total_bytes=total,
        per_device_bytes=per_dev,
        kv_cache_bytes=kv,
        headroom_bytes=hbm_budget_bytes - per_dev - kv,
    )
