"""Native checkpoint IO for whisper_mlx_tpu pytrees.

The reference only ever *downloads* checkpoints (SURVEY.md §5 "model
checkpoints cached from HF hub"); a standalone framework also needs to
persist its own: flat safetensors with ``/``-joined pytree paths, QuantTensor
leaves stored as three tensors + metadata (bits/group in the safetensors
header). Works for both the Whisper and Qwen pytrees.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.ops.quant import QuantTensor


def _flatten(tree: Any, prefix: str = "") -> dict[str, Any]:
    out: dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif isinstance(tree, QuantTensor):
        key = prefix.rstrip("/")
        out[f"{key}.__wq__"] = np.asarray(tree.w_q)
        out[f"{key}.__scales__"] = np.asarray(tree.scales)
        out[f"{key}.__biases__"] = np.asarray(tree.biases)
        out[f"{key}.__qmeta__"] = np.asarray([tree.bits, tree.group_size], np.int32)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_params(params: Any, path: str | Path) -> Path:
    """Write a pytree to one safetensors file (+ structure manifest)."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, str(path))
    return path


def load_params(path: str | Path, dtype=None) -> Any:
    """Rebuild the pytree (dicts / lists / QuantTensors) from safetensors."""
    from safetensors.numpy import load_file

    flat = load_file(str(path))

    # regroup QuantTensor parts
    quants: dict[str, dict[str, np.ndarray]] = {}
    plain: dict[str, np.ndarray] = {}
    for key, val in flat.items():
        for tag in ("__wq__", "__scales__", "__biases__", "__qmeta__"):
            if key.endswith(f".{tag}"):
                quants.setdefault(key[: -len(tag) - 1], {})[tag] = val
                break
        else:
            plain[key] = val

    leaves: dict[str, Any] = dict(plain)
    for key, parts in quants.items():
        bits, group = map(int, parts["__qmeta__"])
        leaves[key] = QuantTensor(
            jnp.asarray(parts["__wq__"]), jnp.asarray(parts["__scales__"]),
            jnp.asarray(parts["__biases__"]), bits, group,
        )

    # nested reconstruction; integer path components become list indices
    root: dict[str, Any] = {}
    for key, val in leaves.items():
        node = root
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        if not isinstance(val, QuantTensor):
            val = jnp.asarray(val, dtype) if dtype is not None and np.issubdtype(val.dtype, np.floating) else jnp.asarray(val)
        node[parts[-1]] = val

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)
