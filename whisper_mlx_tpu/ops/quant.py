"""Weight-only group quantization: mlx-community checkpoint compatible.

The reference serves 4-bit mlx-community checkpoints (reference ``run:4``,
``daemon/chat.py:145-147``); the quantized matmul lives in MLX C++/Metal
kernels (SURVEY.md §2.3). This module implements the same *format* natively:

- groups of ``group_size`` (default 64) elements along the input axis;
- ``w_q`` packed little-endian into uint32 (8×int4 or 4×int8 per word);
- per-group affine dequant ``w = scales * q + biases``;
- :func:`quantize` / :func:`dequantize` — MLX semantics (scale =
  (max-min)/(2^bits-1), bias = min, round-to-nearest);
- :class:`QuantTensor` — registered pytree node; packed data are children,
  (bits, group_size) are static aux so jitted code specializes on them;
- :func:`quant_matmul` — XLA path (dequant fused into the GEMM by XLA);
  the Pallas fused-dequant kernel (ops/quant_pallas.py) takes over on TPU
  for the HBM-bound decode path.

Layout: MLX stores linear weights (out, in) and quantizes along ``in``;
our fp pytrees store (in, out). QuantTensor keeps MLX layout (out, in);
``quant_matmul`` computes ``x @ dequant(w).T``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class QuantTensor:
    """Group-quantized 2-D weight in MLX layout (out, in)."""

    def __init__(self, w_q, scales, biases, bits: int, group_size: int):
        self.w_q = w_q  # (out, in * bits // 32) uint32
        self.scales = scales  # (out, in // group_size)
        self.biases = biases  # (out, in // group_size)
        self.bits = int(bits)
        self.group_size = int(group_size)

    @property
    def shape(self) -> tuple[int, int]:
        per_word = 32 // self.bits
        return (self.w_q.shape[0], self.w_q.shape[1] * per_word)

    def tree_flatten(self):
        return (self.w_q, self.scales, self.biases), (self.bits, self.group_size)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        return dequantize(self.w_q, self.scales, self.biases,
                          self.bits, self.group_size, dtype=dtype, xp=jnp)

    def __repr__(self):
        return f"QuantTensor{self.shape}[{self.bits}b/g{self.group_size}]"


def quantize(w: np.ndarray, bits: int = 4, group_size: int = 64):
    """MLX-semantics affine group quantization of (out, in) weights.

    Returns (w_q uint32, scales, biases) with shapes
    ((out, in*bits//32), (out, in//group_size), (out, in//group_size)).
    """
    out_dim, in_dim = w.shape
    assert in_dim % group_size == 0, (in_dim, group_size)
    n_levels = (1 << bits) - 1
    g = w.reshape(out_dim, in_dim // group_size, group_size).astype(np.float32)
    w_min = g.min(axis=-1)
    w_max = g.max(axis=-1)
    scales = (w_max - w_min) / n_levels
    scales = np.where(scales == 0, 1e-8, scales)
    biases = w_min
    q = np.round((g - biases[..., None]) / scales[..., None])
    q = np.clip(q, 0, n_levels).astype(np.uint32)
    q = q.reshape(out_dim, in_dim)

    per_word = 32 // bits
    q = q.reshape(out_dim, in_dim // per_word, per_word)
    shifts = (np.arange(per_word, dtype=np.uint32) * bits)[None, None, :]
    packed = np.bitwise_or.reduce(q << shifts, axis=-1).astype(np.uint32)
    return packed, scales.astype(np.float32), biases.astype(np.float32)


def unpack(w_q, bits: int, xp=np):
    """uint32-packed → (..., in) integer values in [0, 2^bits)."""
    per_word = 32 // bits
    mask = xp.uint32((1 << bits) - 1)
    shifts = (xp.arange(per_word) * bits).astype(xp.uint32)
    vals = (w_q[..., None] >> shifts) & mask
    return vals.reshape(*w_q.shape[:-1], w_q.shape[-1] * per_word)


def dequantize(w_q, scales, biases, bits: int, group_size: int,
               dtype=np.float32, xp=np):
    """→ (out, in) floating weights."""
    vals = unpack(w_q, bits, xp=xp).astype(dtype)
    out_dim, in_dim = vals.shape
    vals = vals.reshape(out_dim, in_dim // group_size, group_size)
    w = vals * scales[..., None].astype(dtype) + biases[..., None].astype(dtype)
    return w.reshape(out_dim, in_dim)


def quant_matmul(x: jnp.ndarray, q: QuantTensor, backend: str = "auto") -> jnp.ndarray:
    """``x @ dequant(q).T`` — x (..., in) → (..., out).

    backend="auto": on TPU, decode-shaped calls (few rows) use the fused
    Pallas dequant kernel — XLA's dequant-then-matmul materializes the fp
    weight matrix in HBM every step, which measured SLOWER than bf16 for
    the HBM-bound decode loop. Large-M calls (encoder/prefill) keep the XLA
    path, whose GEMM cost dominates and whose x tile would not fit VMEM.
    """
    if backend == "auto":
        import jax

        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        backend = (
            "pallas"
            if jax.default_backend() == "tpu" and rows <= 512
            else "xla"
        )
    if backend == "pallas":
        from whisper_mlx_tpu.ops.quant_pallas import quant_matmul_pallas

        return quant_matmul_pallas(x, q)
    w = q.dequantize(dtype=x.dtype)  # (out, in)
    return x @ w.T


def quant_rows(q: QuantTensor, rows: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize selected rows (embedding lookup): rows (...,) → (..., in).

    Gathers packed words + per-group affines for just the requested rows —
    O(tokens · d) instead of O(vocab · d).
    """
    w_q = q.w_q[rows]  # (..., in*bits//32)
    scales = q.scales[rows]
    biases = q.biases[rows]
    vals = unpack(w_q, q.bits, xp=jnp).astype(dtype)
    *lead, in_dim = vals.shape
    vals = vals.reshape(*lead, in_dim // q.group_size, q.group_size)
    w = vals * scales[..., None].astype(dtype) + biases[..., None].astype(dtype)
    return w.reshape(*lead, in_dim)


def quantize_params(params, bits: int = 4, group_size: int = 64):
    """Quantize every eligible linear in a whisper param pytree.

    Mirrors what mlx-community checkpoints quantize: all 2-D ``w`` linears
    whose input dim is a group multiple, plus the token embedding. Conv
    stems, LayerNorms and position tables stay fp.
    """

    def q_of(w_out_in: np.ndarray):
        w_q, scales, biases = quantize(w_out_in, bits, group_size)
        return QuantTensor(jnp.asarray(w_q), jnp.asarray(scales),
                           jnp.asarray(biases), bits, group_size)

    def walk(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2:
                w = np.asarray(node["w"], np.float32).T  # → (out, in)
                if w.shape[1] % group_size == 0:
                    new = {"w": q_of(w)}
                    if "b" in node:
                        new["b"] = node["b"]
                    return new
                return node
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    out = {"encoder": walk(params["encoder"]), "decoder": {}}
    for name, val in params["decoder"].items():
        if name == "token_emb":
            emb = np.asarray(val, np.float32)  # (vocab, d) is already (out, in)
            out["decoder"][name] = (
                q_of(emb) if emb.shape[1] % group_size == 0 else val
            )
        else:
            out["decoder"][name] = walk(val)
    return out


def quantize_jax(w: jnp.ndarray, bits: int = 4, group_size: int = 64):
    """Device-side quantization (same semantics as :func:`quantize`).

    numpy quantization of billion-param models takes ~15 min on this box's
    single CPU core; on an accelerator this runs in milliseconds — used to
    quantize freshly-loaded fp checkpoints for serving.
    """
    out_dim, in_dim = w.shape
    n_levels = (1 << bits) - 1
    g = w.reshape(out_dim, in_dim // group_size, group_size).astype(jnp.float32)
    w_min = g.min(axis=-1)
    w_max = g.max(axis=-1)
    scales = jnp.where(w_max == w_min, 1e-8, (w_max - w_min) / n_levels)
    biases = w_min
    q = jnp.clip(jnp.round((g - biases[..., None]) / scales[..., None]), 0, n_levels)
    q = q.reshape(out_dim, in_dim).astype(jnp.uint32)
    per_word = 32 // bits
    q = q.reshape(out_dim, in_dim // per_word, per_word)
    packed = jnp.zeros(q.shape[:2], jnp.uint32)
    for i in range(per_word):
        packed = packed | (q[..., i] << jnp.uint32(i * bits))
    return QuantTensor(packed, scales.astype(jnp.float32),
                       biases.astype(jnp.float32), bits, group_size)


def stack_quant(tensors: "list[QuantTensor]") -> QuantTensor:
    """Concatenate quantized weights along the output dim (MLX dim 0).

    Group quantization is per-output-row, so stacking is exact — the fused
    tensor dequantizes to the row-concatenation of the inputs. Used to fuse
    Q/K/V (and gate/up) projections into ONE dequant-matmul per step: the
    decode loop is launch- and HBM-bound, so 3 kernel calls over the same
    activations become 1 (VERDICT r1 item 3).
    """
    t0 = tensors[0]
    assert all(t.bits == t0.bits and t.group_size == t0.group_size for t in tensors)
    assert all(t.shape[1] == t0.shape[1] for t in tensors), [t.shape for t in tensors]
    return QuantTensor(
        jnp.concatenate([t.w_q for t in tensors], axis=0),
        jnp.concatenate([t.scales for t in tensors], axis=0),
        jnp.concatenate([t.biases for t in tensors], axis=0),
        t0.bits, t0.group_size,
    )


def dequantize_params(params, dtype=jnp.bfloat16):
    """Dequantize every QuantTensor in a pytree back to dense weights.

    Dequant-at-load serving mode: whisper-sized models fit HBM comfortably
    in bf16 (large-v3 ≈ 3.2 GiB of 16 GiB), so serving an mlx 4-bit
    checkpoint at full bf16 decode speed costs one load-time pass — the
    fused dequant kernels remain for memory-tight models (Qwen3-32B needs
    the 4-bit residency, parallel/memory_plan.py). QuantTensors dequantize
    on device (milliseconds); MLX stores linears (out, in) while fp
    pytrees store (in, out), so 2-D weights transpose back — EXCEPT
    embedding tables, which are (vocab, d) in both layouts (recognized by
    the ``embed`` / ``token_emb`` key).
    """

    def walk(node, key=None):
        if isinstance(node, QuantTensor):
            w = node.dequantize(dtype=dtype)
            return w if key in ("embed", "token_emb") else w.T
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def fuse_qwen_projections(params: dict) -> dict:
    """Fuse each qwen layer's quantized projections: q/k/v → one ``qkv``
    dequant-matmul and gate/up → one ``gate_up`` (decode is launch- and
    weight-stream-bound at low batch; 5 matmuls per layer become 3).

    Row-stacking quantized tensors is exact (group quantization is
    per-output-row, see :func:`stack_quant`); models/qwen.py decode_step
    splits the fused outputs at the known head/intermediate widths.
    """

    def fused_layer(blk: dict) -> dict:
        attn, mlp = blk["attn"], blk["mlp"]
        out = dict(blk)
        if all(isinstance(attn[k]["w"], QuantTensor) for k in ("q", "k", "v")):
            new_attn = {
                "qkv": {"w": stack_quant([attn["q"]["w"], attn["k"]["w"],
                                          attn["v"]["w"]])},
                "o": attn["o"],
            }
            if "b" in attn["q"]:  # qwen2 attention_bias: all three carry b
                new_attn["qkv"]["b"] = jnp.concatenate(
                    [attn["q"]["b"], attn["k"]["b"], attn["v"]["b"]])
            for k in ("q_norm", "k_norm"):  # qwen3 qk-norm params
                if k in attn:
                    new_attn[k] = attn[k]
            out["attn"] = new_attn
        if all(isinstance(mlp[k]["w"], QuantTensor) for k in ("gate", "up")):
            out["mlp"] = {
                "gate_up": {"w": stack_quant([mlp["gate"]["w"], mlp["up"]["w"]])},
                "down": mlp["down"],
            }
        return out

    fused = dict(params)
    fused["layers"] = [fused_layer(blk) for blk in params["layers"]]
    return fused


def fuse_whisper_qkv(params: dict) -> dict:
    """Add fused ``qkv`` projections to every *self*-attention block whose
    q/k/v weights are QuantTensors (cross-attention K/V are precomputed per
    window from the encoder states — models/whisper.py cross_kv — so only
    self-attention shares activations across the three projections).

    The original q/k/v entries are replaced by the fused one (decode never
    touches them afterwards; keeping both would double weight HBM).
    Whisper's k projection has no bias — the fused bias splices zeros there,
    which is bit-identical.
    """

    def fuse_attn(attn: dict) -> dict:
        if not all(isinstance(attn[k]["w"], QuantTensor) for k in ("q", "k", "v")):
            return attn
        qw, kw, vw = attn["q"]["w"], attn["k"]["w"], attn["v"]["w"]
        d = qw.shape[0]
        zeros = jnp.zeros((d,), jnp.float32)
        bias = jnp.concatenate([
            attn["q"].get("b", zeros), zeros, attn["v"].get("b", zeros),
        ])
        return {
            "qkv": {"w": stack_quant([qw, kw, vw]), "b": bias},
            "o": attn["o"],
        }

    def walk_blocks(blocks: list, keys: tuple) -> list:
        out = []
        for blk in blocks:
            blk = dict(blk)
            for key in keys:
                if key in blk:
                    blk[key] = fuse_attn(blk[key])
            out.append(blk)
        return out

    fused = dict(params)
    fused["encoder"] = dict(params["encoder"])
    fused["encoder"]["blocks"] = walk_blocks(params["encoder"]["blocks"], ("attn",))
    fused["decoder"] = dict(params["decoder"])
    # decoder: fuse self-attention only; cross_attn q runs alone (k/v cached)
    fused["decoder"]["blocks"] = walk_blocks(params["decoder"]["blocks"], ("attn",))
    return fused
