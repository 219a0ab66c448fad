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

import os

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


@jax.tree_util.register_pytree_node_class
class NativeQuantTensor:
    """Group-quantized weight with codes resident in a NATIVE integer dtype
    (u4 for 4-bit on TPU, uint8 otherwise) instead of uint32-packed words.

    Why: measured on v5e (scripts/probe_quant_xla.py, runtime-arg operands),
    XLA streams native s4 codes with the int→bf16 convert fused into the
    dequant einsum at a 224-step 32L-equivalent of 0.46 s vs 0.59 s dense
    bf16 and 0.82 s for the fused Pallas kernel — the opaque pallas_call
    blocks XLA from overlapping weight streams with attention, and its
    single-DMA-stream tops out ~330 GB/s. So the decode loops convert
    QuantTensor params to this form *inside* the jit (s4 cannot cross a jit
    boundary on this backend — CLAUDE.md) via :func:`prepare_native_params`.

    Matmul algebra (exact affine dequant, bias folded via activation group
    sums — same as ops/quant_pallas.py):

        partial[m,n,g] = sum_s x[m,g,s] * codes[n,g,s]
        y[m,n] = sum_g partial[m,n,g] * scales[n,g] + xg[m,g] @ biases[n,g]
    """

    def __init__(self, codes, scales, biases, bits: int, group_size: int):
        self.codes = codes  # (out, in) s4/int8 values in [0, 2^bits)
        self.scales = scales  # (out, in // group_size)
        self.biases = biases  # (out, in // group_size)
        self.bits = int(bits)
        self.group_size = int(group_size)

    @property
    def shape(self) -> tuple[int, int]:
        return self.codes.shape

    def tree_flatten(self):
        return (self.codes, self.scales, self.biases), (self.bits, self.group_size)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        out_dim, in_dim = self.codes.shape
        g = self.codes.astype(dtype).reshape(out_dim, in_dim // self.group_size,
                                             self.group_size)
        w = (g * self.scales[..., None].astype(dtype)
             + self.biases[..., None].astype(dtype))
        return w.reshape(out_dim, in_dim)

    def __repr__(self):
        return (f"NativeQuantTensor{self.shape}"
                f"[{self.bits}b/g{self.group_size}/{self.codes.dtype}]")


@jax.tree_util.register_pytree_node_class
class DenseWeight:
    """A dequantized-per-call linear weight in its NATURAL (out, in) layout.

    Produced by prepare_native_params' large-M mode. Kept (out, in) —
    transposing under the optimization_barrier left the layout to roulette
    and measured ~6 ms/step of per-step fixup in the decode loop; the
    consumer instead contracts the minor axis directly (``x @ w.T`` form,
    the MXU-preferred transposed-rhs dot, no physical transpose).
    """

    def __init__(self, w):
        self.w = w  # (out, in)

    @property
    def shape(self):
        return self.w.shape

    def tree_flatten(self):
        return (self.w,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def to_native(q: QuantTensor) -> NativeQuantTensor:
    """Unpack a QuantTensor's uint32 words into native-dtype codes.

    Call inside jit (the decode loop's trace) — ~ms one-time cost per call,
    after which every step streams 4-bit codes at native density.
    """
    vals = unpack(q.w_q, q.bits, xp=jnp)  # uint32, values in [0, 2^bits)
    if q.bits == 4 and jax.default_backend() == "tpu":
        # packed u4 residency: half the bytes; codes 0..15 need UNSIGNED 4-bit
        vals = vals.astype(jnp.int32).astype(jnp.uint4)
    else:
        vals = vals.astype(jnp.uint8)
    # materialize the converted codes NOW: without the barrier XLA may sink
    # the unpack into the decode while_loop and re-shift the packed words
    # every step instead of streaming the native codes
    vals = jax.lax.optimization_barrier(vals)
    return NativeQuantTensor(vals, q.scales, q.biases, q.bits, q.group_size)


def prepare_native_params(params, embed_keys: tuple = ("embed", "token_emb"),
                          embed_dtype=jnp.bfloat16, decode_rows: int = 1):
    """QuantTensor → decode-loop-ready weights, inside jit.

    ``decode_rows`` = the decode loop's matmul M (its token-batch rows):

    - **small M (≤16)**: linears become NativeQuantTensor grouped-einsum
      matmuls — codes streamed at native 4-bit density with the convert
      fused (measured 2.35× the Pallas kernel and faster than bf16 at M=1;
      the (M, N, G) f32 partial XLA materializes per dot is tiny here).
    - **large M** (batched whisper decode): the materialized partial costs
      ~8 ms/step at B=56 — MORE than streaming bf16 weights, so linears are
      instead dequantized ONCE per call (optimization_barrier keeps XLA
      from sinking the dequant into the loop) and the loop runs at exactly
      dense-bf16 speed while only the packed codes stay resident between
      calls.

    Embedding tables (matched by dict key) are always dequantized once per
    call to ``embed_dtype``: the logits head's N (vocab) is too large for
    the grouped partial, and a plain dense head + plain gather run at full
    XLA speed; values are bit-identical to dequantize(). No-op for
    non-quantized trees.
    """
    native = decode_rows <= 16

    def densify(q) -> DenseWeight:
        w = q.dequantize(dtype=embed_dtype)  # natural (out, in) layout
        return DenseWeight(jax.lax.optimization_barrier(w))

    def walk(node):
        if isinstance(node, QuantTensor):
            return to_native(node) if native else densify(node)
        if isinstance(node, NativeQuantTensor):
            if not native:
                return densify(node)
            # uint8-resident tree (promote_resident_native): upgrade 4-bit
            # codes to u4 for this call — halves the loop's code stream
            if (node.bits == 4 and node.codes.dtype == jnp.uint8
                    and jax.default_backend() == "tpu"):
                return NativeQuantTensor(
                    node.codes.astype(jnp.uint4), node.scales, node.biases,
                    node.bits, node.group_size)
            return node
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in embed_keys and isinstance(v, QuantTensor):
                    out[k] = v.dequantize(dtype=embed_dtype)
                elif k in embed_keys and isinstance(v, NativeQuantTensor):
                    # promoted trees keep the embed native (uint8 gather +
                    # grouped head) so the one-jit and per-step loops run
                    # IDENTICAL math; large-M callers densify instead
                    out[k] = v if native else jax.lax.optimization_barrier(
                        v.dequantize(dtype=embed_dtype))
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v) for v in node)
        return node

    return walk(params)


def promote_resident_native(params, budget_bytes: int | None = 9 << 30):
    """EAGERLY convert packed QuantTensor weights to uint8-code
    NativeQuantTensor residency, for PER-STEP jit paths (streaming SSE
    loop, continuous batch engine) where u4/s4 cannot cross the jit
    boundary on this backend but uint8 can. Measured at M=1 on v5e
    (probe_quant_xla.py): uint8 codes 0.52 s 32L-equiv vs 1.20 s for the
    per-step Pallas kernel and 0.57 s dense bf16.

    Costs 1 B/elt of HBM (2× the packed 4-bit form), so it gates on
    ``budget_bytes`` (None = always). One-jit decode loops upgrade these
    codes to u4 in-jit via prepare_native_params. Returns
    ``(params, promoted?)``.
    """
    qts: list[QuantTensor] = []

    def scan(node):
        if isinstance(node, QuantTensor):
            qts.append(node)
        elif isinstance(node, dict):
            for v in node.values():
                scan(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                scan(v)

    scan(params)
    if not qts:
        return params, False
    total = sum(q.shape[0] * q.shape[1] for q in qts)
    if budget_bytes is not None and total > budget_bytes:
        return params, False

    def walk(node):
        if isinstance(node, QuantTensor):
            vals = unpack(node.w_q, node.bits, xp=jnp).astype(jnp.uint8)
            return NativeQuantTensor(vals, node.scales, node.biases,
                                     node.bits, node.group_size)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params), True


def prepare_mbt_params(params, embed_keys: tuple = ("embed", "token_emb"),
                       max_k: int | None = None, max_n: int | None = None):
    """EAGERLY re-layout packed QuantTensor linears for the multi-buffered
    DMA-ring kernel (ops/quant_pallas_mb): weights transpose ONCE to the
    (K//per_word, N) slab layout and ride the params tree as QuantTensorT,
    so decode loops stream them with a DEPTH-deep manual DMA ring instead
    of the production kernel's single BlockSpec prefetch.

    Embedding tables (matched by dict key) stay packed — they are gathered
    row-wise (quant_rows), which needs the natural (out, in) layout.
    ``max_k`` (or WTPU_MBT_MAX_K) keeps very-deep-K linears (e.g. qwen
    down_proj K=18944, where the sweep showed no mb win) on the
    production kernel. ``max_n`` (or WTPU_MBT_MAX_N, default 65536) keeps
    vocab-sized heads there too — the mbt kernel holds the whole (Mp, N)
    output and (G, N) scales/biases in VMEM, which overflows at N=152k
    (measured: qwen lm_head at prefill M=128 wants 159 MB of 128 MB).
    Returns a new tree; no-op without QuantTensor leaves.
    """
    from whisper_mlx_tpu.ops.quant_pallas_mb import transpose_quant

    if max_k is None:
        mk = os.environ.get("WTPU_MBT_MAX_K", "")
        max_k = int(mk) if mk else None
    if max_n is None:
        mn = os.environ.get("WTPU_MBT_MAX_N", "")
        max_n = int(mn) if mn else 65536

    def walk(node):
        if isinstance(node, QuantTensor):
            n, k = node.shape
            if (max_k is not None and k > max_k) or n > max_n:
                return node
            return transpose_quant(node)
        if isinstance(node, dict):
            return {k: (v if k in embed_keys and isinstance(v, QuantTensor)
                        else walk(v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def native_group_matmul(x: jnp.ndarray, q: NativeQuantTensor) -> jnp.ndarray:
    """``x @ dequant(q).T`` over native codes — x (..., in) → (..., out).

    Decode-shaped calls use the two-einsum grouped form (codes streamed at
    native density, convert fused by XLA). Per-call economics: the grouped
    form's materialized f32 partial costs ~8·M·N·G bytes of traffic, the
    dense fallback ~4.5·N·K — grouped wins for M ≲ 36 regardless of N.
    Large-M calls (prefill / encoder shapes) fall back to
    dequant-then-matmul, where the GEMM dominates anyway; a partial-size
    cap bounds the transient HBM spike for huge-vocab heads.
    """
    *lead, in_dim = x.shape
    m = 1
    for d in lead:
        m *= d
    n, groups = q.scales.shape
    gs = q.group_size
    if m > 32 or m * n * groups * 4 > 768 * 1024 * 1024:
        w = q.dequantize(dtype=x.dtype)  # (out, in)
        return x @ w.T
    x2 = x.reshape(m, in_dim)
    cdt = x.dtype  # compute dtype follows activations: fp32 parity path exact
    xg = x2.astype(jnp.float32).reshape(m, groups, gs).sum(-1)  # (M, G)
    partial = jnp.einsum(
        "mgs,ngs->mng",
        x2.reshape(m, groups, gs).astype(cdt),
        q.codes.reshape(n, groups, gs).astype(cdt),
        preferred_element_type=jnp.float32,
    )
    strategy = os.environ.get("WTPU_QMM", "einsum")
    if strategy == "reduce":
        # elementwise-mul + reduce epilogue: output-fusable into the dot,
        # avoiding a materialized (M, N, G) partial where the einsum form
        # fails to fuse in-context
        y = jnp.sum(partial * q.scales[None, :, :], axis=-1)
    else:
        y = jnp.einsum("mng,ng->mn", partial, q.scales)
    y = y + xg @ q.biases.T
    return y.astype(x.dtype).reshape(*lead, n)


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


def quant_matmul(x: jnp.ndarray, q, backend: str = "auto") -> jnp.ndarray:
    """``x @ dequant(q).T`` — x (..., in) → (..., out).

    NativeQuantTensor (decode loops, via prepare_native_params) takes the
    grouped-einsum path — measured fastest on v5e (beats dense bf16 AND the
    Pallas kernel; probe_quant_xla.py). For packed QuantTensor,
    backend="auto": on TPU, decode-shaped calls (few rows) use the fused
    Pallas dequant kernel — XLA's dequant-then-matmul materializes the fp
    weight matrix in HBM every step, which measured SLOWER than bf16 for
    the HBM-bound decode loop. Large-M calls (encoder/prefill) keep the XLA
    path, whose GEMM cost dominates and whose x tile would not fit VMEM.
    """
    if isinstance(q, DenseWeight):
        return x @ q.w.astype(x.dtype).T  # transposed-rhs dot, no copy
    if isinstance(q, NativeQuantTensor):
        return native_group_matmul(x, q)
    if type(q).__name__ == "A8Tensor":
        # W8A8 MXU path (ops/quant_a8.py, prepare_a8_params): decode-shaped
        # calls ride the s8×s8 DMA-ring kernel; large-M (prefill) dequants
        # once and takes the XLA GEMM like the other resident layouts
        from whisper_mlx_tpu.ops.quant_a8 import a8_matmul

        import jax

        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        max_rows = int(os.environ.get("WTPU_QMM_PALLAS_MAX_ROWS", "512"))
        if jax.default_backend() == "tpu" and rows <= max_rows:
            return a8_matmul(x, q)
        return x @ q.dequantize(dtype=x.dtype).T
    if not isinstance(q, QuantTensor):
        from whisper_mlx_tpu.ops.quant_pallas_mb import (
            QuantTensorT, quant_matmul_mbt)

        if isinstance(q, QuantTensorT):
            # pre-transposed resident layout (prepare_mbt_params): the
            # multi-buffered DMA-ring kernel for decode-shaped calls on
            # TPU; large-M calls (prefill) and other backends dequant +
            # XLA-GEMM, mirroring the packed-path policy below.
            import jax

            rows = 1
            for d in x.shape[:-1]:
                rows *= d
            max_rows = int(os.environ.get("WTPU_QMM_PALLAS_MAX_ROWS", "512"))
            if jax.default_backend() == "tpu" and rows <= max_rows:
                return quant_matmul_mbt(x, q)
            return x @ q.dequantize(dtype=x.dtype).T
    if backend == "auto":
        import jax

        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        max_rows = int(os.environ.get("WTPU_QMM_PALLAS_MAX_ROWS", "512"))
        backend = (
            "pallas"
            if jax.default_backend() == "tpu" and rows <= max_rows
            else "xla"
        )
    if backend == "pallas":
        mb = os.environ.get("WTPU_QMM_MB", "")
        if mb:
            # opt-in multi-buffered DMA-ring kernel (ops/quant_pallas_mb):
            # "depth" or "depth,tile_n" — e2e sweep scripts/bench_quant_mb.py
            from whisper_mlx_tpu.ops.quant_pallas_mb import quant_matmul_mb

            parts = mb.split(",")
            depth = int(parts[0])
            tile_n = int(parts[1]) if len(parts) > 1 else 512
            return quant_matmul_mb(x, q, tile_n=tile_n, depth=depth)
        from whisper_mlx_tpu.ops.quant_pallas import quant_matmul_pallas

        return quant_matmul_pallas(x, q)
    w = q.dequantize(dtype=x.dtype)  # (out, in)
    return x @ w.T


def quant_rows(q, rows: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize selected rows (embedding lookup): rows (...,) → (..., in).

    Gathers packed words + per-group affines for just the requested rows —
    O(tokens · d) instead of O(vocab · d). Accepts NativeQuantTensor too
    (uint8 codes gather directly).
    """
    if isinstance(q, NativeQuantTensor):
        vals = q.codes[rows].astype(dtype)  # (..., in)
        *lead, in_dim = vals.shape
        vals = vals.reshape(*lead, in_dim // q.group_size, q.group_size)
        w = (vals * q.scales[rows][..., None].astype(dtype)
             + q.biases[rows][..., None].astype(dtype))
        return w.reshape(*lead, in_dim)
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


_DENSE_DECODE_CACHE: dict[int, tuple] = {}


def maybe_dense_decode_params(params, rows: int, dtype=jnp.bfloat16):
    """E2E-measured serving policy for packed 4/8-bit checkpoints.

    ``rows`` = the decode loop's matmul M (windows × beam/best_of).

    - **rows > 16** (batched whisper decode): eagerly dequantize ONCE on
      device (~10 ms) and pass DENSE weights as ordinary jit arguments —
      the loop then runs at exactly dense-bf16 speed. Every in-jit
      alternative measured slower on v5e at B=56 (bench_history r3):
      fused Pallas 202.6 RTF, in-jit native-u4 grouped einsum 230.9,
      in-jit dequant + optimization_barrier 251 (XLA re-copies the
      barrier'd temps per step) vs 315 for dense-argument weights.
    - **rows ≤ 16**: keep the packed tree — the fused Pallas kernel's 4×
      smaller weight stream wins end-to-end at few rows (qwen2.5-7b B=1:
      48.9 tok/s Pallas vs 11.8 native grouped, bench_history r3).

    The dense tree is cached (strong ref to the packed tree keeps its id
    stable) so the temperature-fallback ladder re-uses one conversion.
    """
    # WTPU_DENSE_ROWS_MIN overrides the measured 16-row boundary (set huge
    # to force packed residency at batch — re-measuring the policy against
    # new kernels, e.g. the multi-buffered DMA ring in quant_pallas_mb)
    if rows <= int(os.environ.get("WTPU_DENSE_ROWS_MIN", "16")):
        if os.environ.get("WTPU_FEWROW_MBT", "0") == "1":
            # opt-in: few-row decode rides the transposed DMA-ring layout
            # (u8 dequant) instead of the packed production kernel;
            # cached so the fallback ladder reuses one transpose
            key = ("mbt", id(params))
            hit = _DENSE_DECODE_CACHE.get(key)
            if hit is not None and hit[0] is params:
                return hit[1]
            mbt = prepare_mbt_params(params)
            _DENSE_DECODE_CACHE[key] = (params, mbt)
            return mbt
        return params
    key = id(params)
    hit = _DENSE_DECODE_CACHE.get(key)
    if hit is not None and hit[0] is params:
        return hit[1]
    qts = jax.tree_util.tree_leaves(
        params, is_leaf=lambda n: isinstance(n, QuantTensor))
    if not any(isinstance(t, QuantTensor) for t in qts):
        return params
    # fused qkv only helps the packed/Pallas path; split it back first
    # (dense fused matmuls measured +1.9 ms/step at B=56)
    dense = dequantize_params(unfuse_whisper_qkv(params), dtype=dtype)
    if len(_DENSE_DECODE_CACHE) > 2:
        _DENSE_DECODE_CACHE.clear()
    _DENSE_DECODE_CACHE[key] = (params, dense)
    return dense


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


def unfuse_whisper_qkv(params: dict) -> dict:
    """Inverse of :func:`fuse_whisper_qkv` (exact: row-slicing the stacked
    QuantTensor and its per-row affines).

    Why: fusing wins only on the PACKED/Pallas path (fewer kernel
    launches); on dense-argument weights the fused (d, 3d) matmul measured
    +1.9 ms/step vs split projections at B=56 (288.7 vs 314.9 RTF, r3) —
    so maybe_dense_decode_params unfuses before dequantizing. Only valid
    for whisper-style equal-width q/k/v (shape (3d, d)); non-matching
    shapes are left alone.
    """

    def split_attn(attn: dict) -> dict:
        qkv = attn.get("qkv")
        if qkv is None or not isinstance(qkv.get("w"), QuantTensor):
            return attn
        w = qkv["w"]
        out_dim, in_dim = w.shape
        if out_dim != 3 * in_dim:
            return attn  # not whisper-shaped (e.g. GQA fused qkv)
        d = in_dim
        gs = w.group_size
        per_word = 32 // w.bits

        def rows(lo, hi):
            return QuantTensor(w.w_q[lo:hi], w.scales[lo:hi],
                               w.biases[lo:hi], w.bits, gs)

        b = qkv.get("b")
        out = {
            "q": {"w": rows(0, d)},
            "k": {"w": rows(d, 2 * d)},  # whisper k has no bias
            "v": {"w": rows(2 * d, 3 * d)},
            "o": attn["o"],
        }
        if b is not None:
            out["q"]["b"] = b[:d]
            out["v"]["b"] = b[2 * d:]
        return out

    def walk_blocks(blocks: list) -> list:
        out = []
        for blk in blocks:
            blk = dict(blk)
            if "attn" in blk:
                blk["attn"] = split_attn(blk["attn"])
            out.append(blk)
        return out

    un = dict(params)
    for part in ("encoder", "decoder"):
        if part in un and isinstance(un[part], dict) and "blocks" in un[part]:
            un[part] = dict(un[part])
            un[part]["blocks"] = walk_blocks(un[part]["blocks"])
    return un


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
