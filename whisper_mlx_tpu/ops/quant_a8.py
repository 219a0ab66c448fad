"""W8A8 MXU decode path: per-channel int8 weights × per-token int8 activations.

The r3 frontier study (docs/performance.md "the B=1 wall") proved the
fused 4-bit dequant-matmul kernels are VPU-bound at LLM B=1 — every
dequant strategy (planar/u8/i8) pays 2-5 VPU ops per weight value before
the MXU sees it, pinning the big matvecs at 150-350 µs/layer while the
dense bf16 stream runs at the HBM roofline. Group-wise (64, N) scales are
the reason the arithmetic can't leave the VPU: a whole-K s8×s8 MXU dot
cannot apply scales that change every 64 rows of K.

This module removes the constraint by REQUANTIZING the checkpoint at load
time to symmetric per-CHANNEL int8 (one scale per output column, zero
point absorbed into the codes):

    w ≈ s_n · c[k, n],  c ∈ [-127, 127]

so the whole decode matvec becomes ONE s8×s8 `dot_general` on the MXU
(int32 accumulate) plus a single (M, N) scale multiply — zero per-K-value
VPU work; the weight stream is the only cost. Activations quantize
per-token (dynamic symmetric, amax/127). Numerics: the int8 re-quant grid
(|w|max/127 per channel) sits well below the source int4 grid's own step
(|w|max_g/~15 per group), so W8 re-quant of a 4-bit checkpoint is
near-lossless; the A8 term is the standard dynamic-activation trade and
is measured, not assumed (tests/test_quant.py::test_a8_*).

Streamed bytes are 2× the packed-int4 kernels' — and still much faster,
because those kernels run VPU-bound while this one rides the DMA ring at
~700-920 GB/s (dispatch-floor-corrected probes + e2e, r4) with the MXU
idle-waiting. Measured e2e: qwen2.5-7b B=1 decode 52.2 → **84.9 tok/s**
(scripts/bench_qwen.py QB_A8=1, vocab head packed via WTPU_A8_MAX_N).
Qwen-7B fits easily (≈7.6 GiB); 32B does NOT fit int8 on one 16 GiB chip
— that family stays on the packed-int4 kernels (or shards TP>1).

Reference workload: mlx-lm 4-bit ``quantized_matmul`` at B=1 decode
(SURVEY.md §2.3); this is an above-parity serving mode (WTPU_QWEN_A8=1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@jax.tree_util.register_pytree_node_class
class A8Tensor:
    """Per-channel-int8 re-quantized linear, resident in the MXU layout.

    ``codes`` (K, Np) int8 — natural matmul orientation, N padded to a
    ``tile_n`` multiple; ``scale`` (1, Np) f32 per-channel. ``shape``
    reports the logical (out, in) like QuantTensor.
    """

    def __init__(self, codes, scale, n_orig: int, tile_n: int, depth: int,
                 contig: bool = False):
        self.codes = codes  # (K, Np) — or (n_tiles, K, tile_n) when contig
        self.scale = scale
        self.n_orig = int(n_orig)
        self.tile_n = int(tile_n)
        self.depth = int(depth)
        self.contig = bool(contig)

    @property
    def shape(self):
        k = self.codes.shape[1] if self.contig else self.codes.shape[0]
        return (self.n_orig, k)

    def _codes_2d(self):
        if not self.contig:
            return self.codes
        t, k, tn = self.codes.shape
        return self.codes.transpose(1, 0, 2).reshape(k, t * tn)

    def dequantize(self, dtype=jnp.float32):
        """(N, K) fp weights — the prefill/large-M fallback path."""
        w = self._codes_2d().astype(jnp.float32) * self.scale  # (K, Np)
        return w[:, : self.n_orig].T.astype(dtype)

    def tree_flatten(self):
        return (self.codes, self.scale), (self.n_orig, self.tile_n,
                                          self.depth, self.contig)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def __repr__(self):
        return f"A8Tensor(out={self.n_orig}, in={self.codes.shape[0]})"


def requant_a8(q, tile_n: int = 512, depth: int = 4,
               contig: bool = True) -> A8Tensor:
    """Re-quantize a QuantTensor/DenseWeight to per-channel symmetric int8
    (eager, once at load). The group-wise zero point folds into the codes.

    ``contig`` pre-tiles the codes to (n_tiles, K, tile_n) so each ring
    slab DMA is ONE flat HBM block instead of K strided ``tile_n``-byte
    bursts. (The r4 probe that motivated this also carried a ~150 µs/iter
    dispatch-floor phantom — see docs/performance.md "Measurement
    artifact"; corrected, both layouts stream near the HBM rate, and
    contig stays the default for its per-call pad-free addressing.)
    """
    def rows_to_a8(w):
        amax = jnp.max(jnp.abs(w), axis=1)  # (rows,)
        s = jnp.maximum(amax, 1e-12) / 127.0
        c = jnp.clip(jnp.round(w / s[:, None]), -127, 127).astype(jnp.int8)
        return c, s

    import os as _os

    chunk = int(_os.environ.get("WTPU_A8_CHUNK_ROWS", "16384"))
    if hasattr(q, "dequantize"):
        n, k = q.shape
        if chunk and n > chunk and hasattr(q, "w_q"):
            # Row-chunked conversion: a whole-tensor dequantize of the 14B
            # 152k×5120 head materializes ~9 GiB of unpack transients
            # (shifted int32 + f32 values) — measured RESOURCE_EXHAUSTED
            # on a 16 GiB chip (r5). Per-channel int8 scales are row-local,
            # so chunking over N is exact. The host fetch per chunk is a
            # true sync on the axon backend (block_until_ready acks at
            # dispatch), letting each chunk's transients free before the
            # next allocates.
            parts_c, parts_s = [], []
            for i in range(0, n, chunk):
                sl = type(q)(q.w_q[i:i + chunk], q.scales[i:i + chunk],
                             q.biases[i:i + chunk], q.bits, q.group_size)
                c, s = rows_to_a8(sl.dequantize(jnp.float32))
                np.asarray(s[:1])
                parts_c.append(c)
                parts_s.append(s)
            codes = jnp.concatenate(parts_c, axis=0)
            scale = jnp.concatenate(parts_s, axis=0)
        else:
            codes, scale = rows_to_a8(q.dequantize(jnp.float32))  # (N, K)
    else:  # raw array
        w = jnp.asarray(q, jnp.float32)
        n, k = w.shape
        codes, scale = rows_to_a8(w)
    np_ = _round_up(n, tile_n)
    codes_t = jnp.zeros((k, np_), jnp.int8).at[:, :n].set(codes.T)
    scale_t = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(scale)
    if contig:
        n_tiles = np_ // tile_n
        codes_t = codes_t.reshape(k, n_tiles, tile_n).transpose(1, 0, 2)
    return A8Tensor(codes_t, scale_t, n, tile_n, depth, contig=contig)


def _a8_kernel(xq_ref, sn_ref, wq_hbm, out_ref, wq_buf, sem,
               *, tile_n: int, depth: int, n_tiles: int, contig: bool):
    """DEPTH-deep DMA ring over (K, tile_n) int8 slabs; per tile ONE
    s8×s8 MXU dot (int32 accumulate) + the per-channel scale multiply.
    Same ring discipline as ops/quant_pallas_mb._mbt_kernel. ``contig``
    slabs are flat HBM blocks (wq_hbm (n_tiles, K, tile_n))."""

    def _src(t):
        return wq_hbm.at[t] if contig else wq_hbm.at[:, pl.ds(t * tile_n, tile_n)]

    def start(t, slot):
        pltpu.make_async_copy(_src(t), wq_buf.at[slot], sem.at[slot]).start()

    def wait(t, slot):
        pltpu.make_async_copy(_src(t), wq_buf.at[slot], sem.at[slot]).wait()

    for d in range(depth):
        start(d, d)

    xq = xq_ref[:]  # (Mp, K) int8

    def body(t, carry):
        slot = jax.lax.rem(t, depth)
        wait(t, slot)
        acc = jax.lax.dot_general(
            xq, wq_buf[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (Mp, TILE_N) exact
        nxt = t + depth

        @pl.when(nxt < n_tiles)
        def _():
            start(nxt, slot)

        sn = sn_ref[:, pl.ds(t * tile_n, tile_n)]  # (1, TILE_N) f32
        out_ref[:, pl.ds(t * tile_n, tile_n)] = acc.astype(jnp.float32) * sn
        return carry

    jax.lax.fori_loop(0, n_tiles, body, 0)


def a8_matmul(x: jnp.ndarray, at: A8Tensor, interpret: bool = False) -> jnp.ndarray:
    """``x @ dequant(at).T`` with per-token dynamic int8 activations.

    x (..., K) → (..., N). The Pallas call streams the int8 codes through
    a manual DMA ring and the MXU does ALL the arithmetic; activation
    quantization (amax/127 per row) and the sx·out fold are a handful of
    XLA elementwise ops on (M, K)/(M, N) — negligible next to the stream.
    """
    *lead, K = x.shape
    assert K == at.shape[1], (K, at.shape)
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    Mp = _round_up(max(M, 8), 8)
    tile_n, depth = at.tile_n, at.depth
    if at.contig:
        n_tiles, kp, _ = at.codes.shape
        Np = n_tiles * tile_n
    else:
        kp, Np = at.codes.shape
        n_tiles = Np // tile_n
    depth = min(depth, n_tiles)

    import os

    # The kernel keeps its (Mp, Np) f32 output (plus the ring scratch and
    # the xq tile) resident in VMEM — fine for decode rows, fatal for
    # prefill-sized calls against vocab-wide heads (M=128 × N=152k ≈ 78 MB
    # → runtime VMEM exhaustion). Big-footprint calls take the dequant-GEMM
    # path instead, mirroring the packed-kernel policy in ops/quant.py.
    vmem_bytes = (Mp * Np * 4 + min(depth, n_tiles) * kp * tile_n
                  + Mp * K + 4 * Np)
    max_mb = float(os.environ.get("WTPU_A8_MAX_VMEM_MB", "48"))
    if vmem_bytes > max_mb * 1e6:
        return (x2 @ at.dequantize(dtype=x.dtype).T).reshape(
            *lead, at.n_orig)

    xf = x2.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    if os.environ.get("WTPU_A8_XLA", "0") == "1":
        # pure-XLA lowering: let XLA stream the s8 codes itself (its dense
        # weight stream measured ~780 GB/s vs the manual ring's ~430 —
        # scripts/bench_qwen_matmuls.py / /tmp probes r4)
        acc = jax.lax.dot_general(
            xq, at._codes_2d(), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * at.scale
        out = out[:, : at.n_orig] * sx
        return out.astype(x.dtype).reshape(*lead, at.n_orig)

    xq_pad = jnp.zeros((Mp, K), jnp.int8).at[:M].set(xq)

    out = pl.pallas_call(
        functools.partial(_a8_kernel, tile_n=tile_n, depth=depth,
                          n_tiles=n_tiles, contig=at.contig),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # per-channel scales
            pl.BlockSpec(memory_space=pltpu.HBM),   # codes STAY in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((depth, kp, tile_n), jnp.int8),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xq_pad, at.scale, at.codes)
    out = out[:M, : at.n_orig] * sx  # fold the per-token activation scale
    return out.astype(x.dtype).reshape(*lead, at.n_orig)


def prepare_a8_params(params, embed_keys: tuple = ("embed", "token_emb"),
                      tile_n: int = 512, depth: int = 4,
                      max_n: int | None = None,
                      free_source: bool | None = None,
                      skip_keys: tuple | None = None):
    """EAGERLY re-quantize every QuantTensor linear in the tree to
    A8Tensor (per-channel int8, MXU layout). Embedding tables stay packed
    (row-gathered). ``max_n`` optionally keeps vocab-sized heads on the
    packed kernels (default: include them — the a8 kernel's VMEM
    footprint is (Mp, Np)·4 output + (1, Np) scales, which fits even at
    N=152k, unlike the mbt kernel's (G, N) scale spread).

    ``free_source`` (env ``WTPU_A8_FREE_SRC=1``) deletes each packed
    source buffer immediately after its A8Tensor is built, so conversion
    peak HBM is ~one tree instead of two. Required for qwen2.5-14B on a
    16 GiB chip (int4 7.7 GiB + int8 14.6 GiB both resident otherwise —
    measured RESOURCE_EXHAUSTED, r5). The caller's original tree is
    dead after this call when enabled — only use as
    ``params = prepare_a8_params(params, free_source=True)``."""
    import os

    from whisper_mlx_tpu.ops.quant import QuantTensor

    if max_n is None:
        mn = os.environ.get("WTPU_A8_MAX_N", "")
        max_n = int(mn) if mn else None
    if free_source is None:
        free_source = os.environ.get("WTPU_A8_FREE_SRC", "0") == "1"
    if skip_keys is None:
        # Mixed-kernel policy: linears named here stay on the packed int4
        # kernels. Motivated by the r5 7B decode-shape isolates
        # (scripts/bench_qwen_matmuls.py): `down` (K=18944, N=3584) runs
        # 231.5 µs on a8 vs 144.4 µs on the mbt ring — int8 codes stream
        # 2× the int4 bytes, and at that K the kernel is bandwidth-bound,
        # so the MXU s8×s8 win doesn't cover the doubled stream (unlike
        # qkv/o/gate_up, where a8 measures 2-4× faster).
        sk = os.environ.get("WTPU_A8_SKIP", "")
        skip_keys = tuple(p for p in sk.split(",") if p)

    # Buffers reachable under an embed key must survive even when a tied
    # head shares the same QuantTensor (qwen tie_word_embeddings).
    protected: set = set()
    if free_source:
        def scan(node, under_embed=False):
            if isinstance(node, QuantTensor):
                if under_embed:
                    protected.update(
                        id(x) for x in (node.w_q, node.scales, node.biases))
            elif isinstance(node, dict):
                for k, v in node.items():
                    scan(v, under_embed or k in embed_keys)
            elif isinstance(node, (list, tuple)):
                for v in node:
                    scan(v, under_embed)
        scan(params)

    def walk(node, key=None):
        if isinstance(node, QuantTensor):
            if key in skip_keys:
                return node
            n, _k = node.shape
            if max_n is not None and n > max_n:
                return node
            out = requant_a8(node, tile_n=tile_n, depth=depth)
            if free_source:
                # True sync = host fetch (block_until_ready acks at
                # dispatch on the axon backend — CLAUDE.md), then free
                # the packed source buffers before the next tensor.
                np.asarray(out.scale[0, :1])
                for leaf in (node.w_q, node.scales, node.biases):
                    if id(leaf) in protected:
                        continue
                    try:
                        leaf.delete()
                    except Exception:
                        pass  # non-deletable leaf (np array / traced)
            return out
        if isinstance(node, dict):
            # generic leaf keys ("w"/"b") inherit the enclosing linear's
            # name, so skip_keys matches ("down",) against {"down": {"w": QT}}
            return {k: (v if k in embed_keys and isinstance(v, QuantTensor)
                        else walk(v, key if k in ("w", "b") else k))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, key) for v in node)
        return node

    return walk(params)
