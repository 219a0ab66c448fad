"""Multi-buffered fused dequant-matmul: DEPTH weight-block DMAs in flight.

The production kernel (ops/quant_pallas.py) lets Mosaic's BlockSpec
pipeline fetch weight tiles — one prefetch in flight — and sustains only
~330 GB/s on v5e (scripts/bench_quant_kernel.py), half the ~700 GB/s the
XLA dense matmul reaches. At LLM B=1 the decode step is almost entirely
this weight stream (VERDICT r2 "weak" #2: the single-DMA wall was measured
but never attacked). This variant drives the weight stream BY HAND:

- packed words live in HBM **transposed**: ``wqt (K//per_word, N)`` —
  slab DMAs slice along N in tile_n (a 128 multiple), which satisfies
  Mosaic's lane-alignment rule with ZERO padding overhead. The natural
  (N, kp) layout is a dead end on this toolchain: any (tile_n, kp) slab
  slice with kp % 128 != 0 (qwen K=3584 → kp=448) fails remote compile
  with "Slice shape along dimension 1 must be aligned to tiling (128)".
- the kernel manually issues ``make_async_copy`` for the next ``DEPTH``
  (kp, TILE_N) weight slabs into a VMEM ring, so several DMA streams are
  in flight at once while the current tile dequantizes + MXU-dots;
- scales/biases (1/group_size of the stream) arrive whole via VMEM
  in_specs — hand-slicing them trips the same alignment rule on their
  G = K/group_size minor dim;
- per-tile compute matches the production kernel (planar bit-plane
  expansion, MXU scale spread, bias fold) in transposed orientation, so
  the matmul is the natural (M, K) @ (K, TILE_N).

Bench: scripts/bench_quant_mb.py sweeps DEPTH × TILE_N against the
production kernel on the real chip. Reference workload: mlx-lm 4-bit
``quantized_matmul`` (SURVEY.md §2.3); this path serves LLM few-row decode
(M ≤ 16) where weights must stay int4-resident (Qwen3-32B: 17.2 GiB).

Call :func:`transpose_quant` ONCE at setup (eager) and pass the result to
:func:`quant_matmul_mbt` inside loops; :func:`quant_matmul_mb` is the
drop-in QuantTensor wrapper that transposes per call (tests/one-shots).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_mlx_tpu.ops.quant import QuantTensor
from whisper_mlx_tpu.ops.quant_pallas import _planar_perm


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _u8_perm(K: int):
    """Activation permutation for the u8-bitcast dequant order (bits=4).

    ``pltpu.bitcast(u32 → u8)`` expands the SUBLANE dim 4× in row-major
    byte order (measured on this toolchain): word row kw → u8 rows
    4·kw+b holding byte b. Byte b of word kw packs nibbles 2b (lo) and
    2b+1 (hi), i.e. original k = 8·kw + 2b (+1 for the hi half). The
    kernel concatenates [lo; hi], so output row m maps to
    k(m) = 8·(m′//4) + 2·(m′%4) + (m ≥ K/2), m′ = m mod K/2.
    """
    import numpy as np

    kp4 = K // 2  # rows per half: 4 * (K // 8)
    m = np.arange(K)
    mm = np.where(m < kp4, m, m - kp4)
    return 8 * (mm // 4) + 2 * (mm % 4) + (m >= kp4).astype(np.int64)


@jax.tree_util.register_pytree_node_class
class QuantTensorT:
    """A QuantTensor pre-transposed for the mb kernel's slab DMAs.

    wqt: (K // per_word, N) uint32 — or, in the i8 CODES-RESIDENT mode
    (``WTPU_MBT_DQ=i8``, 4-bit only), (K, N) int8 holding one unpacked
    code per byte: 2× the packed HBM bytes (still 4× under bf16) in
    exchange for dequant being ONE i8→bf16 cast + multiply instead of the
    planar 8-plane shift/mask/bitcast/cast chain — the measured VPU wall
    at LLM B=1 (docs/performance.md). scalest/biasest: (G, N).

    ``contig=True`` (``WTPU_MBT_CONTIG=1``) additionally pre-tiles the
    words to (n_tiles, Kp, tile_n) — N padded to a tile multiple ONCE at
    setup — so each ring slab is ONE flat HBM block instead of Kp strided
    row chunks (the (Kp, N) column slice strides N words between rows;
    at gate_up's N=37888 that DMA pattern measured 195 GB/s vs 456 on
    o_proj's N=3584 with identical per-byte dequant work). ``n_orig``
    remembers the unpadded N. scales/biases are pre-padded to match.

    bits/group_size/tile_n/depth/contig/n_orig are pytree aux data
    (static under jit), so per-leaf tile tuning rides the params tree
    across jit boundaries.
    """

    def __init__(self, wqt, scalest, biasest, bits: int, group_size: int,
                 tile_n: int = 512, depth: int = 2, contig: bool = False,
                 n_orig: int | None = None):
        self.wqt = wqt
        self.scalest = scalest
        self.biasest = biasest
        self.bits = int(bits)
        self.group_size = int(group_size)
        self.tile_n = int(tile_n)
        self.depth = int(depth)
        self.contig = bool(contig)
        self.n_orig = None if n_orig is None else int(n_orig)

    @property
    def codes_resident(self) -> bool:
        return self.wqt.dtype == jnp.int8

    @property
    def shape(self):  # natural (out, in), matching QuantTensor
        if self.contig:
            kp_rows = self.wqt.shape[1]
            n = self.n_orig
        else:
            kp_rows, n = self.wqt.shape
        k = kp_rows if self.codes_resident else kp_rows * (32 // self.bits)
        return (n, k)

    def _wqt_2d(self):
        """→ (Kp, N) words with the tile padding stripped (any layout)."""
        if not self.contig:
            return self.wqt
        t, kp, tile = self.wqt.shape
        return self.wqt.transpose(1, 0, 2).reshape(kp, t * tile)[:, : self.n_orig]

    def dequantize(self, dtype=jnp.float32):
        """→ (out, in) floats — CPU/interpret + large-M (prefill) path."""
        n = self.shape[0]
        sct = self.scalest[:, :n]
        bit = self.biasest[:, :n]
        wqt = self._wqt_2d()
        if self.codes_resident:
            g = sct.shape[0]
            k = wqt.shape[0]
            codes = wqt.T.astype(jnp.float32).reshape(n, g, k // g)
            w = codes * sct.T[..., None] + bit.T[..., None]
            return w.reshape(n, k).astype(dtype)
        from whisper_mlx_tpu.ops.quant import dequantize

        return dequantize(wqt.T, sct.T, bit.T,
                          self.bits, self.group_size, dtype=dtype, xp=jnp)

    def tree_flatten(self):
        return ((self.wqt, self.scalest, self.biasest),
                (self.bits, self.group_size, self.tile_n, self.depth,
                 self.contig, self.n_orig))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def __repr__(self):
        return (f"QuantTensorT{self.shape}[{self.bits}b/g{self.group_size}"
                f" t{self.tile_n}d{self.depth}"
                f"{'c' if self.contig else ''}]")


def transpose_quant(q: QuantTensor, tile_n: int | None = None,
                    depth: int | None = None,
                    codes: bool | None = None,
                    contig: bool | None = None) -> QuantTensorT:
    """One-time (eager) layout conversion for :func:`quant_matmul_mbt`.

    tile_n/depth default to the shape-keyed sweep winners
    (scripts/bench_quant_mb.py on v5e): wide-N FFN projections like
    gate_up (N ≥ 16k) want a deep ring of big tiles; attention-sized
    projections want a shallow ring of 512 tiles.

    ``codes=True`` (or ``WTPU_MBT_DQ=i8``, 4-bit only) unpacks the words
    to one int8 code per byte — see :class:`QuantTensorT`.

    ``contig=True`` (or ``WTPU_MBT_CONTIG=1``) pre-tiles the words to
    (n_tiles, Kp, tile_n) so each ring slab DMA is one flat HBM block
    (see :class:`QuantTensorT`).
    """
    import os

    if codes is None:
        codes = (os.environ.get("WTPU_MBT_DQ", "planar") == "i8"
                 and q.bits == 4)
    if contig is None:
        contig = os.environ.get("WTPU_MBT_CONTIG", "0") == "1"
    if codes:
        # deep-K linears spill VMEM in the i8 kernel: its scale spread and
        # dequantized tile are full-K ((K, tile_n) vs planar's (K/8, ·)) —
        # measured: down_proj K=18944 at prefill M=128 wants 134M of 128M.
        # The i8 win case is the VPU-bound gate_up (K=3584) anyway.
        i8_max_k = int(os.environ.get("WTPU_MBT_I8_MAX_K", "8192"))
        codes = q.shape[1] <= i8_max_k
    n = q.shape[0]
    if tile_n is None:
        env = os.environ.get("WTPU_MBT_TILE", "")
        tile_n = int(env) if env else (1024 if n >= 16384 else 512)
    if depth is None:
        env = os.environ.get("WTPU_MBT_DEPTH", "")
        # i8 slabs are 2× the packed bytes; halve the default ring depth
        # to keep the VMEM footprint comparable
        depth = int(env) if env else ((4 if codes else 8) if n >= 16384 else 2)
    if codes:
        per_word = 32 // q.bits
        mask = jnp.uint32((1 << q.bits) - 1)
        planes = [((q.w_q >> jnp.uint32(i * q.bits)) & mask)
                  for i in range(per_word)]  # nibble i of word w ↔ k=8w+i
        wk = jnp.stack(planes, axis=-1).reshape(n, -1)  # (N, K) codes
        wqt = wk.T.astype(jnp.int8)  # 4-bit codes are 0..15: exact in i8
    else:
        wqt = q.w_q.T
    sct, bit = q.scales.T, q.biases.T
    n_orig = None
    if contig:
        kp_rows = wqt.shape[0]
        np_cols = _round_up(n, tile_n)
        if np_cols != n:
            wqt = jnp.zeros((kp_rows, np_cols), wqt.dtype).at[:, :n].set(wqt)
            g = sct.shape[0]
            sct = jnp.zeros((g, np_cols), sct.dtype).at[:, :n].set(sct)
            bit = jnp.zeros((g, np_cols), bit.dtype).at[:, :n].set(bit)
        n_tiles = np_cols // tile_n
        wqt = wqt.reshape(kp_rows, n_tiles, tile_n).transpose(1, 0, 2)
        n_orig = n
    return QuantTensorT(wqt, sct, bit, q.bits,
                        q.group_size, tile_n=tile_n, depth=depth,
                        contig=contig, n_orig=n_orig)


def _mbt_kernel(x_ref, xg_ref, sct_ref, bit_ref, wqt_hbm, out_ref,
                wq_buf, sem,
                *, bits: int, group_size: int, tile_n: int, depth: int,
                n_tiles: int, out_dtype, dq_mode: str = "planar",
                contig: bool = False):
    """Single-program kernel; loops N tiles with a DEPTH-deep DMA ring.

    wq_buf: (depth, Kp_words, TILE_N) VMEM ring; sem: (depth,) DMA sems.
    ``contig``: wqt_hbm is pre-tiled (n_tiles, Kp, TILE_N) — slab t is
    ONE flat HBM block (``.at[t]``) instead of a (Kp, N) column slice
    whose DMA strides N words between 128-lane row chunks.
    """
    compute = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    kp = wq_buf.shape[1]
    g = sct_ref.shape[0]
    words_per_group = group_size // per_word

    def _slab(t):
        return (wqt_hbm.at[t] if contig
                else wqt_hbm.at[:, pl.ds(t * tile_n, tile_n)])

    def start(t, slot):
        pltpu.make_async_copy(_slab(t), wq_buf.at[slot], sem.at[slot]).start()

    def wait(t, slot):
        pltpu.make_async_copy(_slab(t), wq_buf.at[slot], sem.at[slot]).wait()

    # warm the ring (static unroll; depth <= n_tiles enforced by caller)
    for d in range(depth):
        start(d, d)

    # per-word scale-spread selection matrix: loop-invariant, built once.
    # Row w (a packed word) selects its group w // words_per_group.
    if dq_mode == "i8":
        # codes-resident: ring rows ARE original k → group k // group_size
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (kp, g), 0)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (kp, g), 1)
        expand = (r_ids // group_size == g_ids).astype(compute)
    elif dq_mode == "u8":
        # byte-row granularity: lo/hi byte-rows share shape (4·Kp, T);
        # byte-row m holds k = 8·(m//4) + 2·(m%4) (+1 for hi) → group
        # m // (4 · words_per_group) for both halves.
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (4 * kp, g), 0)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (4 * kp, g), 1)
        expand = (r_ids // (4 * words_per_group) == g_ids).astype(compute)
    else:
        w_ids = jax.lax.broadcasted_iota(jnp.int32, (kp, g), 0)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (kp, g), 1)
        expand = (w_ids // words_per_group == g_ids).astype(compute)  # (Kp, G)

    x = x_ref[:]
    xg = xg_ref[:]
    if dq_mode == "u8":
        x_lo = x[:, : 4 * kp]   # lo-nibble byte-rows (see _u8_perm)
        x_hi = x[:, 4 * kp :]

    def body(t, carry):
        slot = jax.lax.rem(t, depth)
        wait(t, slot)
        wqt = wq_buf[slot]  # (Kp, TILE_N) uint32
        sct = sct_ref[:, pl.ds(t * tile_n, tile_n)]  # (G, TILE_N)
        scale_w = jax.lax.dot(expand, sct.astype(compute),
                              preferred_element_type=jnp.float32
                              ).astype(compute)  # ((4·)Kp, TILE_N)
        if dq_mode == "i8":
            # codes-resident: dequant is ONE cast + mul (no shifts/bitcasts)
            w = wqt.astype(compute) * scale_w  # (K, TILE_N)
            acc = jax.lax.dot_general(
                x.astype(compute), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif dq_mode == "u8":
            # VPU-cheap 4-bit dequant: ONE u32→u8 sublane-expanding
            # bitcast splits each word into bytes (row-major order, see
            # _u8_perm) and a u8 mask extracts 4 nibbles per lane-op.
            # The planar path below spends shift+mask+bitcast+cast PER
            # PLANE and measured VPU-bound (gate_up 195 GB/s while dense
            # streams 700+). Two half-dots avoid any concat/relayout;
            # both halves share the byte-row scale spread (MXU-built).
            lo = pltpu.bitcast(wqt, jnp.uint8) & jnp.uint8(0xF)
            hi = pltpu.bitcast(wqt >> jnp.uint32(4), jnp.uint8) & jnp.uint8(0xF)
            wl = pltpu.bitcast(lo, jnp.int8).astype(compute) * scale_w
            wh = pltpu.bitcast(hi, jnp.int8).astype(compute) * scale_w
            acc = jax.lax.dot_general(
                x_lo.astype(compute), wl,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                x_hi.astype(compute), wh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            planes = []
            for i in range(per_word):
                v = (wqt >> jnp.uint32(i * bits)) & mask
                v = pltpu.bitcast(v, jnp.int32).astype(compute)
                planes.append(v * scale_w)
            w_planar = jnp.concatenate(planes, axis=0)  # (K, TILE_N)
            acc = jax.lax.dot_general(
                x.astype(compute), w_planar,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc = acc + jax.lax.dot_general(
            xg, bit_ref[:, pl.ds(t * tile_n, tile_n)].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        nxt = t + depth

        @pl.when(nxt < n_tiles)
        def _():
            start(nxt, slot)

        out_ref[:, pl.ds(t * tile_n, tile_n)] = acc.astype(out_dtype)
        return carry

    jax.lax.fori_loop(0, n_tiles, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "depth", "interpret"))
def quant_matmul_mbt(x: jnp.ndarray, qt: QuantTensorT,
                     tile_n: int | None = None, depth: int | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """``x @ dequant(q).T`` with a DEPTH-deep manually-DMA'd weight ring.

    ``qt`` must come from :func:`transpose_quant` (one-time setup). Same
    per-tile arithmetic as :func:`quant_matmul_pallas`, transposed to the
    natural (M, K) @ (K, N) orientation. tile_n/depth default to the
    values stored on ``qt`` (pytree aux → static under jit).
    """
    if tile_n is None:
        tile_n = qt.tile_n
    if depth is None:
        depth = qt.depth
    import os

    # measured on v5e (bench_history.jsonl): planar 52.1 tok/s vs u8 47.3
    # at qwen-7B B=1 — the u8 nibble split saves VPU ops in isolation but
    # loses e2e (the sublane-expanding bitcast serializes against the DMA
    # ring); planar stays the default, u8 remains the documented opt-in
    if qt.codes_resident:
        dq_mode = "i8"  # layout decided at transpose_quant time
    else:
        dq_mode = os.environ.get("WTPU_MBT_DQ", "planar")
        if dq_mode == "i8":
            dq_mode = "planar"  # i8 needs the codes-resident layout
        if qt.bits != 4:
            dq_mode = "planar"  # u8 nibble split is 4-bit-specific
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    if qt.contig:
        # pre-tiled layout: tile geometry is fixed at transpose time
        tile_n = qt.tile_n
        n_tiles, kp_words, _ = qt.wqt.shape
        N = qt.n_orig
        Np = n_tiles * tile_n
    else:
        kp_words, N = qt.wqt.shape
        Np = _round_up(N, tile_n)
        n_tiles = Np // tile_n
    bits, group_size = qt.bits, qt.group_size
    per_word = 32 // bits
    G = K // group_size
    assert kp_words == (K if dq_mode == "i8" else K // per_word)

    depth = min(depth, n_tiles)
    Mp = _round_up(max(M, 8), 8)

    xg = x2.astype(jnp.float32).reshape(M, G, group_size).sum(-1)
    if dq_mode == "i8":
        x_planar = x2  # codes rows are natural k order: no permutation
    else:
        perm = _u8_perm(K) if dq_mode == "u8" else _planar_perm(K, per_word)
        x_planar = x2[:, jnp.asarray(perm)]
    x_pad = jnp.zeros((Mp, K), x2.dtype).at[:M].set(x_planar)
    xg_pad = jnp.zeros((Mp, G), jnp.float32).at[:M].set(xg)
    wqt, sct, bit = qt.wqt, qt.scalest, qt.biasest
    if Np != N and not qt.contig:
        wqt = jnp.zeros((kp_words, Np), wqt.dtype).at[:, :N].set(wqt)
    if sct.shape[1] != Np:
        sct = jnp.zeros((G, Np), sct.dtype).at[:, :N].set(sct)
        bit = jnp.zeros((G, Np), bit.dtype).at[:, :N].set(bit)

    out = pl.pallas_call(
        functools.partial(
            _mbt_kernel, bits=bits, group_size=group_size, tile_n=tile_n,
            depth=depth, n_tiles=n_tiles, out_dtype=x.dtype,
            dq_mode=dq_mode, contig=qt.contig,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xg
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scalesT (whole, tiny)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biasesT (whole, tiny)
            pl.BlockSpec(memory_space=pltpu.HBM),   # wqt: weights STAY in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((depth, kp_words, tile_n), wqt.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_pad, xg_pad, sct, bit, wqt)
    return out[:M, :N].reshape(*lead, N)


def quant_matmul_mb(x: jnp.ndarray, q: QuantTensor, tile_n: int = 512,
                    depth: int = 4, interpret: bool = False) -> jnp.ndarray:
    """Drop-in QuantTensor wrapper: transposes PER CALL (tests/one-shots).

    Inside decode loops, do the transpose once at setup:
    ``qt = transpose_quant(q)`` then ``quant_matmul_mbt(x, qt, ...)``.
    """
    return quant_matmul_mbt(x, transpose_quant(q), tile_n=tile_n,
                            depth=depth, interpret=interpret)
