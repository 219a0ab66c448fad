"""Pallas lane-permute: physically reorder beam lanes at copy bandwidth.

Classic vectorized beam search reorders the self-KV cache by the parent
map every step (reference semantics: mlx_whisper ``decoding.py`` keeps
per-hypothesis caches and re-gathers them on reorder; SURVEY.md §2.1).
The r2/r4 measurements show both XLA lowerings of that reorder are far
below copy bandwidth on this backend:

  - ``jnp.take`` over the lane axis: scalarized gather loads
  - one-hot matmul: materializes an f32/bf16 cast of the whole int8 cache
    (scripts/profile_beam.py PROF_PERM=onehot: ~40 ms/step at 60 lanes)

This kernel is the TPU-native lowering: a scalar-prefetched grid where
program ``b`` DMAs lane ``parent[b]``'s full row into output lane ``b``.
No compute at all — Mosaic double-buffers the block DMAs, so the permute
streams the cache at HBM rate. The dynamic input block index comes from
``PrefetchScalarGridSpec`` (parent indices are available before the grid
starts, exactly the "data-dependent block addressing" pattern the Pallas
TPU guide describes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _perm_kernel(*refs):
    n = (len(refs) - 1) // 2
    ins = refs[1 : 1 + n]  # refs[0] is the prefetched parent vector
    outs = refs[1 + n :]
    for i_ref, o_ref in zip(ins, outs):
        o_ref[...] = i_ref[...]


def permute_lanes(
    arrays: list[jnp.ndarray],
    parent: jnp.ndarray,  # (NB,) int32: output lane b <- input lane parent[b]
    *,
    interpret: bool = False,
) -> list[jnp.ndarray]:
    """Reorder axis 0 of every array by ``parent`` (out[b] = in[parent[b]]).

    All arrays must share axis-0 length NB. Trailing singleton axes are
    squeezed for the copy (a minor dim of 1 would lane-pad 128x in VMEM)
    and restored on return. One pallas_call moves every tensor of a layer
    so the per-call launch cost is shared across K/V/scales.
    """
    nb = arrays[0].shape[0]
    sq = [a.shape[-1] == 1 for a in arrays]
    mats = [a[..., 0] if s else a for s, a in zip(sq, arrays)]
    assert all(a.shape[0] == nb for a in mats)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (1,) + a.shape[1:],
                lambda b, parent_ref, nd=a.ndim: (parent_ref[b],) + (0,) * (nd - 1),
            )
            for a in mats
        ],
        out_specs=[
            pl.BlockSpec(
                (1,) + a.shape[1:],
                lambda b, parent_ref, nd=a.ndim: (b,) + (0,) * (nd - 1),
            )
            for a in mats
        ],
    )
    outs = pl.pallas_call(
        _perm_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in mats],
        interpret=interpret,
    )(parent.astype(jnp.int32), *mats)
    return [o[..., None] if s else o for s, o in zip(sq, outs)]


def _move_kernel(src_ref, *refs):
    # refs = n aliased in/out ANY-space refs + n DMA semaphores; the input
    # and output of each tensor are THE SAME buffer (input_output_aliases),
    # so row moves are issued on the out refs alone.
    n = (len(refs)) // 3
    outs = refs[n : 2 * n]
    sems = refs[2 * n :]
    b = pl.program_id(0)
    s = src_ref[b]

    @pl.when(s != b)
    def _():
        for o_ref, sem in zip(outs, sems):
            pltpu.make_async_copy(o_ref.at[s], o_ref.at[b], sem).start()
        for o_ref, sem in zip(outs, sems):
            pltpu.make_async_copy(o_ref.at[s], o_ref.at[b], sem).wait()


def lane_move_inplace(
    arrays: list[jnp.ndarray],
    src: jnp.ndarray,  # (NB,) int32: lane b receives row src[b]
    *,
    interpret: bool = False,
) -> list[jnp.ndarray]:
    """Copy-on-divergence lane reorder: row b <- row src[b], IN PLACE.

    Rows with ``src[b] == b`` are untouched (no DMA at all), so the HBM
    traffic is proportional to actual beam divergence (typically 1-2 of
    ``beam_size`` rows per step) instead of a full-cache rewrite — the
    full per-step permute costs 6.8-7.7 ms/step at 60 lanes even at the
    best lowering (scripts/profile_beam.py PROF_PERM / /tmp/perm_floor).

    PRECONDITION (beam-reorder structure, caller-guaranteed): every source
    row is a fixed point — ``src[b] != b`` implies ``src[src[b]] ==
    src[b]``. A parent lane that keeps at least one child keeps its own
    row (the first child claims it), so a copied-from row is never itself
    overwritten; TPU grid programs are sequential, so there is no race
    either way, but violating the precondition makes results
    order-dependent.
    """
    nb = arrays[0].shape[0]
    assert all(a.shape[0] == nb for a in arrays)
    # Mosaic constrains HBM row slices to the (sublane, 128) tiling of the
    # LAST TWO dims; a row-major flatten to (NB, R/128, 128) is a free view
    # and aligned whenever R % 1024 == 0 (sublane tile 8). Rows that can't
    # align (odd small tensors) fall back to an XLA gather — they are tiny.
    kern_idx, kern_mats, out_list = [], [], [None] * len(arrays)
    for i, a in enumerate(arrays):
        r = int(np.prod(a.shape[1:]))
        if r % 1024 == 0:
            kern_idx.append(i)
            kern_mats.append(a.reshape(nb, r // 128, 128))
        else:
            out_list[i] = jnp.take(a, src, axis=0)
    if kern_mats:
        n = len(kern_mats)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in kern_mats],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in kern_mats],
            scratch_shapes=[pltpu.SemaphoreType.DMA] * n,
        )
        outs = pl.pallas_call(
            _move_kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype)
                       for a in kern_mats],
            input_output_aliases={1 + i: i for i in range(n)},
            interpret=interpret,
        )(src.astype(jnp.int32), *kern_mats)
        for i, o in zip(kern_idx, outs):
            out_list[i] = o.reshape(arrays[i].shape)
    return out_list
