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
