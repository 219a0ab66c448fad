"""Device mesh bootstrap (ICI/DCN) — the layer the reference doesn't have.

The reference is strictly single-device (SURVEY.md §2.4: no DP/TP/PP, a
global asyncio lock serializes generation). Here parallelism is first-class:

- ``make_mesh(dp, tp)`` builds a ``jax.sharding.Mesh`` over the slice;
  data-parallel ("dp") shards 30 s windows / requests, tensor-parallel
  ("tp") shards attention heads + FFN of large models across chips.
- Multi-host: call :func:`init_distributed` first (jax.distributed), then
  the mesh spans all processes' devices and GSPMD rides ICI collectives.

Everything downstream uses GSPMD: params/inputs carry NamedShardings and the
existing jitted functions (models/whisper.py, decoding/greedy.py) compile to
collective-inserted SPMD programs with no code changes — the scaling-book
recipe (mesh → annotate → let XLA insert collectives).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bootstrap (no-op when single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Mesh with axes ("dp", "tp"); dp defaults to n_devices // tp.

    Axis order puts "tp" innermost so tensor-parallel collectives ride the
    fastest ICI links between physically adjacent chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-leading array sharded over "dp"."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))
