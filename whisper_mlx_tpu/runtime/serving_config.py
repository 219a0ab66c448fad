"""Apply the measured-best ASR serving configuration to a loaded model.

Checkpoint loaders (checkpoint/{hf,quant,openai}_loader.py) return the
PARITY configuration — fp32 compute, XLA attention, fp KV caches — which
is what golden-token tests need. Serving wants the measured-best config
(docs/performance.md: bf16 + flash/dense attention + int4 cross-KV +
int8 self-KV = 306.6 RTF/chip on v5e; quality bounds in
docs/kv_quant_study.md). This module flips a loaded (params, config) to
that configuration — on TPU by default, parity mode elsewhere — so the
daemon (`--whisper-model`) and the `run`/CLI launchers actually serve at
the benched speed.

Env knobs (all optional):
  WTPU_SERVE_PRECISION  bfloat16|float32 (default: bfloat16 on TPU)
  WTPU_SERVE_FLASH      1|0             (default: 1 on TPU)
  WTPU_SERVE_KV         4|8|0           (default: 4 on TPU)
  WTPU_SERVE_SELF_KV    8|4|0           (default: 8 on TPU)
  WTPU_TRANSCRIBE_BATCH window batch buckets for the serving batcher —
                        an int or a comma list, e.g. "8,56"
                        (default: "8,56" on TPU, 8 elsewhere; each bucket
                        is one compiled decode executable, and a request
                        batch rides the smallest bucket that fits, so a
                        lone short request doesn't pay the 56-slot shape)
  WTPU_SERVE_DP         data-parallel width for ASR serving: "auto"
                        (default — all local TPU chips) or an int; ≤1
                        disables the mesh. Windows are DP-sharded over
                        the mesh (SURVEY.md §2.4), replacing the
                        reference's single-writer lock
                        (reference daemon/server.py:280).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def serving_batch_size() -> int:
    return max(serving_batch_buckets())


def serving_flush_knobs() -> tuple[float, float]:
    """(max_wait_ms, idle_gap_ms) for the batcher's adaptive flush policy
    (SERVE_WAIT_MS / SERVE_IDLE_GAP_MS)."""
    try:
        wait = float(os.environ.get("SERVE_WAIT_MS", 50.0))
    except ValueError:
        wait = 50.0
    try:
        gap = float(os.environ.get("SERVE_IDLE_GAP_MS", 25.0))
    except ValueError:
        gap = 25.0
    return wait, gap


def serving_batch_buckets() -> tuple[int, ...]:
    """Sorted window-batch buckets for the serving batcher."""
    import jax

    on_tpu = jax.default_backend() == "tpu"
    # intermediate buckets right-size a burst's TAIL batch (r5: 144 queued
    # windows flush as 56+56+32 instead of 56+56+56-padded — each bucket
    # is one compiled executable, so the tail stops costing a full batch)
    raw = os.environ.get(
        "WTPU_TRANSCRIBE_BATCH", "8,16,32,56" if on_tpu else "8")
    try:
        buckets = tuple(sorted({int(p) for p in str(raw).split(",") if p.strip()}))
    except ValueError:
        buckets = (56,) if on_tpu else (8,)
    return buckets or ((56,) if on_tpu else (8,))


def serving_mesh() -> "Any | None":
    """The ASR serving mesh (dp × 1), or None when a single chip serves.

    Reads WTPU_SERVE_DP ("auto" = every local device on TPU backends; an
    int pins the width; ≤1 disables). Single-chip environments — including
    this image's one-TPU tunnel — return None, so the default serving path
    is unchanged; the multi-chip path is CPU-mesh-tested
    (tests/test_batcher.py::test_batcher_mesh_token_identical) and
    dryrun-compiled by ``__graft_entry__.dryrun_multichip``.
    """
    import jax

    raw = os.environ.get("WTPU_SERVE_DP", "auto").strip().lower()
    n = jax.local_device_count()
    if raw in ("", "auto"):
        dp = n if jax.default_backend() == "tpu" else 1
    else:
        try:
            dp = int(raw)
        except ValueError:
            dp = 1
    if dp <= 1:
        return None
    if dp > n:
        raise ValueError(f"WTPU_SERVE_DP={dp} exceeds {n} local devices")
    from whisper_mlx_tpu.parallel.mesh import make_mesh

    return make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])


def apply_asr_serving_config(params: Any, config: Any) -> tuple[Any, Any]:
    """(params, config) → serving-configured (params, config).

    Float weights are cast to the serving dtype; quantized leaves
    (QuantTensor) and integer arrays are untouched (their scales stay
    fp32 — the fused kernel's accuracy contract)."""
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    precision = os.environ.get(
        "WTPU_SERVE_PRECISION", "bfloat16" if on_tpu else "")
    flash = os.environ.get("WTPU_SERVE_FLASH", "1" if on_tpu else "0") == "1"
    kv_bits = _env_int("WTPU_SERVE_KV", 4 if on_tpu else 0)
    self_kv = _env_int("WTPU_SERVE_SELF_KV", 8 if on_tpu else 0)

    new_cfg = dataclasses.replace(
        config,
        flash_attention=flash,
        kv_bits=kv_bits,
        self_kv_bits=self_kv,
    )
    if precision == "bfloat16" and config.dtype != jnp.bfloat16:
        new_cfg = dataclasses.replace(new_cfg, dtype=jnp.bfloat16)

        def cast(leaf):
            if hasattr(leaf, "dtype") and leaf.dtype in (jnp.float32, jnp.float16):
                return leaf.astype(jnp.bfloat16)
            return leaf

        # QuantTensor is a pytree node; its float children are per-group
        # scales/biases that must STAY fp32, so walk dicts/lists manually.
        def walk(node):
            if type(node).__name__ == "QuantTensor":
                return node
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            if isinstance(node, list):
                return [walk(v) for v in node]
            return cast(node)

        params = walk(params)
    return params, new_cfg
