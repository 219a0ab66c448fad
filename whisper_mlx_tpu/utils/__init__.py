"""Shared utilities (prescribed package layout: models/ ops/ parallel/ utils/).

Hosts small generic helpers; the heavier runtime subsystems live in
``whisper_mlx_tpu.runtime`` (platform bootstrap, profiling, batching) and
are re-exported here for discoverability.
"""

from whisper_mlx_tpu.runtime.platform import enable_compile_cache, ensure_platform
from whisper_mlx_tpu.runtime.profiling import StageTimer, annotate, device_trace


def round_up(x: int, multiple: int) -> int:
    """Smallest multiple of ``multiple`` ≥ x (tile-alignment helper)."""
    return -(-x // multiple) * multiple


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


__all__ = [
    "StageTimer", "annotate", "device_trace",
    "ensure_platform", "enable_compile_cache",
    "round_up", "cdiv",
]
