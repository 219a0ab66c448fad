"""Platform bootstrap helpers.

This image's axon sitecustomize imports jax at interpreter start and pins
the TPU backend regardless of ``JAX_PLATFORMS`` (the env var is consumed
before user code runs). :func:`ensure_platform` re-asserts the
environment's request through ``jax.config`` — which still works as long as
backends have not been initialized — so subprocesses (test daemons, CLI
runs) actually get the platform their environment asked for.

Also enables the persistent XLA compile cache: large-v3 compiles cost
minutes; every later process reuses them.
"""

from __future__ import annotations

import os


def ensure_platform() -> None:
    requested = os.environ.get("JAX_PLATFORMS")
    if not requested:
        return
    import jax

    try:
        jax.config.update("jax_platforms", requested)
        if requested == "cpu":
            n = int(os.environ.get("JAX_NUM_CPU_DEVICES", "0") or 0)
            if n > 1:
                jax.config.update("jax_num_cpu_devices", n)
    except RuntimeError:
        pass  # backends already initialized; too late to switch


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/wtpu_xla_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
