"""Simulated multi-host bootstrap (VERDICT r4 weak #7).

Exercises parallel/mesh.py:init_distributed for real: two OS processes,
localhost coordinator, jax.distributed handshake, a global mesh spanning
both processes' CPU devices, and a cross-process psum through a jitted
shard_map — the exact code path a 2-host TPU pod slice takes over DCN
(the reference is strictly single-device; SURVEY.md §2.4).

Each worker is a fresh subprocess because jax.distributed.initialize must
run before the backend initializes (same constraint as real multi-host
TPU), so the pytest host's own JAX state can't be reused.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]

WORKER = r'''
import os, sys
proc, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
from whisper_mlx_tpu.parallel.mesh import init_distributed, make_mesh, dp_sharding
init_distributed("localhost:" + port, nproc, proc)
import jax, numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 2, jax.devices()  # global device view
mesh = make_mesh()  # dp=4 over both processes' devices

# global (4, 8) array, one dp shard per device; psum -> 4.0 everywhere
glob = jax.make_array_from_callback(
    (4, 8), dp_sharding(mesh, 2),
    lambda idx: np.ones((1, 8), np.float32))
f = jax.jit(shard_map(
    lambda a: jax.lax.psum(a, "dp"), mesh=mesh,
    in_specs=P("dp", None), out_specs=P()))
out = f(glob)
local = np.asarray(out.addressable_shards[0].data)
assert np.allclose(local, 4.0), local
print("WORKER_OK", proc, flush=True)
'''


@pytest.mark.slow
def test_two_process_bootstrap_psum(tmp_path):
    port = "29517"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    env["PYTHONPATH"] = str(ROOT)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(ROOT))
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
