"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference tests run the real model on real hardware with no fakes
(SURVEY.md §4). On TPU we additionally need sharding/decode-loop coverage
without chips, so tests force the CPU backend with 8 virtual devices
(XLA_FLAGS host-platform device count) — the same mechanism the driver's
``dryrun_multichip`` uses.
"""

import os

# Force CPU even when the environment points at a TPU. In this image an axon
# sitecustomize hook imports jax and registers the TPU backend at interpreter
# start, so env vars are too late — but jax.config still works because the
# backends themselves are initialized lazily at first use.
os.environ["JAX_PLATFORMS"] = "cpu"  # harmless; helps subprocesses we spawn
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_speechy_audio(seconds: float = 3.0, sample_rate: int = 16_000, seed: int = 0) -> np.ndarray:
    """Synthetic 'speech-like' signal: sum of chirps + AM noise bursts.

    No audio fixtures exist offline (zero egress), so tests exercise the
    pipeline with deterministic synthetic audio.
    """
    rng = np.random.default_rng(seed)
    n = int(seconds * sample_rate)
    t = np.arange(n) / sample_rate
    sig = np.zeros(n, dtype=np.float64)
    for f0, f1, amp in ((120, 180, 0.4), (440, 880, 0.25), (1500, 900, 0.15)):
        phase = 2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * seconds))
        sig += amp * np.sin(phase)
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t))
    sig += 0.05 * env * rng.standard_normal(n)
    sig *= 0.5 / np.max(np.abs(sig))
    return sig.astype(np.float32)


@pytest.fixture
def speechy_audio():
    return make_speechy_audio()
