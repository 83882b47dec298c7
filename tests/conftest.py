"""Test configuration: force CPU with 8 virtual devices (SURVEY.md §7).

Multi-chip sharding is validated on a virtual CPU mesh; real-TPU execution is
exercised separately by bench.py / the driver's dryrun.

Note: this environment boots with a sitecustomize that registers a TPU
backend before conftest runs, so ``JAX_PLATFORMS=cpu`` alone is not enough —
we additionally pin ``jax_default_device`` to CPU.  XLA_FLAGS still takes
effect because the CPU client is created lazily on first use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
