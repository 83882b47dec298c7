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

# The full suite runs ~100 large XLA:CPU compiles in one process, and each
# compiled executable leaves hundreds of JIT code mappings: the process
# crosses the default vm.max_map_count (65530) at ~70% of the suite, after
# which the next mmap fails and surfaces as a segfault/abort inside whatever
# happens to allocate (LLVM compile, executable serialization, OR cache
# deserialization — all three were observed at the same suite position;
# measured: ~51k maps at the 10-minute mark, ~4k/30s growth). Raise the
# limit when we can (root container); the RLIMIT_STACK bump below is kept
# as defense for the deep-recursion class.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1048576:
            _f.seek(0)
            _f.write("1048576")
except Exception:
    pass

try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _hard if _hard != resource.RLIM_INFINITY else _want
        resource.setrlimit(resource.RLIMIT_STACK, (min(_want, _new), _hard))
except Exception:
    pass

import jax  # noqa: E402

# Hermetic CPU pinning. This image's sitecustomize registers the remote-TPU
# "axon" PJRT plugin at interpreter startup (importing jax before conftest —
# and before pytest plugins like jaxtyping — ever run), and JAX_PLATFORMS=cpu
# does NOT stop that plugin's client creation: the first backends() call
# dials the TPU tunnel and HANGS the whole suite whenever the tunnel is down
# (observed: a module-scope jax.default_backend() in a tpu-gated skipif
# blocked for >10 min). Clients are created lazily, so dropping the factory
# before any backend exists keeps every suite run hermetic regardless of the
# invoking shell's env.
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

try:
    jax.config.update("jax_default_device", "cpu")
except Exception:
    pass

# Persistent compilation cache: the suite's ~100 large XLA:CPU compiles
# dominate its runtime, and the in-process LLVM crash above only bites while
# compiling — with a warm cache a rerun is both fast and crash-immune. The
# cache key includes backend + XLA flags, so the 8-device CPU entries never
# collide with TPU runs.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_larvio"),
    )
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
