import os

# Run all tests on a virtual 8-device CPU mesh so multi-chip sharding paths
# are exercised without TPU hardware. Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin (sitecustomize) registers itself regardless of
# JAX_PLATFORMS and becomes the default backend; route tests to CPU
# explicitly so they are fast and deterministic.
import jax  # noqa: E402

try:
    _cpu = jax.local_devices(backend="cpu")
    jax.config.update("jax_default_device", _cpu[0])
except RuntimeError:
    pass


def cpu_devices(n=None):
    d = jax.local_devices(backend="cpu")
    return d if n is None else d[:n]


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_compile_state():
    """Release compiled executables between test modules.

    The full suite compiles hundreds of distinct XLA-CPU programs; with
    every executable kept alive by jit caches, two consecutive full runs
    segfaulted inside XLA-CPU backend_compile_and_load near the end of
    the suite (suite-order-dependent; the failing test passes alone).
    Bounding the live-executable population between modules keeps the
    JIT's code/memory footprint flat across the run.
    """
    yield
    jax.clear_caches()
    gc.collect()
