import os

# Run all tests on a virtual 8-device CPU mesh so multi-chip sharding paths
# are exercised without TPU hardware. Must be set before jax import, and
# must OVERRIDE the environment: the machine env carries JAX_PLATFORMS=axon
# (the TPU-tunnel plugin), and with it set every test process initializes a
# live tunnel client whose threads coexist badly with hundreds of XLA-CPU
# compiles — the round-2/3 suite SIGSEGV inside backend_compile_and_load
# reproduced only with the axon backend initialized. Forcing cpu here keeps
# the plugin registered but never initialized: no tunnel, no extra threads.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter startup — a programmatic config write that
# overrides the env var — so the env assignment above is not enough.
# Re-point the config at cpu only, BEFORE any backend initializes: the
# axon factory stays registered but is never called, so no tunnel client
# (and none of its threads) ever exists in a test process.
jax.config.update("jax_platforms", "cpu")

# Belt and braces: even if a stray plugin backend initializes, route
# computation to CPU explicitly so tests are fast and deterministic.
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
