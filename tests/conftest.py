"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is single-chip in CI; multi-chip sharding is validated on
virtual CPU devices per the build contract.  NOTE: the axon sitecustomize
overrides jax_platforms via config (env vars are ignored), so the CPU
force must go through jax.config too.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persist slow XLA:CPU compiles (the 320x576 oracle suites take ~10 min of
# compile each) so repeated test runs on this one-core box skip them.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
# 5 s: also persist the medium programs (jitted flax init — one program
# per model/shape since init_params wraps model.init in jax.jit) so each
# test process pays them once, not every run.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full sweep compiles hundreds of XLA:CPU programs in one process;
    accumulated JIT state has been observed to segfault the compiler late in
    the run (backend_compile of a trivial initializer program, flaky).
    Dropping executables between modules keeps the compiler state bounded at
    the cost of a few cross-module recompiles.
    """
    yield
    jax.clear_caches()
