"""Test configuration: force an 8-virtual-device CPU mesh.

Tests never require TPU hardware: device-decoder correctness is validated
on CPU (jit semantics are identical), and multi-chip sharding logic runs on
a virtual 8-device host mesh via --xla_force_host_platform_device_count,
mirroring how the driver validates `dryrun_multichip`.

These env vars must be set before jax is imported anywhere.
"""

import os
import sys

# Override unconditionally: the surrounding environment pins
# JAX_PLATFORMS=axon (the tunneled TPU) and a sitecustomize imports jax at
# interpreter startup, so env vars set here are too late — but the backend
# is still uninitialized, so jax.config can force the CPU platform and an
# 8-device virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The suite compiles hundreds of jitted programs across 8 virtual CPU
    devices; accumulated executables/thread pools eventually segfault the
    CPU client deep into the run (observed repeatedly in full-suite runs
    at the same test while every module passes in isolation).  Dropping
    executable caches per module keeps the process footprint flat; jitted
    functions recompile lazily if reused.
    """
    yield
    import jax

    jax.clear_caches()
