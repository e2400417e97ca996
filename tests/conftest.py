"""Test configuration: force an 8-virtual-device CPU mesh.

Tests never require TPU hardware: device-decoder correctness is validated
on CPU (jit semantics are identical), and multi-chip sharding logic runs on
a virtual 8-device host mesh via --xla_force_host_platform_device_count,
mirroring how the driver validates `dryrun_multichip`.

These env vars must be set before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
