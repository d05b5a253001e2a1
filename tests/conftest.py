"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real multi-chip hardware is not available in CI; the sharding/collective
paths are validated on ``xla_force_host_platform_device_count=8`` exactly as
the driver's ``dryrun_multichip`` does.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# float64 for precision-sensitive gate tests (env var can be preempted by
# plugins importing jax first, so set the config flag directly).
jax.config.update("jax_enable_x64", True)
