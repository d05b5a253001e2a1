"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real multi-chip hardware is not available in CI; the sharding/collective
paths are validated on ``xla_force_host_platform_device_count=8`` exactly as
the driver's ``dryrun_multichip`` does.
"""
import os

# Force CPU: the session environment may pre-set JAX_PLATFORMS to the real
# TPU backend, which (a) lacks float64/complex128 and (b) routes every test
# compile through the remote-compile tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The session's axon (TPU) plugin overrides JAX_PLATFORMS programmatically,
# so force the platform through the config API as well — tests must run on
# the virtual 8-device CPU backend (float64/complex128 + sharding paths).
jax.config.update("jax_platforms", "cpu")
# float64 for precision-sensitive gate tests (env var can be preempted by
# plugins importing jax first, so set the config flag directly).
jax.config.update("jax_enable_x64", True)
