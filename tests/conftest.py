"""Test harness config: run on a virtual 8-device CPU mesh.

Multi-chip shardings are validated with
``xla_force_host_platform_device_count`` fakes (real multi-chip hardware is not
available in CI); the driver separately dry-runs the multi-chip path via
``__graft_entry__.dryrun_multichip``.

NOTE: the axon TPU plugin in this image overrides the JAX_PLATFORMS environment
variable, so the platform must be forced via jax.config *after* import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
