"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by faking 8 XLA host
devices; set before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU-tunnel plugin in this image ignores JAX_PLATFORMS; force the
# cpu backend through the config API as well (before any backend init).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
