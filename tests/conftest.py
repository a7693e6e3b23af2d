"""Test config: run on a virtual 8-device CPU mesh (no TPU needed).

Must set the env vars before the first jax import anywhere in the test process.
"""

import os

# NOTE: the axon TPU plugin rewrites JAX_PLATFORMS (to "axon,cpu"), so
# JAX_PLATFORMS=cpu alone does NOT force the CPU backend here; JAX_PLATFORM_NAME
# and jax.config.jax_platforms do.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
