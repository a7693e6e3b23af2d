"""Test config: run on a virtual 8-device CPU mesh (no TPU needed).

Must set the env vars before the first jax import anywhere in the test process.
"""

import os

# NOTE: the environment pre-sets JAX_PLATFORMS to include the axon TPU plugin
# and jax 0.9 ignores the deprecated JAX_PLATFORM_NAME, so this must OVERWRITE
# JAX_PLATFORMS (a setdefault leaves tests silently running on the real chip,
# where fp32 matmuls default to one-pass bf16).
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
