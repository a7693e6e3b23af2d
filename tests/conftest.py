"""Test config: run on a virtual 8-device CPU mesh (no TPU needed).

The axon environment's sitecustomize imports jax at interpreter startup and
pins `jax_platforms = "axon,cpu"` via an explicit `jax.config.update` — so by
the time this conftest runs, env-var overwrites (JAX_PLATFORMS=...) are DEAD:
explicitly-set config wins over the environment.  The only reliable override is
another explicit `jax.config.update` before any backend is initialized.
XLA_FLAGS is still read lazily at CPU-client creation, so setting the virtual
device count here works as long as no test touched a device first.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# kept for subprocesses spawned by tests (they re-run sitecustomize, but a
# fresh process + these vars + the config.update below in *their* conftest
# path is what the runtime tests rely on)
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (deliberately after the env setup)

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    # fail LOUDLY if the override ever stops working — a suite silently running
    # on the remote-TPU tunnel is ~100x slower and numerically different
    # (bf16 matmuls), which is exactly how it bit us before
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}"
    )
    assert len(jax.devices()) >= 8, (
        f"expected >= 8 virtual CPU devices, got {len(jax.devices())}"
    )
