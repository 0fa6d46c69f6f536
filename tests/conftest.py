"""Test config: force CPU with 8 virtual devices (multi-chip simulation).

Must run before jax initializes — pytest imports conftest first.
"""

import os

# Force-override: the environment ships JAX_PLATFORMS=axon (remote TPU) and
# preloads jax via sitecustomize, so plain setdefault is not enough.  The
# backend itself is only initialized on first use, which happens after this.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
