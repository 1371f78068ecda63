"""Test configuration: CPU backend, 8 virtual devices, float64.

The environment pre-imports jax (sitecustomize) with JAX_PLATFORMS possibly
pointing at a TPU platform, so we must switch the platform via jax.config —
which works as long as no backend has been initialised yet — and set the
host-device-count XLA flag before first backend use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
