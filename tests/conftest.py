"""Test configuration: run on CPU (8 virtual devices) in float64.

Mirrors the reference CI setup (ubuntu CPU, oversubscribed MPI ranks ->
here: xla_force_host_platform_device_count virtual devices).
"""

import os

# must happen before jax initializes a backend
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402
import pytest  # noqa: E402

# the axon TPU plugin overrides JAX_PLATFORMS; force CPU programmatically
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True)
def _restore_x64():
    """float32-precision Simulations disable x64 globally; restore it so
    later tests keep their f64 regression thresholds."""
    yield
    jax.config.update("jax_enable_x64", True)
