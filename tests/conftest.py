"""Test config: run all tests on a virtual 8-device CPU mesh.

The container pins JAX_PLATFORMS=axon (a TPU tunnel, registered from
sitecustomize at interpreter startup).  The axon backend is slow to
initialise and defaults f32 matmuls to bf16 passes, so tests run on CPU with
deterministic f32 matmuls.  jax was already imported by sitecustomize, so the
env var is stale — use jax.config, which takes effect as long as no backend
has been initialised yet.
"""

import os

# Must be set before the first backend initialisation (read lazily).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
