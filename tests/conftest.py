"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding paths
compile and execute without TPU hardware (the driver separately dry-runs
the multi-chip path; the bench runs on the real chip).
"""

import os

# Force CPU: the environment presets JAX_PLATFORMS=axon (real TPU tunnel),
# which would make every test compile remotely.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize registers a remote-TPU PJRT plugin ("axon")
# in every interpreter; jax's backend discovery would then dial the TPU
# relay from each test process (minutes of stall under claim contention).
# Drop the factory before any backend is initialized.
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    # sitecustomize imports jax at interpreter start, so JAX_PLATFORMS=axon
    # is already latched in jax.config — update the live value too.
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
