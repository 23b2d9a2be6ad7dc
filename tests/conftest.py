"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding (mesh/pjit) paths are exercised without TPU hardware, exactly as the
driver's `dryrun_multichip` does.

NOTE: this image ships a sitecustomize (/root/.axon_site) that force-sets
jax_platforms to "axon,cpu" — env vars alone are ignored, so we override via
jax.config before any backend is initialized. Without this, every test op
would round-trip through the remote TPU tunnel (~60s per dispatch)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
