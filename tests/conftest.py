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

# Persistent compile cache: the fast gate is dominated by CPU compiles of
# whole-model parity programs (45 s for one SENet14 forward); executables
# are content-addressed by HLO hash, so warm runs skip them safely. Opt
# out with DPCR_TEST_NO_CACHE=1 (e.g. to measure true compile cost).
if not os.environ.get("DPCR_TEST_NO_CACHE"):
    _cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except OSError:
        pass  # read-only checkout: compile uncached

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
