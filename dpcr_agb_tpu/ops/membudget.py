"""Device-derived HBM limit for sizing transient-tensor budgets.

Round-3 post-mortem (VERDICT r3 weak #1): the sparse-stem fold table and
the fused-pool backward cube table were sized by FIXED byte constants
tuned at the bs16/bench dims, so the paper-protocol shapes (bs32, NFI
z-extent 104 vs bench 80) overflowed the 15.75G HBM on the real chip
while bench stayed green. Every transient budget must instead derive
from the device's actual memory limit so shape growth degrades into
chunking, never into an OOM.

`hbm_bytes_limit()` asks the runtime (PJRT `memory_stats()["bytes_limit"]`,
available on TPU); `DPCR_HBM_BYTES` overrides for experiments; the
fallback is a v5e-class 16 GB so CPU test runs make the same chunking
decisions as the chip unless a test forces its own budget.
"""
from __future__ import annotations

import functools
import os

import jax


@functools.lru_cache(maxsize=1)
def hbm_bytes_limit() -> int:
    env = os.environ.get("DPCR_HBM_BYTES")
    if env:
        return int(env)
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return limit
    except Exception:  # backends without memory_stats (some CPU builds)
        pass
    return 16_000_000_000
