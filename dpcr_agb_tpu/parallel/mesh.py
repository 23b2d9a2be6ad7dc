"""Mesh construction + sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(trainer.py:149-150). Here the train step is one jitted program over a
`jax.sharding.Mesh` with a `data` axis: the batch is sharded, params are
replicated, and XLA inserts the gradient/BN-moment collectives over ICI
(gradient psum = the DataParallel gather, but compiler-scheduled). Model
axes (tensor parallel etc.) are unnecessary at these model sizes
(SURVEY.md §2.10) but the mesh API accepts extra axes for forward-compat.

Layout note: whenever a StepRunner holds a mesh it flips
`ops/layout.BATCH_LOCAL` so every batch-flattened scatter/gather switches
to its batch-dim-preserving form — GSPMD partitions those along 'data'
with zero communication, where the flattened forms forced table-sized
all-reduces (tests/test_parallel.py asserts the compiled step's
collectives stay gradient-sized).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # remaining axes get size 1 unless the caller reshapes explicitly
        shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# aux leaves that are pure shape tags, replicated regardless of their
# length (a [Z] zcells tag whose Z coincidentally equals the batch size
# must NOT be batch-sharded — that would mangle the model's z extent
# under multi-host)
_TAG_KEYS = frozenset({"zcells"})


def _path_is_tag(path) -> bool:
    return any(getattr(k, "key", None) in _TAG_KEYS for k in path)


def _leaf_spec(path, leaf, bs: Optional[int] = None) -> P:
    # per-sample leaves carry the batch axis first; aux leaves that are NOT
    # per-sample (shape tags like zcells, or anything without the batch
    # leading dim) stay replicated
    if _path_is_tag(path) or np.ndim(leaf) < 1:
        return P()
    if bs is not None and np.shape(leaf)[0] != bs:
        return P()
    return P("data")


def batch_sharding(mesh: Mesh, batch):
    """NamedSharding pytree matching `batch` — batch axis over 'data'."""
    bs = getattr(batch, "batch_size", None)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _leaf_spec(path, leaf, bs)),
        batch)


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch onto the mesh with batch-axis sharding."""
    return jax.device_put(batch, batch_sharding(mesh, batch))


_dist_initialized = False


def maybe_init_distributed() -> None:
    """Multi-host (DCN) bring-up: `jax.distributed.initialize()` when a
    launcher configured it (DPCR_MULTIHOST=1; coordinator/num_processes/
    process_id come from the standard JAX env vars or cloud autodetection).
    Must run before the first backend query. The reference has no multi-node
    story at all (SURVEY.md §5.8 — single-process nn.DataParallel); on TPU
    the same pjit program then spans pods, gradients psum over ICI within a
    slice and DCN across slices."""
    global _dist_initialized
    import os
    if _dist_initialized or os.environ.get("DPCR_MULTIHOST", "0") != "1":
        return
    jax.distributed.initialize()
    _dist_initialized = True


def put_global_batch(mesh: Mesh, batch):
    """Assemble the jit input batch from THIS process's local shard.

    Single-process: plain sharded device_put. Multi-process: every process
    holds batch_size/process_count samples (Loader shard=...); the global
    jax.Array spanning all hosts' devices is stitched with
    make_array_from_process_local_data — no cross-host data movement, each
    host feeds only its own devices."""
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    bs = getattr(batch, "batch_size", None)

    def leaf_to_global(path, leaf):
        leaf = np.asarray(leaf)
        sh = NamedSharding(mesh, _leaf_spec(path, leaf, bs))
        # replicated leaves (non-per-sample aux) must be identical on every
        # process; their global shape equals the local shape
        return jax.make_array_from_process_local_data(sh, leaf)

    return jax.tree_util.tree_map_with_path(leaf_to_global, batch)
