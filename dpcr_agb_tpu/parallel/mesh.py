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


def _leaf_spec(leaf) -> P:
    # batch leaves all carry the batch axis first
    return P("data") if np.ndim(leaf) >= 1 else P()


def batch_sharding(mesh: Mesh, batch):
    """NamedSharding pytree matching `batch` — batch axis over 'data'."""
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf)), batch)


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch onto the mesh with batch-axis sharding."""
    return jax.device_put(batch, batch_sharding(mesh, batch))
