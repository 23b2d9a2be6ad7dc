"""Batch-layout switch for the flat-row scatter/gather formulations.

Single chip, the TPU-fast form of every batched scatter/gather is the
BATCH-FLATTENED one: one 2D row op over a [B*S, C] table with global row
indices `batch*S + cell` (row-rate ~2x the vmapped per-sample form —
docs/experiments/round2/README.md). Under a data-parallel mesh that form
is a disaster: GSPMD cannot prove the global indices stay inside each
shard's rows, so it materializes the FULL table per device and inserts a
table-sized all-reduce/all-gather per op (observed in the compiled HLO of
the mesh train step: a [B*D*H*W, C] all-reduce per scatter — hundreds of
MB per step at NFI shapes).

`BATCH_LOCAL = True` (set by StepRunner whenever it holds a mesh) makes
those ops keep the batch dimension explicit (vmap of the per-sample op):
GSPMD partitions a batched scatter/gather along the leading dim with ZERO
communication. The math is identical either way (parity-tested); only the
lowering changes. Single-chip paths (bench.py, mesh=None) keep the
flattened form.
"""
from __future__ import annotations

BATCH_LOCAL = False
# data-parallel degree: the traced batch dim is the GLOBAL batch under a
# GSPMD jit, but transient-memory budgets (the stem's fold table) must be
# sized for the PER-DEVICE shard = global / degree
DATA_PARALLEL_DEGREE = 1


def set_batch_local(value: bool, data_parallel_degree: int = 1) -> None:
    """Flip the layout globally — call BEFORE tracing any step (StepRunner
    does this in __post_init__; flags are read at trace time)."""
    global BATCH_LOCAL, DATA_PARALLEL_DEGREE
    BATCH_LOCAL = bool(value)
    DATA_PARALLEL_DEGREE = max(1, int(data_parallel_degree))
