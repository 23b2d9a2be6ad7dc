"""Gather-rate vs table size on v5e: is the TPU row gather fast only when
the table fits VMEM?

Observed rates: KPConv level-0 gather (33 MB f32 table) ~1.8 ns/row;
every sparse-L0 gather over dense-volume tables (40-475 MB) ~13-25
ns/row. If the cliff is table size, the sparse stem must route all
gathers through VMEM-resident tables (row-space, not dense-volume).

Run ON THE REAL TPU: python docs/experiments/round2/exp_gather_scaling.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_protocol import timed_diff

R = 5_000_000  # rows gathered per iteration


def chain_gather(n_rows, c, dt):
    def make(n):
        def run(table, idx):
            def body(t, _):
                g = t[idx]                      # [R, C]
                # feedback: fold the gathered sum back into the table
                t2 = t + (jnp.sum(g, dtype=jnp.float32)
                          * 1e-12).astype(t.dtype)
                return t2, None
            out, _ = jax.lax.scan(body, table, None, length=n)
            return out
        return run
    return make


def main():
    rng = np.random.default_rng(0)
    # (the 11M-row f32 C64 config OOMs: the scan chain carries ~3 copies
    # of the 2.8 GB table)
    for c, dt, label, sizes in [
            (64, jnp.bfloat16, "bf16 C64", (131_072, 1_000_000)),
            (21, jnp.bfloat16, "bf16 C21", (131_072, 1_000_000, 11_000_000)),
            (147, jnp.bfloat16, "bf16 C147", (131_072, 1_000_000)),
            (1, jnp.int32, "int32 C1", (1_000_000, 11_000_000))]:
        for n_rows in sizes:
            nbytes = n_rows * c * np.dtype(
                np.float32 if dt == jnp.float32 else
                np.int32 if dt == jnp.int32 else np.float16).itemsize
            if dt == jnp.int32:
                table = jnp.asarray(
                    rng.integers(0, 100, (n_rows, c)), jnp.int32)
            else:
                table = jnp.asarray(
                    rng.normal(size=(n_rows, c)), dt)
            idx = jnp.asarray(
                rng.integers(0, n_rows, (R,)), jnp.int32)
            ms = timed_diff(chain_gather(n_rows, c, dt), (table, idx))
            print(f"{label:9s} table {nbytes/1e6:7.1f} MB "
                  f"({n_rows:>9d} rows): {ms:8.2f} ms "
                  f"= {ms*1e6/R:6.2f} ns/row")


if __name__ == "__main__":
    main()
