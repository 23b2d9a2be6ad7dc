"""Host-side batch loader: per-sample augmentation (phase B) + fixed-shape
collate, with threaded prefetch so transform work overlaps device compute —
the reference runs its per-batch CPU work synchronously (DataLoader workers,
base_dataset.py:255-267; KPConv's pyramid even ran on the main thread,
SURVEY.md §3.5).

Determinism: each sample's transform RNG is derived from
SeedSequence(seed, epoch, position) — a pure function of the run seed, epoch,
and position in the epoch's index stream, independent of worker scheduling.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, List, Optional, Tuple

import numpy as np

from .batch import Batch, CollateSpec, collate
from .dataset import Las, RandomSampler


class Loader:
    def __init__(self, dataset: Las, transform: Callable, batch_size: int,
                 spec: CollateSpec, shuffle: bool = False,
                 double_batch: bool = False, drop_last: bool = True,
                 seed: int = 0, num_workers: int = 4, prefetch: int = 2,
                 post_collate: Optional[Callable] = None,
                 pre_batch_collate: Optional[Callable] = None,
                 shard: Optional[Tuple[int, int]] = None,
                 put_fn: Optional[Callable] = None):
        self.dataset = dataset
        self.transform = transform
        self.batch_size = batch_size
        self.spec = spec
        self.shuffle = shuffle
        self.double_batch = double_batch
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.post_collate = post_collate
        self.pre_batch_collate = pre_batch_collate
        # optional device placement in the worker threads (e.g.
        # StepRunner.device_put): the host->device copy of batch k+1 then
        # overlaps the device step of batch k instead of serializing at
        # dispatch time — on a remote-TPU transport the per-batch transfer
        # is otherwise on the critical path
        self.put_fn = put_fn
        # multi-host data parallelism: shard=(process_index, process_count).
        # batch_size stays GLOBAL; every process derives the SAME epoch index
        # stream (identical seed), then builds only its contiguous
        # batch_size/process_count slice of each batch. Per-sample transform
        # RNG is keyed by GLOBAL position, so the global batch content is
        # bit-identical to a single-process run (test-asserted).
        self.shard = shard or (0, 1)
        pi, pc = self.shard
        if batch_size % pc:
            raise ValueError(f"batch_size {batch_size} must divide by "
                             f"process_count {pc}")
        if double_batch and (batch_size // pc) % 2:
            raise ValueError("double_batch pairs are adjacent; the local "
                             "per-process batch must be even")
        self.local_batch_size = batch_size // pc
        self.sampler = RandomSampler(len(dataset), batch_size, double_batch) \
            if shuffle else None

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        if self.sampler is not None:
            rng = np.random.default_rng(
                np.random.SeedSequence(entropy=self.seed,
                                       spawn_key=(epoch, 0)))
            return self.sampler.indices(rng)
        idx = np.arange(len(self.dataset))
        if self.drop_last and len(idx) >= self.batch_size:
            idx = idx[:(len(idx) // self.batch_size) * self.batch_size]
        return idx

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.double_batch and self.shuffle:
            n *= 2
        if self.drop_last or self.shuffle:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_sample(self, epoch: int, position: int, idx: int,
                     is_double: bool) -> dict:
        sample = self.dataset.get(int(idx))
        sample["is_double"] = is_double
        rng = np.random.default_rng(
            np.random.SeedSequence(entropy=self.seed,
                                   spawn_key=(epoch, position + 1)))
        return self.transform(rng, sample)

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        indices = self._epoch_indices(epoch)
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if not batches:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        pi, pc = self.shard
        local = self.local_batch_size

        def build(bi, batch_idx):
            """One whole batch: transforms + collate + post_collate. Batches
            build CONCURRENTLY across workers (the heavy host work — e.g.
            the KPConv C++ pyramid at ~2.5 s/batch — must not serialize on
            one producer thread); results are forwarded in order."""
            # double-batch pairing looks at the GLOBAL index stream, then the
            # process keeps its own contiguous slice
            doubles = np.zeros(len(batch_idx), dtype=bool)
            doubles[1:] = batch_idx[1:] == batch_idx[:-1]
            lo = min(pi * local, len(batch_idx))
            hi = min(lo + local, len(batch_idx))
            samples = [self._make_sample(epoch, bi * self.batch_size + j,
                                         batch_idx[j], doubles[j])
                       for j in range(lo, hi)]
            empty = not samples
            if empty:
                # ragged final batch left this process empty: an all-padding
                # batch (valid=False everywhere) keeps it in the collective
                samples = [self._make_sample(epoch, bi * self.batch_size,
                                             batch_idx[0], False)]
            if self.pre_batch_collate is not None:
                # may DROP samples (ClampBatchSize point budget); the dropped
                # tail becomes ordinary batch padding via pad_to_batch
                samples = self.pre_batch_collate(samples)
            b = collate(samples, self.spec, pad_to_batch=local,
                        n_valid=0 if empty else None)
            if self.post_collate is not None:
                b = self.post_collate(b)
            if self.put_fn is not None:
                b = self.put_fn(b)
            return b

        def produce():
            from collections import deque
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    futs: deque = deque()
                    it = iter(enumerate(batches))
                    exhausted = False
                    in_flight = self.num_workers + self.prefetch
                    while not stop.is_set():
                        while not exhausted and len(futs) < in_flight:
                            try:
                                bi, bidx = next(it)
                            except StopIteration:
                                exhausted = True
                                break
                            futs.append(pool.submit(build, bi, bidx))
                        if not futs:
                            break
                        q.put(futs.popleft().result())
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=5)
