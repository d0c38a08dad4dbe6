"""Host-side batch loader: bucket-aware grouping, per-host sharding, and
background prefetch.

Replaces the reference's DataLoader + DistributedSampler stack
(utils/distributed.py:435-473, main.py:157-187):

- **per-host sharding**: each JAX process reads a disjoint strided slice of
  the epoch permutation (what DistributedSampler did per rank);
- **bucket-aware grouping**: within a shuffled window, samples are grouped by
  length bucket so batches pad to the smallest static shape (the reference
  padded to the per-batch max, a dynamic shape XLA can't cache);
- **background prefetch**: a thread keeps ``prefetch`` collated numpy batches
  ready while the device computes (the reference used worker processes;
  feature loading here is numpy-mmap-bound, so threads suffice and avoid
  fork overhead).

Deterministic across hosts: the permutation is seeded by (seed, epoch) only.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Sequence

import numpy as np

from repurpose_tpu.data.batching import Batch, collate, pick_bucket


class BatchLoader:
    def __init__(
        self,
        dataset,  # indexable with .lengths()
        batch_size: int,
        buckets: Sequence[int],
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        pad_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
        bucket_window: int = 64,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.buckets = tuple(buckets)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.bucket_window = max(bucket_window, batch_size)
        self._lengths = dataset.lengths() if hasattr(dataset, "lengths") else None

    def _epoch_batches(self, epoch: int) -> list[list[int]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            order = rng.permutation(n)
        order = order[self.process_index :: self.process_count]
        batches: list[list[int]] = []
        if self._lengths is None:
            chunks = [order[i : i + self.batch_size] for i in range(0, len(order), self.batch_size)]
            batches = [list(c) for c in chunks]
        else:
            # Group by bucket within a shuffled window: keeps randomness while
            # minimizing padding waste.
            for w0 in range(0, len(order), self.bucket_window):
                window = order[w0 : w0 + self.bucket_window]
                by_bucket: dict[int, list[int]] = {}
                for i in window:
                    b = pick_bucket(self._lengths[int(i)], self.buckets)
                    by_bucket.setdefault(b, []).append(int(i))
                for idxs in by_bucket.values():
                    for j in range(0, len(idxs), self.batch_size):
                        batches.append(idxs[j : j + self.batch_size])
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    def batches_per_epoch(self, epoch: int = 0) -> int:
        return len(self._epoch_batches(epoch))

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        """Iterate collated batches for one epoch, prefetched by a thread."""
        batches = self._epoch_batches(epoch)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        load_batch = getattr(self.dataset, "load_batch", None)
        pad_b = self.batch_size if self.pad_last else None

        def worker():
            try:
                for idxs in batches:
                    if stop.is_set():
                        return
                    batch = (
                        load_batch(idxs, self.buckets, pad_b)
                        if load_batch is not None
                        else None
                    )
                    if batch is None:  # per-sample fallback path
                        samples = [self.dataset[i] for i in idxs]
                        batch = collate(samples, self.buckets, pad_b)
                    q.put(batch)
                q.put(None)
            except BaseException as e:  # surface loader errors to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
