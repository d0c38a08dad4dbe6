"""Host-side batch loader: bucket-aware grouping, per-host sharding, and
background prefetch.

Replaces the reference's DataLoader + DistributedSampler stack
(utils/distributed.py:435-473, main.py:157-187):

- **globally consistent batching**: the epoch permutation, bucket grouping,
  and batch composition are computed identically on every process from
  (seed, epoch) alone; each GLOBAL batch is then sliced into per-process
  local shards. All processes therefore agree on batch count, bucket shape,
  and which samples form global batch k — the invariants
  ``make_global_batch`` and cross-process collectives require. (A naive
  per-process shard-then-group, like DistributedSampler + dynamic batching,
  produces divergent shapes/counts and deadlocks multi-host training.)
- **bucket-aware grouping**: within a shuffled window, samples group by
  length bucket so batches pad to the smallest static shape (the reference
  padded to the per-batch max, a dynamic shape XLA can't cache).
- **background prefetch**: a thread keeps ``prefetch`` collated numpy batches
  ready while the device computes; abandoning the iterator early (e.g. the
  val probe's islice) shuts the worker down instead of leaking it blocked on
  the queue.

Deterministic across hosts: everything derives from (seed, epoch).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from repurpose_tpu.data.batching import (
    Batch, collate, pack_batch, pick_bucket, plan_packing,
)


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
        pack: bool = False,
    ):
        """``pack=True`` switches to SEQUENCE-PACKED batches: every window's
        videos first-fit-decreasing into rows of the LARGEST bucket
        (plan_packing), so a row holds several head-to-tail videos with
        block-diagonal attention instead of padding (data/batching.py:
        pack_batch; exactness proven in tests/test_packing.py).
        ``batch_size`` then counts ROWS, and per-step video throughput rises
        by the packing factor (~1.5x at corpus durations, bucket 2048)."""
        if not pad_last and not drop_last and process_count > 1:
            # A ragged global tail splits unevenly across the strided shards
            # (7 samples on 2 processes -> local batches of 4 and 3), so the
            # hosts would feed DIFFERENT shapes into the same collective
            # program — the cross-host divergence this loader exists to
            # prevent. Refuse rather than hang at the first ragged batch.
            raise ValueError(
                "pad_last=False with process_count > 1 produces divergent "
                "per-host batch shapes on ragged tails; use pad_last=True "
                "(default) or drop_last=True"
            )
        self.dataset = dataset
        self.batch_size = batch_size  # per process
        self.buckets = tuple(buckets)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.bucket_window = max(bucket_window, batch_size * process_count)
        self.pack = pack
        self._lengths = dataset.lengths() if hasattr(dataset, "lengths") else None
        if pack and self._lengths is None:
            raise ValueError("pack=True needs a dataset exposing .lengths()")
        self._plan_cache: tuple[int, list] | None = None

    def _epoch_batches(self, epoch: int) -> list[tuple[int, list[int]]]:
        """GLOBAL batch plan: [(bucket, sample_indices)] — identical on every
        process. Each entry holds up to batch_size * process_count samples.
        Memoized per epoch: the plan is a pure function of (seed, epoch,
        lengths), and repeat callers — the val probe's epoch(0) every 50
        steps, batches_per_epoch + epoch at init — would otherwise redo the
        O(n) grouping on this one-core host each time."""
        if self._plan_cache is not None and self._plan_cache[0] == epoch:
            return self._plan_cache[1]
        plan = self._build_epoch_batches(epoch)
        self._plan_cache = (epoch, plan)
        return plan

    def _build_epoch_batches(self, epoch: int) -> list[tuple[int, list[int]]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            order = rng.permutation(n)
        gbs = self.batch_size * self.process_count
        if self.pack:
            # SEQUENCE PACKING: FFD each shuffled window into rows of the
            # largest bucket; a "batch" is up to gbs ROWS (each several
            # videos). Identical plan on every process (derives from
            # (seed, epoch) alone), sliced per-process in epoch().
            bucket = self.buckets[-1]
            packed: list[tuple[int, list[list[int]]]] = []
            for w0 in range(0, len(order), self.bucket_window):
                window = [int(i) for i in order[w0 : w0 + self.bucket_window]]
                plan = plan_packing(
                    [self._lengths[i] for i in window], bucket, gbs
                )
                for rows in plan:
                    packed.append((bucket, [[window[j] for j in row] for row in rows]))
            if self.drop_last:
                packed = [b for b in packed if len(b[1]) == gbs]
            elif self.process_count > 1:
                # each process needs >= 1 row to derive dims from
                packed = [b for b in packed if len(b[1]) >= self.process_count]
            if epoch == 0 and packed:  # packing efficiency, once per run
                import logging

                rows = [r for _, batch_rows in packed for r in batch_rows]
                fill = sum(
                    min(self._lengths[i], bucket) for r in rows for i in r
                ) / (len(rows) * bucket)
                logging.getLogger(__name__).info(
                    "sequence packing: %d videos in %d rows of %d "
                    "(%.2f videos/row, fill %.1f%%)",
                    sum(len(r) for r in rows), len(rows), bucket,
                    sum(len(r) for r in rows) / len(rows), 100 * fill,
                )
            return packed
        batches: list[tuple[int, list[int]]] = []
        if self._lengths is None:
            for i in range(0, len(order), gbs):
                idxs = [int(j) for j in order[i : i + gbs]]
                batches.append((self.buckets[-1], idxs))
        else:
            for w0 in range(0, len(order), self.bucket_window):
                window = order[w0 : w0 + self.bucket_window]
                by_bucket: dict[int, list[int]] = {}
                for i in window:
                    b = pick_bucket(self._lengths[int(i)], self.buckets)
                    by_bucket.setdefault(b, []).append(int(i))
                for bucket, idxs in by_bucket.items():
                    for j in range(0, len(idxs), gbs):
                        batches.append((bucket, idxs[j : j + gbs]))
        if self.drop_last:
            batches = [b for b in batches if len(b[1]) == gbs]
        elif self.process_count > 1:
            # Every process must contribute >= 1 real sample to each global
            # batch (an all-padding shard has no sample to derive dims from),
            # so drop ragged tails smaller than the process count.
            kept = [b for b in batches if len(b[1]) >= self.process_count]
            dropped = sum(len(b[1]) for b in batches) - sum(len(b[1]) for b in kept)
            if dropped:
                import logging

                logging.getLogger(__name__).info(
                    "multi-host loader: dropped %d samples in (window, bucket) "
                    "tails smaller than process_count=%d this epoch",
                    dropped, self.process_count,
                )
            batches = kept
        return batches

    def batches_per_epoch(self, epoch: int = 0) -> int:
        return len(self._epoch_batches(epoch))

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        """Iterate this process's shard of each global batch, prefetched."""
        batches = self._epoch_batches(epoch)
        load_batch = getattr(self.dataset, "load_batch", None)
        pad_b = self.batch_size if self.pad_last else None
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Queue-put that gives up when the consumer is gone."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for bucket, idxs in batches:
                    if stop.is_set():
                        return
                    if self.pack:
                        # idxs is a list of ROWS (index lists); shard rows
                        rows = idxs[self.process_index :: self.process_count]
                        flat = [i for row in rows for i in row]
                        samples = [self.dataset[i] for i in flat]
                        remap = {i: j for j, i in enumerate(flat)}
                        batch = pack_batch(
                            samples, [[remap[i] for i in row] for row in rows],
                            bucket, pad_b,
                        )
                        if not put(batch):
                            return
                        continue
                    local = idxs[self.process_index :: self.process_count]
                    batch = (
                        load_batch(local, (bucket,), pad_b)
                        if load_batch is not None
                        else None
                    )
                    if batch is None:  # per-sample fallback path
                        samples = [self.dataset[i] for i in local]
                        batch = collate(samples, (bucket,), pad_b)
                    if not put(batch):
                        return
                put(None)
            except BaseException as e:  # surface loader errors to the consumer
                put(e)

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
            while True:  # unblock a worker mid-put
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
