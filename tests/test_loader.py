"""BatchLoader: determinism, host sharding, bucket grouping, error surfacing."""

import numpy as np
import pytest

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.data.loader import BatchLoader
from repurpose_tpu.data.synthetic import SyntheticDataset

TINY = ModelConfig(vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1, num_heads=2)
BUCKETS = (128, 256)


def _ds(n=12, seed=0):
    rng = np.random.default_rng(seed)
    return SyntheticDataset(rng.integers(40, 250, n).tolist(), TINY, seed=seed)


def test_epoch_determinism_and_reshuffle():
    ds = _ds()
    loader = BatchLoader(ds, batch_size=3, buckets=BUCKETS, seed=7)
    a = [b.durations.tolist() for b in loader.epoch(0)]
    b = [b.durations.tolist() for b in loader.epoch(0)]
    c = [b.durations.tolist() for b in loader.epoch(1)]
    assert a == b  # same epoch -> same order
    assert a != c  # new epoch -> reshuffled (set_epoch parity)


def test_all_samples_covered_once():
    ds = _ds()
    loader = BatchLoader(ds, batch_size=3, buckets=BUCKETS, shuffle=True)
    seen = []
    for batch in loader.epoch(0):
        seen.extend(d for d in batch.durations.tolist() if d > 0)
    assert sorted(seen) == sorted(ds.lengths())


def test_host_sharding_disjoint_and_consistent():
    ds = _ds(16)
    loaders = [
        BatchLoader(
            ds, batch_size=2, buckets=BUCKETS, seed=5,
            process_index=pi, process_count=4,
        )
        for pi in range(4)
    ]
    # All processes agree on the GLOBAL batch plan (count + buckets + members).
    plans = [ld._epoch_batches(0) for ld in loaders]
    assert all(p == plans[0] for p in plans[1:])
    planned = [i for _, idxs in plans[0] for i in idxs]
    assert len(planned) == len(set(planned))  # no duplicates

    per_process = [list(ld.epoch(0)) for ld in loaders]
    counts = {len(b) for b in per_process}
    assert counts == {len(plans[0])}  # identical batch counts per process
    all_seen = []
    for k in range(len(plans[0])):
        shapes = {per_process[pi][k].visual.shape for pi in range(4)}
        assert len(shapes) == 1  # identical global shapes per step
        for pi in range(4):
            all_seen.extend(
                d for d in per_process[pi][k].durations.tolist() if d > 0
            )
    # Every planned sample is consumed exactly once across processes (ragged
    # tails smaller than process_count are dropped by design).
    assert sorted(all_seen) == sorted(ds.lengths()[i] for i in planned)


def test_loader_early_abandonment_stops_worker():
    import threading

    ds = _ds(24)
    loader = BatchLoader(ds, batch_size=2, buckets=BUCKETS, prefetch=2)
    before = threading.active_count()
    for _ in range(3):
        it = loader.epoch(0)
        next(it)
        it.close()  # abandon early (the val-probe islice pattern)
    import time

    time.sleep(1.0)
    assert threading.active_count() <= before + 1  # workers exited, no leak


def test_bucket_grouping_minimizes_padding():
    # All samples in one window: every batch must be single-bucket.
    ds = _ds(24)
    loader = BatchLoader(ds, batch_size=4, buckets=BUCKETS, bucket_window=24)
    for batch in loader.epoch(0):
        t = batch.visual.shape[1]
        assert t in BUCKETS
        real = batch.durations[batch.durations > 0]
        assert (real <= t).all()
        # at least one real sample actually NEEDS this bucket (a smaller one
        # would not fit it) — otherwise the grouping wastes padding
        smaller = [b for b in BUCKETS if b < t]
        if smaller and len(real):
            assert (real > smaller[-1]).any()


def test_loader_error_propagates():
    class Broken:
        def __len__(self):
            return 2

        def lengths(self):
            return [10, 10]

        def __getitem__(self, i):
            raise RuntimeError("corrupt sample")

    loader = BatchLoader(Broken(), batch_size=1, buckets=(16,))
    with pytest.raises(RuntimeError, match="corrupt sample"):
        list(loader.epoch(0))


def test_multiprocess_requires_pad_or_drop():
    """pad_last=False with process_count > 1 would give hosts different
    local batch shapes on ragged tails (collective shape divergence)."""
    import pytest

    with pytest.raises(ValueError, match="pad_last"):
        BatchLoader(
            _ds(), batch_size=4, buckets=(256,), pad_last=False,
            process_index=0, process_count=2,
        )
