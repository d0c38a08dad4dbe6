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


def test_host_sharding_disjoint():
    ds = _ds(16)
    all_seen = []
    for pi in range(4):
        loader = BatchLoader(
            ds, batch_size=2, buckets=BUCKETS, seed=5,
            process_index=pi, process_count=4,
        )
        for batch in loader.epoch(0):
            all_seen.extend(d for d in batch.durations.tolist() if d > 0)
    assert sorted(all_seen) == sorted(ds.lengths())


def test_bucket_grouping_minimizes_padding():
    # All samples in one window: every batch must be single-bucket.
    ds = _ds(24)
    loader = BatchLoader(ds, batch_size=4, buckets=BUCKETS, bucket_window=24)
    for batch in loader.epoch(0):
        t = batch.visual.shape[1]
        assert t in BUCKETS
        real = batch.durations[batch.durations > 0]
        assert (real <= t).all()
        # every real sample actually belongs in this bucket (not a smaller one)
        smaller = [b for b in BUCKETS if b < t]
        if smaller:
            assert (real > smaller[-1]).any() or len(real) > 0


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
