"""Property-based sequence-packing invariants (hypothesis).

The packing stack's correctness rests on layout bookkeeping: every video is
placed exactly once, rows never overflow their bucket, the per-video layout
(row/start/length) agrees with where pack_batch actually wrote the features,
and iter_packed_batches — the shared producer feeding score_packed_stream,
Trainer.evaluate, and bench.py — covers an arbitrary index subset exactly
once with a static per-bucket capacity. Random corpora hit degenerate shapes
(all-max durations, single video, bucket-length videos) that the fixed
fixtures in test_packing.py don't.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from repurpose_tpu.data.batching import (
    iter_packed_batches,
    pack_batch,
    packing_layout,
    pick_bucket,
    plan_packing,
)


@st.composite
def corpora(draw):
    bucket = draw(st.sampled_from([64, 128, 256]))
    n = draw(st.integers(1, 24))
    durs = [draw(st.integers(1, bucket + 40)) for _ in range(n)]  # some truncate
    batch_size = draw(st.integers(1, 6))
    return durs, bucket, batch_size


@given(corpora())
@settings(max_examples=60, deadline=None)
def test_plan_packing_partition_and_fit(c):
    durs, bucket, bs = c
    plan = plan_packing(durs, bucket, bs)
    seen = [i for batch in plan for row in batch for i in row]
    assert sorted(seen) == list(range(len(durs)))  # exactly-once partition
    for batch in plan:
        assert 1 <= len(batch) <= bs
        for row in batch:
            assert sum(min(durs[i], bucket) for i in row) <= bucket


@given(corpora())
@settings(max_examples=40, deadline=None)
def test_layout_matches_written_features(c):
    """packing_layout's (row, start, length) must point at exactly the cells
    pack_batch wrote each video's features into."""
    durs, bucket, bs = c
    rng = np.random.default_rng(0)
    samples = [
        {
            "visual": rng.normal(size=(d, 3)).astype(np.float32),
            "audio": rng.normal(size=(d, 2)).astype(np.float32),
            "text": rng.normal(size=(d, 2)).astype(np.float32),
            "duration": d,
        }
        for d in durs
    ]
    rows = plan_packing(durs, bucket, bs)[0]
    flat = [i for row in rows for i in row]
    batch = pack_batch(samples, rows, bucket, batch_size=bs)
    sidx, row_of, start, length = packing_layout(rows, durs, bucket)
    assert sorted(sidx.tolist()) == sorted(flat)
    for k in range(len(sidx)):
        i, r, s, ln = int(sidx[k]), int(row_of[k]), int(start[k]), int(length[k])
        assert ln == min(durs[i], bucket)
        np.testing.assert_array_equal(
            batch.visual[r, s : s + ln], samples[i]["visual"][:ln]
        )
        np.testing.assert_array_equal(
            batch.seg_ids[r, s : s + ln],
            np.full(ln, rows[r].index(i), np.int32),
        )
        np.testing.assert_array_equal(
            batch.positions[r, s : s + ln], np.arange(ln)
        )
    # padding cells carry seg_id -1 and mask False
    assert ((batch.seg_ids >= 0) == batch.mask).all()


@given(corpora(), st.randoms(use_true_random=False))
@settings(max_examples=40, deadline=None)
def test_iter_packed_batches_covers_subset_once(c, pyrng):
    durs, bucket, bs = c
    rng = np.random.default_rng(1)
    fetched = []

    def fetch(i):
        fetched.append(i)
        d = durs[i]
        return {
            "visual": rng.normal(size=(d, 3)).astype(np.float32),
            "audio": rng.normal(size=(d, 2)).astype(np.float32),
            "text": rng.normal(size=(d, 2)).astype(np.float32),
            "duration": d,
        }

    indices = [i for i in range(len(durs)) if pyrng.random() < 0.7]
    buckets = (bucket // 2, bucket)
    got, caps = [], {}
    for batch, (row_of, start, length), gidx, samples in iter_packed_batches(
        fetch, durs, buckets, bs, indices=indices
    ):
        got += gidx
        assert len(gidx) == len(samples)
        b = batch.visual.shape[1]  # the bucket this batch compiled for
        assert len(row_of) % 8 == 0  # static capacity, lane multiple
        caps.setdefault(b, len(row_of))
        assert caps[b] == len(row_of)  # capacity constant per bucket
        # layout arrays pad with zeros past the real videos
        assert (length[len(gidx):] == 0).all()
        for k, i in enumerate(gidx):
            assert int(length[k]) == min(durs[i], b)
            assert pick_bucket(durs[i], buckets) == b
    assert sorted(got) == sorted(indices)  # exactly-once coverage
    assert sorted(fetched) == sorted(indices)  # fetched once each, no extras
