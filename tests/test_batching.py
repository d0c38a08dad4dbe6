"""Bucketed collate: static shapes, masks, padding semantics."""

import numpy as np
import pytest

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.data.batching import collate, pick_bucket
from repurpose_tpu.data.synthetic import SyntheticDataset

TINY = ModelConfig(vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1, num_heads=2)


@pytest.mark.parametrize(
    "length,want", [(1, 128), (128, 128), (129, 256), (512, 512), (9999, 512)]
)
def test_pick_bucket(length, want):
    assert pick_bucket(length, (128, 256, 512)) == want


def test_collate_shapes_and_mask():
    ds = SyntheticDataset([100, 220, 60], TINY, seed=1)
    batch = collate([ds[0], ds[1], ds[2]], buckets=(128, 256), batch_size=4)
    assert batch.visual.shape == (4, 256, 8)
    assert batch.audio.shape == (4, 256, 12)
    assert batch.text.shape == (4, 256, 4)
    assert batch.labels.shape == (4, 256)
    assert batch.segments.shape == (4, 256, 2)
    # durations: synthetic samples have duration = seconds + 1
    np.testing.assert_array_equal(batch.durations, [101, 221, 61, 0])
    for i, d in enumerate([101, 221, 61, 0]):
        assert batch.mask[i, :d].all() and not batch.mask[i, d:].any()
    # padded rows are all-zero
    assert not batch.visual[3].any() and not batch.labels[0, 101:].any()


def test_collate_truncates_to_largest_bucket():
    ds = SyntheticDataset([400], TINY, seed=2)
    batch = collate([ds[0]], buckets=(128, 256))
    assert batch.visual.shape[1] == 256
    assert batch.durations[0] == 256
    np.testing.assert_array_equal(batch.visual[0], ds[0]["visual"][:256])


def test_collate_content_roundtrip():
    ds = SyntheticDataset([50], TINY, seed=3)
    s = ds[0]
    batch = collate([s], buckets=(64,))
    np.testing.assert_array_equal(batch.visual[0, :51], s["visual"])
    np.testing.assert_array_equal(batch.labels[0, :51], s["labels"])
    np.testing.assert_array_equal(batch.segments[0, :51], s["segments"])


# -- profile-guided bucket selection (round 2) -----------------------------------


def test_suggest_buckets_optimal_simple():
    from repurpose_tpu.data.buckets import padding_waste, suggest_buckets

    # two tight clusters: the optimal 2-bucket set covers each at its
    # align-rounded top
    lengths = [100] * 50 + [1000] * 50
    buckets = suggest_buckets(lengths, n_buckets=2, align=128)
    assert buckets == (128, 1024)
    # one bucket must clamp to the max
    assert suggest_buckets(lengths, n_buckets=1, align=128) == (1024,)
    # more buckets never increase waste
    w2 = padding_waste(lengths, suggest_buckets(lengths, 2))
    w3 = padding_waste(lengths, suggest_buckets(lengths, 3))
    assert w3 <= w2


def test_suggest_buckets_beats_default_on_skewed_corpus(rng):
    from repurpose_tpu.data.buckets import padding_waste, suggest_buckets

    # skewed-long corpus: most videos ~300-700s, a tail up to 2000s
    lengths = np.concatenate([
        rng.integers(280, 700, 900), rng.integers(700, 2000, 100)
    ]).tolist()
    suggested = suggest_buckets(lengths, n_buckets=4)
    default = (256, 512, 1024, 2048)
    assert padding_waste(lengths, suggested) < padding_waste(lengths, default)
    assert all(b % 128 == 0 for b in suggested)
    assert max(suggested) >= max(lengths)  # longest video not truncated


def test_lengths_from_label_json(tmp_path):
    import json

    from repurpose_tpu.data.buckets import lengths_from_label_json

    entries = [
        {"timeRangeOffset": [0, 266.0]},
        {"timeRange": [10.0, 110.0]},
    ]
    path = tmp_path / "labels.json"
    path.write_text(json.dumps(entries))
    # int(end-start)+1, the dataset's label-list length quirk
    assert lengths_from_label_json(str(path)) == [267, 101]


def test_collate_rejects_undersized_batch():
    import pytest

    ds = SyntheticDataset([50, 60, 70, 80, 90], TINY, seed=0)
    samples = [ds[i] for i in range(5)]
    with pytest.raises(ValueError, match="batch_size"):
        collate(samples, (256,), batch_size=4)
