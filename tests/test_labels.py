"""Label/offset generation parity vs golden outputs of the reference
(dataset/RepurposeClip.py:322-399), captured by tools/make_goldens.py."""

import json
import os

import numpy as np

from repurpose_tpu.data.labels import (
    generate_regression_offsets,
    generate_time_status_list,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "labels.json")


def test_labels_match_reference_goldens():
    for case in json.load(open(GOLDEN)):
        status = generate_time_status_list(case["time_range"], case["segments"])
        np.testing.assert_array_equal(status, np.asarray(case["status"]))
        offsets = generate_regression_offsets(case["time_range"], case["segments"])
        np.testing.assert_allclose(
            offsets, np.asarray(case["offsets"], dtype=np.float32), atol=1e-6
        )


def test_degenerate_time_range():
    assert generate_regression_offsets([5.0, 5.0], [[1, 2]]).shape == (1, 2)
    assert generate_regression_offsets([10.0, 3.0], [[1, 2]]).tolist() == [[0.0, 0.0]]


def test_first_segment_wins_on_overlap():
    offsets = generate_regression_offsets([0, 50.0], [[10.0, 30.0], [20.0, 40.0]])
    # Second 25 is inside both; the first listed segment must win.
    np.testing.assert_allclose(offsets[25], [15.0, 5.0])


def test_labels_inclusive_int_semantics():
    status = generate_time_status_list([0, 10.0], [[2.7, 4.2]])
    # int() truncation: marks seconds 2..4 inclusive.
    assert status.tolist() == [0, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0]


def test_inverted_time_range_returns_empty():
    """RepurposeClip.py:332-343: [0] * negative == [] in the reference; no
    segment can write into it (clamped end < clamped start)."""
    from repurpose_tpu.data.labels import generate_time_status_list

    out = generate_time_status_list([10.0, 7.0], [[8.0, 9.0]])
    assert out.shape == (0,)


def test_fractional_range_overrun_raises_like_reference():
    """A fractional range whose integer endpoints span more slots than
    int(t1 - t0) + 1 makes the reference's per-index loop raise IndexError
    (RepurposeClip.py:342); silent clamping would train on a sample the
    reference rejects."""
    import pytest

    from repurpose_tpu.data.labels import generate_time_status_list

    # 10 slots (int(20.3 - 10.7) + 1) but indices run to int(20)-int(10) = 10
    with pytest.raises(IndexError):
        generate_time_status_list([10.7, 20.3], [[10.0, 20.3]])
