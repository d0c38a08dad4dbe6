"""Soft-NMS parity: numpy oracle vs reference goldens (models/softnms.py),
and static-shape TPU version vs the oracle, including padded inputs."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from repurpose_tpu.ops.softnms import soft_nms_cpu, soft_nms_tpu

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "softnms.json")
CASES = json.load(open(GOLDEN))


@pytest.mark.parametrize("case", CASES, ids=[str(c["case_id"]) for c in CASES])
def test_oracle_matches_reference(case):
    keep = soft_nms_cpu(
        np.asarray(case["scores"]),
        np.asarray(case["segments"]),
        sigma=case["sigma"],
        thresh=case["thresh"],
        max_seg_num=case["max_seg_num"],
    )
    np.testing.assert_array_equal(keep, np.asarray(case["keep"], dtype=np.int64))


def _tpu_keep_indices(scores, segments, pad_to, sigma, thresh, max_seg_num):
    """Run soft_nms_tpu on candidates padded to a static size; return kept
    original indices in output order."""
    n = len(scores)
    k = max(pad_to, n)
    s = np.zeros(k, np.float32)
    s[:n] = scores
    g = np.zeros((k, 2), np.float32)
    g[:n] = segments
    res = soft_nms_tpu(
        jnp.asarray(s), jnp.asarray(g), max_seg_num, sigma=sigma, thresh=thresh
    )
    idx = np.asarray(res.orig_idx)
    keep = np.asarray(res.keep)
    return idx[keep]


@pytest.mark.parametrize("case", CASES, ids=[str(c["case_id"]) for c in CASES])
@pytest.mark.parametrize("pad_to", [256])  # one static shape => one jit compile
def test_tpu_matches_oracle(case, pad_to):
    got = _tpu_keep_indices(
        np.asarray(case["scores"], np.float32),
        np.asarray(case["segments"], np.float32),
        pad_to,
        case["sigma"],
        case["thresh"],
        case["max_seg_num"],
    )
    np.testing.assert_array_equal(got, np.asarray(case["keep"], dtype=np.int64))


def test_tpu_matches_oracle_random_sweep(rng):
    """Property test over random candidate sets, float32 both sides."""
    for trial in range(25):
        n = int(rng.integers(1, 80))
        scores = np.sort(rng.uniform(0.3, 1.0, size=n).astype(np.float32))[::-1].copy()
        centers = rng.uniform(0, 400, size=n)
        durs = rng.uniform(10, 90, size=n)
        segs = np.stack([centers - durs / 2, centers + durs / 2], 1).astype(np.float32)
        max_seg = int(rng.integers(1, 15))
        want = soft_nms_cpu(scores, segs, 0.5, 0.01, max_seg)
        got = _tpu_keep_indices(scores, segs, 96, 0.5, 0.01, max_seg)
        np.testing.assert_array_equal(got, want, err_msg=f"trial={trial}")


def test_empty_candidates():
    res = soft_nms_tpu(jnp.zeros(16), jnp.zeros((16, 2)), 5)
    assert not np.asarray(res.keep).any()


def test_single_candidate():
    keep = _tpu_keep_indices(
        np.asarray([0.9], np.float32), np.asarray([[0.0, 30.0]], np.float32),
        8, 0.5, 0.01, 5,
    )
    np.testing.assert_array_equal(keep, [0])
