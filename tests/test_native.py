"""Native C++ runtime: .npy batch loader and Soft-NMS vs Python references."""

import json
import os

import numpy as np
import pytest

from repurpose_tpu import native
from repurpose_tpu.ops.softnms import soft_nms_cpu

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def test_probe_and_single_load(tmp_path):
    arr = np.arange(24, dtype=np.float32).reshape(6, 4)
    p = str(tmp_path / "a.npy")
    np.save(p, arr)
    assert native.probe_npy(p) == (6, 4)
    out, rows = native.batch_load_npy([p], t=8, d=4)
    assert rows.tolist() == [6]
    np.testing.assert_array_equal(out[0, :6], arr)
    np.testing.assert_array_equal(out[0, 6:], 0)


def test_batch_load_truncates_and_pads(tmp_path, rng):
    paths = []
    arrays = []
    for i, n_rows in enumerate([10, 3, 7]):
        a = rng.normal(0, 1, (n_rows, 5)).astype(np.float32)
        p = str(tmp_path / f"{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    out, rows = native.batch_load_npy(paths, t=6, d=5, n_threads=3)
    assert rows.tolist() == [6, 3, 6]  # truncated to t
    np.testing.assert_array_equal(out[0], arrays[0][:6])
    np.testing.assert_array_equal(out[1, :3], arrays[1])
    np.testing.assert_array_equal(out[1, 3:], 0)


def test_probe_rejects_wrong_dtype(tmp_path):
    p = str(tmp_path / "f64.npy")
    np.save(p, np.zeros((3, 2), np.float64))
    assert native.probe_npy(p) is None


def test_batch_load_wrong_cols_falls_back(tmp_path):
    p = str(tmp_path / "a.npy")
    np.save(p, np.zeros((3, 7), np.float32))
    assert native.batch_load_npy([p], t=4, d=5) is None


def test_soft_nms_matches_python_oracle(rng):
    golden = json.load(
        open(os.path.join(os.path.dirname(__file__), "golden", "softnms.json"))
    )
    for case in golden:
        got = native.soft_nms_native(
            np.asarray(case["scores"], np.float32),
            np.asarray(case["segments"], np.float32),
            case["sigma"], case["thresh"], case["max_seg_num"],
        )
        np.testing.assert_array_equal(got, np.asarray(case["keep"]))
    # plus a float32 random sweep vs the python oracle
    for _ in range(10):
        n = int(rng.integers(1, 120))
        scores = np.sort(rng.uniform(0.3, 1.0, n).astype(np.float32))[::-1].copy()
        centers = rng.uniform(0, 500, n)
        durs = rng.uniform(10, 90, n)
        segs = np.stack([centers - durs / 2, centers + durs / 2], 1).astype(np.float32)
        want = soft_nms_cpu(scores, segs, 0.5, 0.01, 9)
        got = native.soft_nms_native(scores, segs, 0.5, 0.01, 9)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_soft_nms_nan_coordinate_parity(rng):
    """A NaN segment coordinate must decay like the oracle (weight -> 0),
    not NaN-poison the C kernel's running scores (review finding r3)."""
    scores = rng.uniform(0.1, 1.0, 12).astype(np.float32)
    segs = np.sort(rng.uniform(0, 100, (12, 2)), axis=1).astype(np.float32)
    segs[3, 0] = np.nan
    want = soft_nms_cpu(scores.copy(), segs.copy(), 0.5, 0.01, 8)
    got = native.soft_nms_native(scores, segs, 0.5, 0.01, 8)
    np.testing.assert_array_equal(want, got)


def test_soft_nms_native_rejects_bad_shapes(rng):
    """Shape mismatches / NaN scores / negative budgets return None (oracle
    fallback) instead of letting the C loop read out of bounds."""
    scores = rng.uniform(0.1, 1.0, 8).astype(np.float32)
    segs = np.sort(rng.uniform(0, 50, (8, 2)), axis=1).astype(np.float32)
    assert native.soft_nms_native(scores, segs[:7], 0.5, 0.01, 4) is None
    assert native.soft_nms_native(scores, segs.ravel(), 0.5, 0.01, 4) is None
    assert native.soft_nms_native(scores, segs, 0.5, 0.01, -1) is None
    bad = scores.copy()
    bad[2] = np.nan
    assert native.soft_nms_native(bad, segs, 0.5, 0.01, 4) is None


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_probe_rejects_corrupt_header_length(tmp_path):
    """A corrupt version byte + absurd 32-bit header length must error out
    cleanly (numpy fallback), not attempt a ~4 GiB allocation."""
    p = tmp_path / "corrupt.npy"
    raw = b"\x93NUMPY" + bytes([9, 0]) + b"\xff\xff\xff\xff" + b"x" * 64
    p.write_bytes(raw)
    assert native.probe_npy(str(p)) is None
