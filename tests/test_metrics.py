"""Metric parity vs reference goldens (utils/metrics.py)."""

import json
import os

import numpy as np

from repurpose_tpu.utils.metrics import calculate_ap, calculate_recall, calculate_tiou

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "metrics.json")


def test_metrics_match_reference_goldens():
    for case in json.load(open(GOLDEN)):
        tiou = calculate_tiou(case["refs"], case["preds"], [0.5, 0.6, 0.7, 0.8, 0.9])
        for k, v in case["tiou"].items():
            np.testing.assert_allclose(tiou[float(k)], v, atol=1e-9)
        np.testing.assert_allclose(
            calculate_ap(case["preds"], case["labels"]), case["ap"], atol=1e-9
        )
        np.testing.assert_allclose(
            calculate_recall(case["preds"], case["labels"]), case["recall"], atol=1e-9
        )


def test_tiou_empty_cases():
    assert calculate_tiou([[0, 10]], [], [0.5]) == {0.5: 0.0}
    assert calculate_tiou([], [[0, 10]], [0.5]) == {0.5: 0.0}


def test_tiou_perfect_match():
    out = calculate_tiou([[5, 25]], [[5, 25]], [0.5, 0.9])
    assert out == {0.5: 1.0, 0.9: 1.0}


def test_ap_recall_no_positives():
    assert calculate_ap([[0, 5]], [0, 0, 0]) == 0.0
    assert calculate_recall([[0, 5]], [0, 0, 0]) == 0.0
