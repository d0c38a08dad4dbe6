"""campaign.py — the one-command published-protocol accuracy campaign.

The real campaign needs the Repurpose-10K features (absent in this
environment); these tests prove the command end to end on a synthetic
on-disk split (--smoke) and the feature-scan gate in isolation.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_YAML = """
test_dataset: {label_path: data/test.json, video_path: v, audio_path: a, text_path: t}
model:
  vis_dim: 8
  aud_dim: 12
  text_dim: 6
  d_model: 32
  self_num_layers: 1
  num_heads: 2
train:
  seed: 7
  epochs: 1
  batch_size: 2
test_cfg:
  pre_nms_topk: 16
  pre_nms_thresh: 0.3
  duration_thresh: 1
  max_seg_per_min: 2.0
tpu:
  mesh: {data: 1, model: 1, seq: 1}
  buckets: [64, 128]
  compute_dtype: float32
  attention_impl: xla
  matmul_precision: highest
"""


@pytest.mark.slow
def test_campaign_smoke_cli(tmp_path):
    """--smoke N runs all three stages (scan, protocol eval, packed
    cross-check) against a materialized synthetic split and writes the
    report; the packed cross-check must agree with the protocol number."""
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_YAML)
    report_path = str(tmp_path / "report.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "campaign.py"),
         "--config_path", cfg_path, "--smoke", "5", "--report", report_path],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "mean precision@tIoU" in r.stdout
    report = json.load(open(report_path))
    scan = report["feature_scan"]
    assert scan["complete_all_modalities"] == scan["videos"]
    assert set(report["precision_at_tiou"]) == {"0.5", "0.6", "0.7", "0.8", "0.9"}
    assert report["packed_crosscheck"]["abs_delta"] <= 1e-6
    assert report["eval_entries"] == 5


def test_scan_features_gate(tmp_path):
    """scan_features flags missing and corrupt modality files and the
    campaign refuses to evaluate an incomplete split (still writing the
    partial report for triage)."""
    from campaign import run_campaign, scan_features
    from repurpose_tpu.config import ModelConfig
    from repurpose_tpu.data.synthetic import write_synthetic_dataset

    tiny = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=4, d_model=16,
        self_num_layers=1, num_heads=2,
    )
    split = write_synthetic_dataset(str(tmp_path), [80, 90, 100], tiny, seed=1)
    scan = scan_features(split)
    assert scan["videos"] == 3 and scan["complete_all_modalities"] == 3

    with open(split.label_path) as f:
        ids = sorted({e["youtube_id"] for e in json.load(f)})
    os.remove(os.path.join(split.video_path, f"{ids[0]}.npy"))
    np.save(os.path.join(split.audio_path, f"{ids[1]}.npy"), np.zeros(3))  # 1-D
    scan = scan_features(split)
    assert scan["visual"]["missing"] == 1
    assert ids[0] in scan["visual"]["missing_ids"]
    assert scan["audio"]["corrupt"] == 1
    assert scan["complete_all_modalities"] == 1

    import dataclasses

    from repurpose_tpu.config import Config

    cfg = dataclasses.replace(Config(), test_dataset=split, model=tiny)
    report_path = str(tmp_path / "fail_report.json")
    with pytest.raises(SystemExit, match="feature scan failed"):
        run_campaign(cfg, params={}, report_path=report_path)
    assert os.path.exists(report_path)  # partial report written for triage
