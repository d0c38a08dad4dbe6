"""CLI smoke tests: drive the root inference.py as a subprocess on CPU with a
tiny config — the same surface a user runs (the reference's standalone
inference.py, /root/reference/inference.py:23-55). Packed and unpacked runs
must produce the same ranked-clip manifest."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_YAML = """
train_dataset: {label_path: data/train.json, video_path: v, audio_path: a, text_path: t}
val_dataset: {label_path: data/val.json, video_path: v, audio_path: a, text_path: t}
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
  lr: 0.001
  epochs: 1
  weight_decay: 0.0
  warmup_epochs: 0
  save_epochs: 1
  batch_size: 2
  eval_freq: 0
  intra_epoch_eval_freq: 0
test_cfg:
  pre_nms_topk: 16
  pre_nms_thresh: 0.3
  duration_thresh: 1
  duration_thresh_max: 90
  max_seg_per_min: 2.0
  nms_sigma: 0.5
  min_score: 0.01
tpu:
  mesh: {data: 1, model: 1, seq: 1}
  buckets: [64, 128]
  compute_dtype: float32
  attention_impl: xla
  matmul_precision: highest
"""


def _run(cfg_path, out_path, extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "inference.py"),
         "--config_path", cfg_path, "--synthetic", "6",
         "--export", out_path, *extra],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "mean precision@tIoU" in r.stdout
    return json.load(open(out_path))


@pytest.mark.slow
def test_preflight_cli(tmp_path):
    """preflight.py passes all checks on the virtual CPU mesh and writes the
    machine-readable report (the reference's detect_gpu_setup.py +
    test_multi_gpu.py pre-flight zoo, collapsed)."""
    out = str(tmp_path / "preflight.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "preflight.py"),
         "--output-json", out],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    report = json.load(open(out))
    assert all(c["passed"] for c in report), report


@pytest.mark.slow
def test_analyze_cli_synthetic(tmp_path):
    """analyze.py produces projection + correlation artifacts from synthetic
    features (the reference's visualize_features.py /
    modality_correlation_analysis.py standalone scripts)."""
    out = str(tmp_path / "analysis")
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "analyze.py"),
         "--synthetic", "4", "--videos", "3", "--output-dir", out],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    produced = []
    for root, _, files in os.walk(out):
        produced += files
    assert produced, "analyze.py wrote no artifacts"


def test_preprocess_cli_split(tmp_path):
    """preprocess.py --split shards a dataset JSON into chunk files + manifest
    (the reference's preprocessing/split_dataset.py SLURM fan-out)."""
    entries = [
        {"youtube_id": f"vid{i}", "timeRange": [0, 60], "segmentsOffset": []}
        for i in range(7)
    ]
    split_json = str(tmp_path / "split.json")
    with open(split_json, "w") as f:
        json.dump(entries, f)
    out = str(tmp_path / "chunks")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "preprocess.py"),
         "--split", split_json, "--chunk-size", "3", "--out", out],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    chunks = [f for f in os.listdir(out) if "chunk" in f and f.endswith(".json")]
    assert len(chunks) == 3  # ceil(7 / 3)
    total = sum(len(json.load(open(os.path.join(out, c)))) for c in chunks)
    assert total == 7


@pytest.mark.slow
def test_train_cli_synthetic_packed(tmp_path):
    """train.py runs an epoch end-to-end as a subprocess (synthetic data,
    tiny dims) with sequence packing on — the reference's `python main.py`
    surface (main.py:53-886) collapsed to one command."""
    # before launching the subprocess: its --export_torch leg needs torch
    # (skip torch-less environments instead of failing the returncode assert)
    torch = pytest.importorskip("torch")
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_YAML + "  pack_sequences: true\n  loss_norm: batch_size\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    workdir = str(tmp_path / "run")
    exported = str(tmp_path / "exported.pth")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config_path", cfg_path, "--synthetic", "8", "--epochs", "1",
         "--workdir", workdir,
         # --auto-resume takes the fit_with_auto_resume path; --export_torch
         # must still fire through its on_complete hook (regression: the
         # auto-resume branch used to return before the export block)
         "--auto-resume", "1", "--export_torch", exported],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "sequence packing:" in r.stderr  # loader efficiency log fired
    metrics = [
        json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))
    ]
    assert any("batch/loss" in m for m in metrics)
    assert all(np.isfinite(m["batch/loss"]) for m in metrics if "batch/loss" in m)
    # the exported reference-schema .pth exists and carries the real final
    # epoch loss (regression: 'loss' metadata used to be unconditionally 0.0)
    assert "exported reference-schema checkpoint" in r.stdout
    ckpt = torch.load(exported, map_location="cpu", weights_only=False)
    assert "positional_encoding.pe" in ckpt["model"]
    assert ckpt["loss"] > 0.0 and np.isfinite(ckpt["loss"])


@pytest.mark.slow
def test_inference_cli_pack_matches_unpacked(tmp_path):
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_YAML)
    plain = _run(cfg_path, str(tmp_path / "plain.json"), [])
    packed = _run(cfg_path, str(tmp_path / "packed.json"), ["--pack"])
    assert len(plain) == len(packed) > 0
    for a, b in zip(plain, packed):
        assert a["video_id"] == b["video_id"]
        np.testing.assert_allclose(a["score"], b["score"], atol=1e-5)
        np.testing.assert_allclose(a["start"], b["start"], atol=1e-4)
        np.testing.assert_allclose(a["end"], b["end"], atol=1e-4)


@pytest.mark.slow
def test_inference_cli_export_torch_converter(tmp_path):
    """inference.py --export_torch converts an existing Orbax checkpoint to
    a reference-schema .pth WITHOUT scoring (deploying an already-trained
    model through the reference's torch stack, its inference.py:33-34 load
    path); converting the .pth back must reproduce the saved params."""
    torch = pytest.importorskip("torch")
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_YAML)

    # save a tiny Orbax checkpoint in-process
    import jax

    from repurpose_tpu.config import load_config
    from repurpose_tpu.train.checkpoint import Checkpointer
    from repurpose_tpu.train.state import create_train_state

    cfg = load_config(cfg_path)
    state, _, _ = create_train_state(cfg.model, cfg.train, 10, jax.random.key(3))
    ckpt_dir = str(tmp_path / "ckpt")
    ck = Checkpointer(ckpt_dir)
    ck.save(0, state)
    ck.close()

    out = str(tmp_path / "converted.pth")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "inference.py"),
         "--config_path", cfg_path, "--resume", ckpt_dir,
         "--export_torch", out],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "exported reference-schema checkpoint" in r.stdout
    assert "precision@tIoU" not in r.stdout  # converter mode: no scoring ran

    from repurpose_tpu.models.torch_convert import convert_reference_state_dict

    sd = torch.load(out, map_location="cpu", weights_only=False)["model"]
    assert "positional_encoding.pe" in sd
    back = convert_reference_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfg.model
    )
    flat_a = jax.tree_util.tree_flatten_with_path(jax.device_get(state.params))[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))
