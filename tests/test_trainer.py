"""Trainer integration: two epochs on a synthetic corpus end-to-end —
training, val probe, eval with tIoU, checkpointing, resume, metric log."""

import json
import os

import numpy as np
import pytest

from repurpose_tpu.config import (
    Config,
    MeshConfig,
    ModelConfig,
    TestConfig,
    TrainConfig,
)
from repurpose_tpu.data.synthetic import SyntheticDataset
from repurpose_tpu.train.loop import Trainer

CFG = Config(
    model=ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
        num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
        attention_impl="xla",
    ),
    train=TrainConfig(
        batch_size=2, buckets=(128,), epochs=2, save_epochs=1, eval_freq=1,
        intra_epoch_eval_freq=2, lr=1e-3,
    ),
    mesh=MeshConfig(data=1),
    test_cfg=TestConfig(
        pre_nms_topk=64, pre_nms_thresh=0.2, duration_thresh=0.001,
        duration_thresh_max=90.0, max_seg_per_min=1.0,
    ),
)


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("run"))
    train_ds = SyntheticDataset([100, 90, 110, 95], CFG.model, seed=1)
    val_ds = SyntheticDataset([80, 85], CFG.model, seed=2)
    test_ds = SyntheticDataset([120, 100], CFG.model, seed=3)
    trainer = Trainer(CFG, workdir, train_ds, val_ds, test_ds, self_check=True)
    summary = trainer.fit()
    return workdir, trainer, summary


def test_fit_completes_and_logs(run):
    workdir, trainer, summary = run
    assert int(trainer.state.step) == 2 * trainer.steps_per_epoch
    lines = [
        json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))
    ]
    keys = set().union(*(l.keys() for l in lines))
    assert {"batch/loss", "batch/grad_norm", "val/loss", "epoch/loss", "tiou/mean"} <= keys


def test_eval_metrics_shape(run):
    _, trainer, summary = run
    out = trainer.evaluate()
    assert set(out) == {f"tiou/{t}" for t in (0.5, 0.6, 0.7, 0.8, 0.9)} | {"tiou/mean"}
    assert all(0.0 <= v <= 1.0 for v in out.values())


def test_checkpoints_written_and_resume(run):
    workdir, trainer, _ = run
    assert trainer.checkpointer.latest_step() is not None
    t2 = Trainer(
        CFG, workdir,
        SyntheticDataset([100, 90, 110, 95], CFG.model, seed=1),
        self_check=False,
    )
    assert t2.resume()
    assert int(t2.state.step) == int(trainer.state.step)
    assert t2.start_epoch == 2
    for a, b in zip(
        np.asarray(trainer.state.params["input_projection"]["kernel"]).ravel(),
        np.asarray(t2.state.params["input_projection"]["kernel"]).ravel(),
    ):
        assert a == b


def test_evaluate_with_debug_viz(run):
    workdir, trainer, _ = run
    out = trainer.evaluate(debug_viz=True, max_debug_samples=2)
    assert "tiou/mean" in out
    import glob

    pngs = glob.glob(os.path.join(workdir, "debug", "*", "visualizations", "*.png"))
    logs = glob.glob(os.path.join(workdir, "debug", "*", "logs", "summary.json"))
    assert len(pngs) >= 1 and len(logs) == 1
    summary = json.load(open(logs[0]))
    assert summary["n_samples"] == 2
