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


def test_evaluate_packed_matches_unpacked(run):
    """evaluate(pack=True) routes through score_packed_stream (FFD packing +
    packed kernels + device unpack) and must reproduce the unpacked metrics —
    durations chosen so rows genuinely share videos."""
    _, trainer, _ = run
    ds = SyntheticDataset([60, 40, 50, 30, 20, 25], CFG.model, seed=5)
    unpacked = trainer.evaluate(dataset=ds)
    packed = trainer.evaluate(dataset=ds, pack=True)
    assert set(packed) == set(unpacked)
    for k in unpacked:
        np.testing.assert_allclose(packed[k], unpacked[k], rtol=1e-6, err_msg=k)


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


def test_auto_resume_recovers_from_crash(tmp_path):
    """Elastic supervision: a crash mid-epoch-2 rebuilds the trainer from the
    epoch-1 checkpoint and training completes (restarts counted)."""
    import dataclasses

    from repurpose_tpu.train.loop import Trainer, fit_with_auto_resume

    cfg = dataclasses.replace(
        CFG, train=dataclasses.replace(CFG.train, epochs=3, eval_freq=100,
                                       intra_epoch_eval_freq=0),
    )
    workdir = str(tmp_path / "elastic")
    train_ds = SyntheticDataset([100, 90, 110, 95], cfg.model, seed=1)
    trainers, calls = [], {"n": 0}

    def make_trainer():
        calls["n"] += 1
        t = Trainer(cfg, workdir, train_ds)
        trainers.append(t)
        if calls["n"] == 1:  # sabotage only the first incarnation
            # wrap ALL step variants: the loop routes per-cadence (plain /
            # norms / hist — train/loop.py), so counting on one attribute
            # would move the crash away from "first step of epoch 2"
            count = {"i": 0}

            def wrap(orig):
                def sabotaged(state, batch, rng):
                    count["i"] += 1
                    if count["i"] == 3:  # first step of epoch 2
                        raise RuntimeError("injected crash")
                    return orig(state, batch, rng)
                return sabotaged

            t.train_step = wrap(t.train_step)
            t.train_step_norms = wrap(t.train_step_norms)
            t.train_step_hist = wrap(t.train_step_hist)
        return t

    summary = fit_with_auto_resume(make_trainer, max_restarts=2)
    assert summary["restarts"] == 1 and calls["n"] == 2
    # resumed from the epoch-1 checkpoint, then finished epochs 2-3:
    # 3 epochs x 2 steps/epoch
    assert int(trainers[1].state.step) == 6
    assert trainers[1].start_epoch == 3


def test_auto_resume_does_not_retry_nan(tmp_path):
    """The NaN guard is deterministic divergence — never retried."""
    import dataclasses

    import pytest as _pytest

    from repurpose_tpu.train.loop import Trainer, fit_with_auto_resume

    cfg = dataclasses.replace(
        CFG, train=dataclasses.replace(CFG.train, epochs=1, eval_freq=100,
                                       intra_epoch_eval_freq=0),
    )
    train_ds = SyntheticDataset([100, 90], cfg.model, seed=1)
    calls = {"n": 0}

    def make_trainer():
        calls["n"] += 1
        t = Trainer(cfg, str(tmp_path / "nan"), train_ds)

        def poisoned(state, batch, rng):
            raise FloatingPointError("nonfinite")

        t.train_step = poisoned
        t.train_step_hist = poisoned  # step 1 routes to the histogram variant
        return t

    with _pytest.raises(FloatingPointError):
        fit_with_auto_resume(make_trainer, max_restarts=3)
    assert calls["n"] == 1


def test_trainer_pipeline_mesh(tmp_path):
    """MeshConfig.pipe > 1 routes training through the GPipe forward
    (parallel/pipeline.py) end-to-end: one synthetic epoch trains with
    finite losses and the val probe runs through the pipelined eval step."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG,
        model=dataclasses.replace(CFG.model, self_num_layers=2),
        train=dataclasses.replace(
            CFG.train, batch_size=4, epochs=1, eval_freq=100,
            intra_epoch_eval_freq=1, pipeline_microbatches=2,
        ),
        mesh=MeshConfig(data=2, pipe=2),
    )
    train_ds = SyntheticDataset([100, 90, 110, 95], cfg.model, seed=1)
    val_ds = SyntheticDataset([80, 85, 70, 75], cfg.model, seed=2)
    trainer = Trainer(cfg, str(tmp_path / "pp"), train_ds, val_ds, self_check=True)
    trainer.fit()
    assert int(trainer.state.step) == trainer.steps_per_epoch
    lines = [
        json.loads(l) for l in open(os.path.join(str(tmp_path / "pp"), "metrics.jsonl"))
    ]
    losses = [l["batch/loss"] for l in lines if "batch/loss" in l]
    assert losses and all(np.isfinite(v) for v in losses)
    assert any("val/loss" in l for l in lines)


def test_best_checkpoint_survives_periodic_gc(tmp_path):
    """Best-tIoU weights live in a dedicated single-slot manager
    (workdir/ckpt_best) — inside the periodic manager, max_to_keep newer
    epoch saves would garbage-collect them (review finding r3). The
    reference keeps best.pth separate the same way (main.py:718-739)."""
    import dataclasses

    import jax.numpy as jnp

    from repurpose_tpu.train.checkpoint import Checkpointer

    cfg = dataclasses.replace(
        CFG, train=dataclasses.replace(CFG.train, epochs=1, eval_freq=100,
                                       intra_epoch_eval_freq=0),
    )
    train_ds = SyntheticDataset([100, 90], cfg.model, seed=1)
    trainer = Trainer(cfg, str(tmp_path / "b"), train_ds, self_check=False)
    trainer.best_tiou, trainer.best_epoch = 0.5, 0
    trainer._save_best(0)
    # roll the periodic manager well past its max_to_keep=5
    for s in range(1, 8):
        trainer.state = dataclasses.replace(trainer.state, step=jnp.int32(s))
        trainer._save(0)
    assert trainer.checkpointer.latest_step() == 7
    best = Checkpointer(str(tmp_path / "b" / "ckpt_best"))
    assert best.latest_step() == 0
    state, meta = best.restore(trainer.state)
    assert meta.get("best") is True and meta["best_tiou"] == 0.5
    assert int(state.step) == 0
    trainer.close()


def test_warm_start_from_reference_checkpoint(tmp_path):
    """Trainer(init_params=...) (train.py --torch_ckpt): training starts from
    the given weights — here a reference-schema export/convert round-trip —
    with the optimizer freshly initialized, and the first steps actually
    train from them."""
    pytest.importorskip("torch")
    import jax

    from repurpose_tpu.models import build_model, init_model_params
    from repurpose_tpu.models.torch_convert import (
        load_reference_checkpoint,
        save_reference_checkpoint,
    )

    donor = init_model_params(
        build_model(CFG.model), CFG.model, jax.random.key(99)
    )
    pth = str(tmp_path / "donor.pth")
    save_reference_checkpoint(pth, jax.device_get(donor), CFG.model)
    warm = load_reference_checkpoint(pth, CFG.model)

    train_ds = SyntheticDataset([100, 90], CFG.model, seed=4)
    trainer = Trainer(
        CFG, str(tmp_path / "run"), train_ds, init_params=warm
    )
    try:
        for a, b in zip(
            jax.tree.leaves(donor), jax.tree.leaves(trainer.state.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=3e-4
            )  # fp32 torch.save round-trip is exact; tol covers convert casts
        summary = trainer.fit(epochs=1)
        assert int(trainer.state.step) == trainer.steps_per_epoch
        assert np.isfinite(summary["final_loss"])
        # params moved: it trained FROM the warm start, not a fresh init
        deltas = [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(
                jax.tree.leaves(donor), jax.tree.leaves(trainer.state.params)
            )
        ]
        assert max(deltas) > 0
    finally:
        trainer.close()
