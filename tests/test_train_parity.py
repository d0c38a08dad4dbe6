"""Trained tiny-model parity (closes the random-weights-only golden gap,
ROADMAP r1): the fixture tests/golden/tiny_trained.npz holds a reference
training run — init + trained state dicts, the 4 synthetic batches, the
per-step loss trajectory (reference numerics: Adam lr 1e-3 wd 1e-4,
loss = cls_loss / config_batch_size, per-iteration cosine schedule;
main.py:190-206, 331, 405-409) — captured by tools/make_goldens.py.

Tests: (a) step-for-step loss parity of the jitted train step against the
torch trajectory, (b) final-params closeness, (c) end-to-end decode + tIoU
equality loading the REAL reference .pth checkpoint (main.py:513-531 schema)
through load_reference_checkpoint — the --torch_ckpt round-trip at realistic
(trained) score distributions.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repurpose_tpu.config import ModelConfig, TestConfig, TrainConfig
from repurpose_tpu.data.batching import Batch
from repurpose_tpu.models import convert_reference_state_dict
from repurpose_tpu.train.state import TrainState, make_optimizer
from repurpose_tpu.train.step import make_train_step
from repurpose_tpu.utils.metrics import calculate_tiou

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

TINY_CFG = ModelConfig(
    vis_dim=32, aud_dim=64, text_dim=16, d_model=64,
    self_num_layers=2, num_heads=4, d_ff=128, dropout=0.0,
    compute_dtype="float32", attention_impl="xla", matmul_precision="highest",
)


def _batch(data, prefix: str) -> Batch:
    return Batch(
        visual=data[f"{prefix}/visual"].astype(np.float32),
        audio=data[f"{prefix}/audio"].astype(np.float32),
        text=data[f"{prefix}/text"].astype(np.float32),
        mask=data[f"{prefix}/mask"][:, 0, :],
        labels=data[f"{prefix}/labels"].astype(np.float32),
        segments=data[f"{prefix}/segments"].astype(np.float32),
        durations=data[f"{prefix}/lens"].astype(np.int32),
    )


@pytest.fixture(scope="module")
def fixture():
    data = np.load(os.path.join(GOLDEN_DIR, "tiny_trained.npz"))
    meta = json.load(open(os.path.join(GOLDEN_DIR, "tiny_trained_decode.json")))
    return data, meta


def _sd(data, prefix: str) -> dict:
    return {k[len(prefix) :]: data[k] for k in data.files if k.startswith(prefix)}


@pytest.fixture(scope="module")
def trajectory(fixture):
    data, meta = fixture
    steps = int(meta["steps"])
    params = convert_reference_state_dict(_sd(data, "init_sd/"), TINY_CFG)
    tc = TrainConfig(
        batch_size=int(meta["batch_size_cfg"]), lr=1e-3, weight_decay=1e-4,
        warmup_epochs=0, epochs=steps, buckets=(128,),
        loss_norm="config_batch_size",
    )
    tx, sched = make_optimizer(tc, steps_per_epoch=1)  # total_steps == steps
    state = TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0))
    step_fn = make_train_step(TINY_CFG, tc, tx, sched, donate=False)
    batches = [_batch(data, f"batch{i}") for i in range(4)]
    ours = []
    for s in range(steps):
        state, m = step_fn(state, batches[s % 4], jax.random.key(0))
        ours.append(float(m["loss"]))
    return np.asarray(ours), state


def test_loss_trajectory_matches_reference(fixture, trajectory):
    """Step-for-step: the jitted step must ride the torch loss curve.
    fp32 op-order drift compounds through Adam, so the tolerance grows
    with step index; early steps must match tightly."""
    data, _ = fixture
    ref = data["losses"]
    ours, _ = trajectory
    assert len(ours) == len(ref)
    np.testing.assert_allclose(ours[:6], ref[:6], rtol=1e-4)
    np.testing.assert_allclose(ours, ref, rtol=0.05, atol=2e-3)
    # both trajectories actually learned
    assert ours[-1] < ours[0] * 0.2 and ref[-1] < ref[0] * 0.2


def test_final_params_match_reference(fixture, trajectory):
    data, _ = fixture
    _, state = trajectory
    want = convert_reference_state_dict(_sd(data, "trained_sd/"), TINY_CFG)
    got = jax.tree.map(np.asarray, state.params)
    flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
    flat_g = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    for path, w in flat_w:
        g = flat_g[path]
        np.testing.assert_allclose(
            g, w, rtol=0.05, atol=5e-3,
            err_msg="/".join(str(p) for p in path),
        )


def test_torch_checkpoint_roundtrip_decode_and_tiou(fixture):
    """Load the reference's real trained .pth, run the on-device pipeline,
    and match the reference's kept segments / scores and tIoU exactly
    (the --torch_ckpt end-to-end path of inference.py)."""
    from repurpose_tpu.infer import InferencePipeline
    from repurpose_tpu.models.torch_convert import load_reference_checkpoint

    data, meta = fixture
    params = load_reference_checkpoint(
        os.path.join(GOLDEN_DIR, "tiny_trained.pth"), TINY_CFG
    )
    test_cfg = TestConfig(**meta["test_cfg"])
    pipeline = InferencePipeline(TINY_CFG, params, test_cfg)
    eval_b = _batch(data, "eval")
    results = pipeline.score_batch(
        eval_b.visual, eval_b.audio, eval_b.text, eval_b.mask,
        eval_b.durations, [r["video_id"] for r in meta["results"]],
    )
    thresholds = (0.5, 0.6, 0.7, 0.8, 0.9)
    for r, g, gt in zip(results, meta["results"], meta["gt_segments"]):
        assert len(r["scores"]) == len(g["scores"]), (r, g)
        order = np.argsort(-np.asarray(r["scores"]))  # keep sets may order differently
        np.testing.assert_allclose(
            np.asarray(r["segments"])[order],
            np.asarray(g["segments"])[np.argsort(-np.asarray(g["scores"]))],
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.sort(r["scores"])[::-1], np.sort(g["scores"])[::-1], atol=1e-4
        )
        tiou = calculate_tiou(gt, r["segments"].tolist(), thresholds)
        for t in thresholds:
            assert tiou[t] == pytest.approx(g["tiou"][str(t)], abs=1e-6)
