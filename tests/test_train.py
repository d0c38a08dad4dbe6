"""Training stack: torch-Adam parity, schedule parity, train-step smoke,
and learning on a synthetic task."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from repurpose_tpu.config import ModelConfig, TrainConfig
from repurpose_tpu.data.batching import collate
from repurpose_tpu.data.synthetic import SyntheticDataset
from repurpose_tpu.train.schedule import warmup_cosine_schedule
from repurpose_tpu.train.state import TrainState, create_train_state, make_optimizer
from repurpose_tpu.train.step import make_eval_step, make_train_step

TINY = ModelConfig(
    vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
    num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
    attention_impl="xla", matmul_precision="highest",
)
TRAIN = TrainConfig(batch_size=2, buckets=(64,), epochs=2, lr=1e-3)


def test_adam_matches_torch():
    """optax chain must reproduce torch.optim.Adam(weight_decay=1e-4) —
    L2-in-gradient semantics (reference main.py:190-191)."""
    import torch

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-3, weight_decay=1e-4)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g.copy())
        topt.step()

    tx = optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(lambda _: 1e-3),
    )
    jw = jnp.asarray(w0)
    opt_state = tx.init(jw)
    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, jw)
        jw = optax.apply_updates(jw, updates)
    np.testing.assert_allclose(np.asarray(jw), tw.detach().numpy(), atol=1e-6)


def test_schedule_matches_torch_cosine():
    """warmup=0 path must equal torch CosineAnnealingLR stepped per iteration
    (reference main.py:200-206, 405-409)."""
    import torch

    total = 40
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.Adam(lin.parameters(), lr=0.001)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=total)
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        cos.step()
    sched = warmup_cosine_schedule(0.001, 0, total)
    ours = np.asarray(sched(jnp.arange(total)))
    # fp32 schedule: the cosine tail loses ~1e-5 relative precision.
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-4, atol=1e-9)


def test_schedule_warmup():
    sched = warmup_cosine_schedule(1.0, 10, 100)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(9)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(1.0)  # cosine step 0
    assert float(sched(60)) < 1.0


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticDataset([50, 40, 60, 55], TINY, seed=4)
    state, tx, schedule = create_train_state(TINY, TRAIN, steps_per_epoch=2, rng=jax.random.key(0))
    step_fn = make_train_step(TINY, TRAIN, tx, schedule, donate=False)
    eval_fn = make_eval_step(TINY, TRAIN)
    batch = collate([ds[i] for i in range(2)], TRAIN.buckets, 2)
    return ds, state, step_fn, eval_fn, batch


def test_train_step_runs_and_counts(setup):
    _, state, step_fn, _, batch = setup
    rng = jax.random.key(1)
    new_state, m = step_fn(state, batch, rng)
    assert int(new_state.step) == 1
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0
    # params actually changed
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0


def test_loss_norm_uses_config_batch_size(setup):
    """Parity quirk: summed loss / CONFIG batch size (main.py:331)."""
    _, state, _, eval_fn, batch = setup
    out = eval_fn(state.params, batch)
    np.testing.assert_allclose(
        float(out["loss"]), float(out["cls_loss"]) / TRAIN.batch_size, rtol=1e-6
    )


def test_loss_decreases(setup):
    ds, state, step_fn, eval_fn, batch = setup
    rng = jax.random.key(2)
    first = float(eval_fn(state.params, batch)["loss"])
    for _ in range(30):
        state, m = step_fn(state, batch, rng)
    last = float(eval_fn(state.params, batch)["loss"])
    assert last < first * 0.9, (first, last)


def test_reg_loss_optional(setup):
    ds, state, _, _, batch = setup
    cfg = dataclasses.replace(TRAIN, reg_loss_weight=0.5)
    eval_fn = make_eval_step(TINY, cfg)
    out = eval_fn(state.params, batch)
    assert "reg_loss" in out and np.isfinite(float(out["reg_loss"]))


def test_per_layer_grad_norms(setup):
    from repurpose_tpu.train.state import make_optimizer
    from repurpose_tpu.train.step import kernel_layer_names

    _, state, _, _, batch = setup
    tx, sched = make_optimizer(TRAIN, 2)
    step = make_train_step(TINY, TRAIN, tx, sched, donate=False, per_layer_grad_norms=True)
    _, m = step(state, batch, jax.random.key(3))
    names = kernel_layer_names(state.params)
    norms = np.asarray(m["grad_norms/stacked"])
    assert norms.shape == (len(names),)
    assert any("input_projection" in n for n in names)
    assert any("cls_head" in n for n in names)
    assert np.isfinite(norms).all()


def test_grad_and_param_histograms(setup):
    from repurpose_tpu.train.state import make_optimizer
    from repurpose_tpu.train.step import (
        HIST_BINS,
        kernel_layer_names,
        param_histograms,
    )

    _, state, _, _, batch = setup
    tx, sched = make_optimizer(TRAIN, 2)
    step = make_train_step(TINY, TRAIN, tx, sched, donate=False, grad_histograms=True)
    _, m = step(state, batch, jax.random.key(3))
    names = kernel_layer_names(state.params)
    counts = np.asarray(m["hist/grads/counts"])
    edges = np.asarray(m["hist/grads/edges"])
    assert counts.shape == (len(names), HIST_BINS)
    assert edges.shape == (len(names), HIST_BINS + 1)
    # every layer's histogram counts all of its elements
    sizes = [
        np.asarray(v).size
        for k, v in _kernel_items(state.params)
    ]
    np.testing.assert_array_equal(counts.sum(axis=1), sizes)
    ph = param_histograms(state.params)
    assert np.asarray(ph["counts"]).shape == (len(names), HIST_BINS)


def _kernel_items(params):
    import jax.tree_util as jtu

    out = []
    for path, v in jtu.tree_flatten_with_path(params)[0]:
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        if name.endswith("kernel"):
            out.append((name, v))
    return out


def test_nonfinite_count_tracks_divergence(setup):
    """The in-state NaN guard (VERDICT r1 item 10): every step is checked on
    device; a poisoned batch increments nonfinite_count exactly once."""
    from repurpose_tpu.train.state import make_optimizer

    _, state, _, _, batch = setup
    tx, sched = make_optimizer(TRAIN, 2)
    step = make_train_step(TINY, TRAIN, tx, sched, donate=False)
    state1, _ = step(state, batch, jax.random.key(0))
    assert int(state1.nonfinite_count) == 0
    bad_visual = np.array(batch.visual, copy=True)
    bad_visual[0, 0, 0] = np.nan
    bad_batch = batch._replace(visual=bad_visual)
    state2, m = step(state1, bad_batch, jax.random.key(0))
    assert not np.isfinite(float(m["loss"]))
    assert int(state2.nonfinite_count) == 1
    # the NaN update poisoned the params, so even a healthy batch counts now
    state3, _ = step(state2, batch, jax.random.key(0))
    assert int(state3.nonfinite_count) == 2
