"""Gradient accumulation (train/step.py:_accum_grads).

The reference has no accumulation (one backward per batch, main.py:294-412);
this is the standard large-effective-batch / low-activation-memory lever a
production framework needs. Correctness bar: the accumulated step must
reproduce the unsplit step's trajectory exactly (fp32 accumulators,
reduction order aside) under BOTH loss normalizations and with packing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repurpose_tpu.config import ModelConfig, TrainConfig
from repurpose_tpu.data.batching import collate, pack_batch, plan_packing
from repurpose_tpu.data.synthetic import SyntheticDataset
from repurpose_tpu.train.state import create_train_state
from repurpose_tpu.train.step import make_train_step

CFG = ModelConfig(
    vis_dim=16, aud_dim=24, text_dim=8, d_model=32, self_num_layers=2,
    num_heads=4, d_ff=64, hidden_dim=16, compute_dtype="float32",
    attention_impl="xla", dropout=0.0,
)


def _batch(tc, b=8, t=32, seed=0):
    ds = SyntheticDataset([t - i for i in range(b)], CFG, seed=seed)
    return collate([ds[i] for i in range(b)], tc.buckets, b)


@pytest.mark.parametrize("loss_norm", ["config_batch_size", "batch_size"])
def test_trajectory_matches_unaccumulated(loss_norm):
    """3 steps at grad_accum_steps=4 == the unsplit step, under both loss
    normalizations (the global-denominator path is what makes per-chunk
    losses sum exactly to the full-batch loss)."""
    tc = TrainConfig(
        batch_size=8, buckets=(32,), epochs=1, lr=1e-3, loss_norm=loss_norm
    )
    tca = dataclasses.replace(tc, grad_accum_steps=4)
    batch = _batch(tc)
    state0, tx, sched = create_train_state(
        CFG, tc, steps_per_epoch=3, rng=jax.random.key(1)
    )
    plain = make_train_step(CFG, tc, tx, sched, donate=False)
    accum = make_train_step(CFG, tca, tx, sched, donate=False)
    rng = jax.random.key(7)
    s_a = s_b = state0
    for _ in range(3):
        s_a, m_a = plain(s_a, batch, rng)
        s_b, m_b = accum(s_b, batch, rng)
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=1e-4
        )
        assert int(m_a["n_real"]) == int(m_b["n_real"])
    for la, lb in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(la, lb, atol=5e-4)


def test_packed_batch_accumulates():
    """seg_ids/positions chunk along the batch dim with everything else; the
    packed accumulated step matches the packed unsplit step."""
    tc = TrainConfig(
        batch_size=4, buckets=(64,), epochs=1, lr=1e-3,
        pack_sequences=True, loss_norm="batch_size",
    )
    tca = dataclasses.replace(tc, grad_accum_steps=2)
    durs = [40, 20, 30, 25, 35, 15, 45, 10]
    ds = SyntheticDataset(durs, CFG, seed=3)
    rows = plan_packing(durs, 64, 4)[0]
    batch = pack_batch([ds[i] for i in range(8)], rows, 64, 4)
    assert batch.seg_ids is not None
    state0, tx, sched = create_train_state(
        CFG, tc, steps_per_epoch=1, rng=jax.random.key(1)
    )
    plain = make_train_step(CFG, tc, tx, sched, donate=False)
    accum = make_train_step(CFG, tca, tx, sched, donate=False)
    _, m_a = plain(state0, batch, jax.random.key(7))
    _, m_b = accum(state0, batch, jax.random.key(7))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=1e-4
    )
    assert int(m_a["n_real"]) == int(m_b["n_real"]) == 8


def test_bf16_accumulators_close():
    """bfloat16 accumulators track the fp32 step within bf16 noise and still
    train (the HBM-traffic lever; optimizer update stays fp32)."""
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    tcb = dataclasses.replace(
        tc, grad_accum_steps=4, grad_accum_dtype="bfloat16"
    )
    batch = _batch(tc)
    state0, tx, sched = create_train_state(
        CFG, tc, steps_per_epoch=1, rng=jax.random.key(1)
    )
    plain = make_train_step(CFG, tc, tx, sched, donate=False)
    accum = make_train_step(CFG, tcb, tx, sched, donate=False)
    _, m_a = plain(state0, batch, jax.random.key(7))
    _, m_b = accum(state0, batch, jax.random.key(7))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=3e-2
    )
    # grads stay fp32-typed at the optimizer boundary: params don't drift dtype
    assert all(
        leaf.dtype == ref.dtype
        for leaf, ref in zip(
            jax.tree.leaves(accum(state0, batch, jax.random.key(7))[0].params),
            jax.tree.leaves(state0.params),
        )
    )


def test_reg_loss_accumulates():
    tc = TrainConfig(
        batch_size=8, buckets=(32,), epochs=1, lr=1e-3, reg_loss_weight=0.5
    )
    tca = dataclasses.replace(tc, grad_accum_steps=2)
    batch = _batch(tc)
    state0, tx, sched = create_train_state(
        CFG, tc, steps_per_epoch=1, rng=jax.random.key(1)
    )
    plain = make_train_step(CFG, tc, tx, sched, donate=False)
    accum = make_train_step(CFG, tca, tx, sched, donate=False)
    _, m_a = plain(state0, batch, jax.random.key(7))
    _, m_b = accum(state0, batch, jax.random.key(7))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_a["reg_loss"]), float(m_b["reg_loss"]), rtol=1e-4
    )


def test_dropout_on_trains():
    """With dropout ON, chunks draw per-chunk keys (fold_in of the chunk
    index) — draws differ from the unsplit step by design, but the step
    trains (finite loss, nonzero grads)."""
    cfg = dataclasses.replace(CFG, dropout=0.1)
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3,
                     grad_accum_steps=2)
    batch = _batch(tc)
    state0, tx, sched = create_train_state(
        cfg, tc, steps_per_epoch=1, rng=jax.random.key(1)
    )
    accum = make_train_step(cfg, tc, tx, sched, donate=False)
    _, m = accum(state0, batch, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0


def test_accum_on_dp_mesh():
    """Accumulation under data parallelism: chunks are STRIDED (rows c, c+A,
    ...) so every chunk stays balanced across the data shards; values match
    the unsplit dp step (the loss is partition-invariant)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from repurpose_tpu.config import MeshConfig
    from repurpose_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(MeshConfig(data=4))
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    tca = dataclasses.replace(tc, grad_accum_steps=2)
    batch = _batch(tc)
    sh = NamedSharding(mesh, P("data"))
    dev = type(batch)(*[
        None if x is None else jax.device_put(np.asarray(x), sh if getattr(x, "ndim", 0) >= 1 else None)
        for x in batch
    ])
    state0, tx, sched = create_train_state(
        CFG, tc, steps_per_epoch=1, rng=jax.random.key(1)
    )
    plain = make_train_step(CFG, tc, tx, sched, donate=False)
    accum = make_train_step(CFG, tca, tx, sched, donate=False)
    _, m_a = plain(state0, dev, jax.random.key(7))
    _, m_b = accum(state0, dev, jax.random.key(7))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=1e-4
    )


def test_config_validation():
    with pytest.raises(ValueError, match="grad_accum_steps"):
        TrainConfig(batch_size=6, grad_accum_steps=4)
    with pytest.raises(ValueError, match="grad_accum_dtype"):
        TrainConfig(batch_size=8, grad_accum_dtype="fp8")


def test_activation_memory_drops():
    """The point of accumulation: XLA temp (activation) memory at A=4 chunks
    is well under the unsplit step's."""
    cfg = dataclasses.replace(CFG, d_model=64, d_ff=128, self_num_layers=4)
    tc = TrainConfig(batch_size=16, buckets=(256,), epochs=1, lr=1e-3)
    tca = dataclasses.replace(tc, grad_accum_steps=4)
    ds = SyntheticDataset([200 + i for i in range(16)], cfg, seed=0)
    batch = collate([ds[i] for i in range(16)], tc.buckets, 16)
    state0, tx, sched = create_train_state(
        cfg, tc, steps_per_epoch=1, rng=jax.random.key(1)
    )
    plain = make_train_step(cfg, tc, tx, sched, donate=False)
    accum = make_train_step(cfg, tca, tx, sched, donate=False)
    temps = {}
    for name, fn in (("plain", plain), ("accum", accum)):
        ma = fn.lower(state0, batch, jax.random.key(7)).compile().memory_analysis()
        if ma is None:  # pragma: no cover
            pytest.skip("backend provides no compiled memory analysis")
        temps[name] = ma.temp_size_in_bytes
    assert temps["accum"] < 0.6 * temps["plain"], temps


def test_train_step_donation_aliases_full_state():
    """Donated-buffer audit (ROADMAP perf lever, closed): the compiled train
    step must alias the ENTIRE TrainState in-place — params, both Adam
    moments, counters — so per-step HBM churn is grads+activations only."""
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    batch = _batch(tc)
    state0, tx, sched = create_train_state(
        CFG, tc, steps_per_epoch=1, rng=jax.random.key(1)
    )
    step = make_train_step(CFG, tc, tx, sched, donate=True)
    ma = step.lower(state0, batch, jax.random.key(7)).compile().memory_analysis()
    if ma is None:  # pragma: no cover
        pytest.skip("backend provides no compiled memory analysis")
    state_bytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(state0))
    assert ma.alias_size_in_bytes >= state_bytes, (
        ma.alias_size_in_bytes, state_bytes
    )
