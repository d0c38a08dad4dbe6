"""ZeRO-1 optimizer-state sharding (parallel/sharding.py:zero1_opt_specs).

The reference's DDP replicates Adam moments on every rank
(utils/distributed.py); ZeRO-1 shards them over the data axis — the
jax-ml scaling-book recipe: reduce-scatter(grads), sharded moment update,
all-gather(params). Bar: exact trajectory vs the replicated step, physical
moment sharding, and composition with TP and the 1F1B pipeline."""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from repurpose_tpu.config import MeshConfig, ModelConfig, TrainConfig
from repurpose_tpu.data.batching import collate
from repurpose_tpu.data.synthetic import SyntheticDataset
from repurpose_tpu.parallel.mesh import create_mesh
from repurpose_tpu.parallel.sharding import zero1_opt_shardings, zero1_opt_specs
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


def _moment_leaves_with_path(opt_state):
    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    return [
        (tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path), v)
        for path, v in flat
    ]


def test_specs_shard_moments_and_compose_with_tp():
    mesh = create_mesh(MeshConfig(data=2, model=2, seq=1, pipe=1))
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    state, tx, _ = create_train_state(CFG, tc, steps_per_epoch=1, rng=jax.random.key(1))
    specs = zero1_opt_specs(state.opt_state, mesh)
    flat_specs = {
        "/".join(str(k) for k in path): s
        for path, s in _moment_leaves_with_path(specs)
    }
    # a qkv-kernel moment keeps its TP column split AND gains the data axis
    qkv = [s for name, s in flat_specs.items() if "qkv" in name and "kernel" in name]
    assert qkv and all(s == P("data", "model") for s in qkv), flat_specs
    # replicated-param moments (LayerNorm scales are [d]) shard over data only
    norms = [
        s for name, s in flat_specs.items()
        if name.endswith("scale") and "norm" in name
    ]
    assert norms and all(s == P("data") for s in norms), flat_specs
    # scalars (Adam count) stay replicated
    counts = [s for name, s in flat_specs.items() if name.endswith("count")]
    assert counts and all(s == P() for s in counts)


def test_trajectory_matches_replicated():
    """3 ZeRO-1 steps == the replicated-optimizer steps exactly, and the
    moments come out PHYSICALLY data-sharded."""
    mesh = create_mesh(MeshConfig(data=4, model=1, seq=1, pipe=1))
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    batch = _batch(tc)
    state0, tx, sched = create_train_state(
        CFG, tc, steps_per_epoch=3, rng=jax.random.key(1)
    )
    plain = make_train_step(CFG, tc, tx, sched, donate=False)
    z1 = make_train_step(CFG, tc, tx, sched, donate=False, zero1_mesh=mesh)
    s_z = dataclasses.replace(
        state0,
        opt_state=jax.device_put(
            state0.opt_state, zero1_opt_shardings(state0.opt_state, mesh)
        ),
    )
    s_p = state0
    rng = jax.random.key(7)
    for _ in range(3):
        s_p, m_p = plain(s_p, batch, rng)
        s_z, m_z = z1(s_z, batch, rng)
        np.testing.assert_allclose(float(m_p["loss"]), float(m_z["loss"]), rtol=1e-6)
    # Adam normalizes grads to +-lr, so fp32 reduction-order noise (the
    # sharded update changes summation order) is amplified on near-zero
    # grads; the per-step loss rtol above is the tight check and this bounds
    # total divergence like tests/test_pipeline.py's trajectory checks.
    for la, lb in zip(jax.tree.leaves(s_p.params), jax.tree.leaves(s_z.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=5e-4)
    # physical sharding: a 2-D moment's first-dim shard is 1/4 of the full
    mus = [
        v for path, v in _moment_leaves_with_path(s_z.opt_state)
        if getattr(v, "ndim", 0) == 2 and v.shape[0] % 4 == 0
    ]
    assert mus
    sharded = [
        v for v in mus
        if v.addressable_shards[0].data.shape[0] == v.shape[0] // 4
    ]
    assert sharded, [(v.shape, v.sharding) for v in mus]


def test_trainer_zero1_fit(tmp_path):
    """End-to-end: Trainer with shard_opt_state on a dp=2 mesh fits a
    synthetic epoch; the live state's moments are data-sharded."""
    from repurpose_tpu.config import Config, TestConfig
    from repurpose_tpu.train.loop import Trainer

    cfg = Config(
        model=CFG,
        train=TrainConfig(
            batch_size=4, buckets=(64,), epochs=1, eval_freq=100,
            intra_epoch_eval_freq=0, save_epochs=100, lr=1e-3,
            shard_opt_state=True,
        ),
        mesh=MeshConfig(data=2),
        test_cfg=TestConfig(pre_nms_topk=16),
    )
    ds = SyntheticDataset([60, 40, 70, 50], cfg.model, seed=3)
    trainer = Trainer(cfg, str(tmp_path / "z1"), ds)
    trainer.fit()
    assert int(trainer.state.step) == trainer.steps_per_epoch
    mus = [
        v for path, v in _moment_leaves_with_path(trainer.state.opt_state)
        if getattr(v, "ndim", 0) == 2 and v.shape[0] % 2 == 0
    ]
    assert any(
        v.addressable_shards[0].data.shape[0] == v.shape[0] // 2 for v in mus
    ), [(v.shape, v.sharding) for v in mus]


def test_zero1_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a ZeRO-sharded state: restore targets the live
    (sharded) abstract state, so moments land back on their data shards."""
    from repurpose_tpu.train.checkpoint import Checkpointer

    mesh = create_mesh(MeshConfig(data=2))
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    batch = _batch(tc)
    state0, tx, sched = create_train_state(
        CFG, tc, steps_per_epoch=2, rng=jax.random.key(1)
    )
    state = dataclasses.replace(
        state0,
        opt_state=jax.device_put(
            state0.opt_state, zero1_opt_shardings(state0.opt_state, mesh)
        ),
    )
    step = make_train_step(CFG, tc, tx, sched, donate=False, zero1_mesh=mesh)
    state, _ = step(state, batch, jax.random.key(7))
    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(int(state.step), state, {"epoch": 0})
    restored, _ = ckpt.restore(state)
    ckpt.close()
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.sharding == b.sharding  # sharded moments restore sharded
    # training continues from the restored sharded state
    cont, m = step(restored, batch, jax.random.key(7))
    assert np.isfinite(float(m["loss"]))
    assert int(cont.step) == 2


def test_zero1_1f1b_pipeline():
    """ZeRO-1 composes with the 1F1B pipeline step (dp x pp mesh): same
    trajectory as the plain step at dropout 0."""
    from repurpose_tpu.parallel.pipeline_1f1b import make_1f1b_train_step

    mesh = create_mesh(MeshConfig(data=2, model=1, seq=1, pipe=2))
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    batch = _batch(tc)
    state0, tx, sched = create_train_state(
        CFG, tc, steps_per_epoch=2, rng=jax.random.key(1)
    )
    plain = make_train_step(CFG, tc, tx, sched, donate=False)
    f1b = make_1f1b_train_step(
        CFG, tc, tx, sched, mesh=mesh, n_microbatches=2, donate=False, zero1=True
    )
    rng = jax.random.key(7)
    s_a = s_b = state0
    for _ in range(2):
        s_a, m_a = plain(s_a, batch, rng)
        s_b, m_b = f1b(s_b, batch, rng)
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for la, lb in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=5e-4)


def test_zero1_split_layout_rejected():
    from repurpose_tpu.parallel.pipeline_1f1b import make_1f1b_train_step

    mesh = create_mesh(MeshConfig(data=2, model=1, seq=1, pipe=2))
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    _, tx, sched = create_train_state(CFG, tc, steps_per_epoch=1, rng=jax.random.key(1))
    with pytest.raises(ValueError, match="standard param layout"):
        make_1f1b_train_step(
            CFG, tc, tx, sched, mesh=mesh, n_microbatches=2,
            split_layout=True, zero1=True,
        )
