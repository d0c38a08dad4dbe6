"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-device mesh.

The reference has no pipeline parallelism (its distributed story is DP/DDP
replication, utils/distributed.py:242-625); these tests pin the capability
addition: a GPipe schedule over the ``pipe`` mesh axis must reproduce the
unpipelined model exactly — forward values AND training trajectories."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repurpose_tpu.config import MeshConfig, ModelConfig, TrainConfig
from repurpose_tpu.data.batching import collate
from repurpose_tpu.data.synthetic import SyntheticDataset
from repurpose_tpu.models.mmct import MMCT
from repurpose_tpu.parallel.mesh import create_mesh
from repurpose_tpu.parallel.pipeline import (
    PipelinedMMCT,
    pipeline_forward,
    stack_layer_params,
    unstack_layer_params,
    validate_pipeline,
)
from repurpose_tpu.train.state import create_train_state
from repurpose_tpu.train.step import make_train_step

CFG = ModelConfig(
    vis_dim=16, aud_dim=24, text_dim=8, d_model=32, self_num_layers=4,
    num_heads=4, d_ff=64, hidden_dim=16, compute_dtype="float32",
    attention_impl="xla", dropout=0.0,
)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshConfig(data=2, model=1, seq=1, pipe=4))


@pytest.fixture(scope="module")
def params():
    return MMCT(CFG).init_params(jax.random.key(0), bucket=32)


def _inputs(rng, b=8, t=32):
    lens = rng.integers(1, t + 1, size=b)
    lens[0] = t
    return (
        jnp.asarray(rng.normal(size=(b, t, CFG.vis_dim)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, t, CFG.aud_dim)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, t, CFG.text_dim)), jnp.float32),
        jnp.asarray(np.arange(t)[None, :] < lens[:, None]),
    )


def test_forward_matches_unpipelined(mesh, params, rng):
    v, a, t, mask = _inputs(rng)
    ref = MMCT(CFG).apply({"params": params}, v, a, t, mask, True)
    for m in (1, 2, 4):
        out = jax.jit(
            lambda p, *xs, m=m: pipeline_forward(CFG, mesh, m, p, *xs)
        )(params, v, a, t, mask)
        np.testing.assert_allclose(out.cls_logits, ref.cls_logits, atol=2e-5)
        np.testing.assert_allclose(out.offsets, ref.offsets, atol=2e-5)


def test_forward_matches_packed(mesh, params, rng):
    """seg_ids / positions (sequence packing) ride through the pipeline."""
    b, t = 8, 32
    v, a, tx, _ = _inputs(rng, b, t)
    # two videos per row: [0..19] is video 0, [20..32) is video 1
    seg_ids = jnp.asarray(np.where(np.arange(t) < 20, 0, 1)[None].repeat(b, 0))
    positions = jnp.asarray(
        np.where(np.arange(t) < 20, np.arange(t), np.arange(t) - 20)[None].repeat(b, 0)
    )
    mask = jnp.ones((b, t), bool)
    ref = MMCT(CFG).apply(
        {"params": params}, v, a, tx, mask, True,
        seg_ids=seg_ids, positions=positions,
    )
    out = jax.jit(
        lambda p, *xs: pipeline_forward(
            CFG, mesh, 2, p, *xs, seg_ids=seg_ids, positions=positions
        )
    )(params, v, a, tx, mask)
    np.testing.assert_allclose(out.cls_logits, ref.cls_logits, atol=2e-5)


def test_train_trajectory_matches_unpipelined(mesh):
    """3 train steps through make_train_step(model=PipelinedMMCT) == the plain
    single-device steps (dropout 0 — pipelined dropout draws differ by
    design, parallel/pipeline.py module docstring)."""
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    ds = SyntheticDataset([32 - i for i in range(8)], CFG, seed=0)
    batch = collate([ds[i] for i in range(8)], tc.buckets, 8)

    state0, tx, sched = create_train_state(CFG, tc, steps_per_epoch=3, rng=jax.random.key(1))
    plain = make_train_step(CFG, tc, tx, sched, donate=False)
    piped = make_train_step(
        CFG, tc, tx, sched, donate=False, model=PipelinedMMCT(CFG, mesh, 2)
    )
    rng = jax.random.key(7)
    s_a = s_b = state0
    for _ in range(3):
        s_a, m_a = plain(s_a, batch, rng)
        s_b, m_b = piped(s_b, batch, rng)
        assert np.isfinite(float(m_b["loss"]))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    # Adam normalizes gradients to +-lr, so fp32 reduction-order noise on
    # near-zero grads shows up at O(1e-4) after 3 steps; the per-step loss
    # rtol above is the tight check, the param check bounds divergence well
    # under the ~6e-3 total parameter motion.
    for la, lb in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(la, lb, atol=5e-4)


def test_dropout_pipeline_trains(mesh):
    """With dropout ON the pipelined step still trains (finite, param delta)."""
    cfg = dataclasses.replace(CFG, dropout=0.1)
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    ds = SyntheticDataset([32] * 8, cfg, seed=0)
    batch = collate([ds[i] for i in range(8)], tc.buckets, 8)
    state, tx, sched = create_train_state(cfg, tc, steps_per_epoch=2, rng=jax.random.key(1))
    step = make_train_step(
        cfg, tc, tx, sched, donate=False, model=PipelinedMMCT(cfg, mesh, 4)
    )
    new_state, metrics = step(state, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_stack_roundtrip(params):
    stacked = stack_layer_params(params, CFG.self_num_layers)
    back = unstack_layer_params(stacked, CFG.self_num_layers)
    for i in range(CFG.self_num_layers):
        for la, lb in zip(
            jax.tree.leaves(params["encoder"][f"layer_{i}"]),
            jax.tree.leaves(back[f"layer_{i}"]),
        ):
            np.testing.assert_array_equal(la, lb)


def test_validation_errors(mesh):
    # batch not divisible by dp * microbatches
    with pytest.raises(ValueError, match="not divisible"):
        validate_pipeline(CFG, mesh, 3, 8)
    # layers not divisible by stages
    bad = dataclasses.replace(CFG, self_num_layers=6)
    with pytest.raises(ValueError, match="layers not divisible"):
        validate_pipeline(bad, mesh, 2, 8)
    # ring attention can't ride the pipe axis
    ring = dataclasses.replace(CFG, attention_impl="ring")
    with pytest.raises(ValueError, match="ring"):
        validate_pipeline(ring, mesh, 2, 8)
    # the seq axis doesn't compose with pipe (ring ppermute needs hand
    # placement in the manual body)
    sp_mesh = create_mesh(MeshConfig(data=2, model=1, seq=2, pipe=2))
    with pytest.raises(ValueError, match="seq=1"):
        validate_pipeline(CFG, sp_mesh, 2, 8)
    # pipe x tp needs the XLA attention (GSPMD can't partition the Pallas
    # custom call over heads)
    tp_mesh = create_mesh(MeshConfig(data=2, model=2, seq=1, pipe=2))
    pallas = dataclasses.replace(CFG, attention_impl="pallas")
    with pytest.raises(ValueError, match="attention_impl"):
        validate_pipeline(pallas, tp_mesh, 2, 8)
    validate_pipeline(CFG, tp_mesh, 2, 8)  # xla impl composes


def test_dropout_iid_across_data_shards(mesh, params, rng):
    """Identical rows placed on different data shards must draw DIFFERENT
    dropout masks (the pipeline folds the data-axis index into the key;
    without it every shard repeats the same masks — review finding r3)."""
    cfg = dataclasses.replace(CFG, dropout=0.5)
    b, t = 8, 32
    v, a, tx, _ = _inputs(rng, b, t)
    # make all rows identical: shard 0 (rows 0-3) and shard 1 (rows 4-7)
    rep = lambda z: jnp.broadcast_to(z[:1], z.shape)
    v, a, tx = rep(v), rep(a), rep(tx)
    mask = jnp.ones((b, t), bool)
    out = jax.jit(
        lambda p, *xs: pipeline_forward(
            cfg, mesh, 2, p, *xs, deterministic=False, rng=jax.random.key(5)
        )
    )(params, v, a, tx, mask)
    row_on_shard0 = out.cls_logits[0]
    row_on_shard1 = out.cls_logits[4]
    assert bool(jnp.any(row_on_shard0 != row_on_shard1))


def test_nondeterministic_without_rng_rejected(mesh, params):
    with pytest.raises(ValueError, match="rng"):
        pipeline_forward(
            CFG, mesh, 2, params,
            jnp.zeros((8, 32, CFG.vis_dim)), jnp.zeros((8, 32, CFG.aud_dim)),
            jnp.zeros((8, 32, CFG.text_dim)), jnp.ones((8, 32), bool),
            deterministic=False,
        )


def test_trainer_packed_pipeline_mesh(tmp_path):
    """pack_sequences x MeshConfig.pipe: FFD-packed rows (seg_ids/positions)
    ride through the GPipe forward inside the standard Trainer loop."""
    from repurpose_tpu.config import Config, TestConfig
    from repurpose_tpu.train.loop import Trainer

    cfg = Config(
        model=dataclasses.replace(
            CFG, self_num_layers=2, vis_dim=8, aud_dim=12, text_dim=4,
            d_model=16, num_heads=2, d_ff=32, hidden_dim=8,
        ),
        train=TrainConfig(
            batch_size=4, buckets=(128,), epochs=1, eval_freq=100,
            intra_epoch_eval_freq=0, save_epochs=100, lr=1e-3,
            pack_sequences=True, loss_norm="batch_size",
            pipeline_microbatches=2,
        ),
        mesh=MeshConfig(data=2, pipe=2),
        test_cfg=TestConfig(pre_nms_topk=16),
    )
    ds = SyntheticDataset([60, 40, 70, 50, 90, 30, 80, 20], cfg.model, seed=3)
    trainer = Trainer(cfg, str(tmp_path / "pp_pack"), ds)
    trainer.fit()
    assert int(trainer.state.step) == trainer.steps_per_epoch
    assert trainer.steps_per_epoch >= 1


def test_stacked_state_matches_replicated_pipeline(mesh):
    """Memory-honest split layout (create_pipeline_train_state +
    PipelinedMMCTStacked): same trajectory as the replicated-tree pipeline
    (dropout 0), layer stack physically pipe-sharded, and the standard-tree
    export round-trips."""
    from repurpose_tpu.parallel.pipeline import (
        PipelinedMMCTStacked,
        create_pipeline_train_state,
        merge_pipeline_params,
    )

    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    ds = SyntheticDataset([32 - i for i in range(8)], CFG, seed=0)
    batch = collate([ds[i] for i in range(8)], tc.buckets, 8)

    state_r, tx_r, sched_r = create_train_state(
        CFG, tc, steps_per_epoch=2, rng=jax.random.key(1)
    )
    state_s, tx_s, sched_s = create_pipeline_train_state(
        CFG, tc, mesh, steps_per_epoch=2, rng=jax.random.key(1)
    )
    # the layer stack is physically sharded over the pipe axis
    lk = state_s.params["layers"]["attn"]["qkv"]["kernel"]
    spec = lk.sharding.spec
    assert spec and spec[0] == "pipe"
    assert lk.addressable_shards[0].data.shape[0] == CFG.self_num_layers // 4

    # standard-tree export equals the replicated init exactly
    merged = merge_pipeline_params(
        jax.device_get(state_s.params), CFG.self_num_layers
    )
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(state_r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step_r = make_train_step(
        CFG, tc, tx_r, sched_r, donate=False, model=PipelinedMMCT(CFG, mesh, 2)
    )
    step_s = make_train_step(
        CFG, tc, tx_s, sched_s, donate=False,
        model=PipelinedMMCTStacked(CFG, mesh, 2),
    )
    rng = jax.random.key(7)
    for _ in range(2):
        state_r, m_r = step_r(state_r, batch, rng)
        state_s, m_s = step_s(state_s, batch, rng)
        np.testing.assert_allclose(
            float(m_r["loss"]), float(m_s["loss"]), rtol=1e-5
        )
    merged = merge_pipeline_params(
        jax.device_get(state_s.params), CFG.self_num_layers
    )
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(state_r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.fixture(scope="module")
def tp_mesh():
    return create_mesh(MeshConfig(data=2, model=2, seq=1, pipe=2))


def test_forward_matches_unpipelined_pipe_tp(tp_mesh, params, rng):
    """pipe x tensor parallelism: partial-manual shard_map (data/pipe manual,
    model left to GSPMD via auto_axes) reproduces the unpipelined forward, and
    the compiled HLO carries both the Megatron TP all-reduces and the
    microbatch collective-permutes."""
    v, a, t, mask = _inputs(rng)
    ref = MMCT(CFG).apply({"params": params}, v, a, t, mask, True)
    f = jax.jit(lambda p, *xs: pipeline_forward(CFG, tp_mesh, 2, p, *xs))
    out = f(params, v, a, t, mask)
    np.testing.assert_allclose(out.cls_logits, ref.cls_logits, atol=2e-5)
    np.testing.assert_allclose(out.offsets, ref.offsets, atol=2e-5)
    hlo = f.lower(params, v, a, t, mask).compile().as_text()
    assert "all-reduce" in hlo  # TP psums (GSPMD-placed over the model axis)
    assert "collective-permute" in hlo  # pipe-stage microbatch hops


def test_train_trajectory_pipe_tp(tp_mesh):
    """3 train steps on the {data:2, model:2, pipe:2} mesh == the plain
    single-device trajectory (dropout 0): the TP gradient psums GSPMD places
    inside each stage compose with autodiff's reverse GPipe schedule."""
    tc = TrainConfig(batch_size=8, buckets=(32,), epochs=1, lr=1e-3)
    ds = SyntheticDataset([32 - i for i in range(8)], CFG, seed=0)
    batch = collate([ds[i] for i in range(8)], tc.buckets, 8)

    state0, tx, sched = create_train_state(
        CFG, tc, steps_per_epoch=3, rng=jax.random.key(1)
    )
    plain = make_train_step(CFG, tc, tx, sched, donate=False)
    piped = make_train_step(
        CFG, tc, tx, sched, donate=False, model=PipelinedMMCT(CFG, tp_mesh, 2)
    )
    rng = jax.random.key(7)
    s_a = s_b = state0
    for _ in range(3):
        s_a, m_a = plain(s_a, batch, rng)
        s_b, m_b = piped(s_b, batch, rng)
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for la, lb in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(la, lb, atol=5e-4)


def test_forward_matches_packed_pipe_tp(tp_mesh, params, rng):
    """seg_ids/positions (sequence packing) ride the pipe x tp composition."""
    b, t = 8, 32
    v, a, tx, _ = _inputs(rng, b, t)
    seg_ids = jnp.asarray(np.where(np.arange(t) < 20, 0, 1)[None].repeat(b, 0))
    positions = jnp.asarray(
        np.where(np.arange(t) < 20, np.arange(t), np.arange(t) - 20)[None].repeat(b, 0)
    )
    mask = jnp.ones((b, t), bool)
    ref = MMCT(CFG).apply(
        {"params": params}, v, a, tx, mask, True,
        seg_ids=seg_ids, positions=positions,
    )
    out = jax.jit(
        lambda p, *xs: pipeline_forward(
            CFG, tp_mesh, 2, p, *xs, seg_ids=seg_ids, positions=positions
        )
    )(params, v, a, tx, mask)
    np.testing.assert_allclose(out.cls_logits, ref.cls_logits, atol=2e-5)


def test_forward_parity_two_stage_mesh(params, rng):
    """Stage-count sweep: the same model on a {data:4, pipe:2} mesh (2 layers
    per stage) matches unpipelined — the schedule math must hold for any
    S dividing L, not just the module fixture's S=4."""
    mesh2 = create_mesh(MeshConfig(data=4, model=1, seq=1, pipe=2))
    v, a, t, mask = _inputs(rng)
    ref = MMCT(CFG).apply({"params": params}, v, a, t, mask, True)
    out = jax.jit(
        lambda p, *xs: pipeline_forward(CFG, mesh2, 2, p, *xs)
    )(params, v, a, t, mask)
    np.testing.assert_allclose(out.cls_logits, ref.cls_logits, atol=2e-5)
    np.testing.assert_allclose(out.offsets, ref.offsets, atol=2e-5)
