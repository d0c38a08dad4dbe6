"""Mesh + sharding on the 8-device virtual CPU mesh: self-check, TP rules,
and dp/tp train-step equivalence with the single-device result."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from repurpose_tpu.config import MeshConfig, ModelConfig, TrainConfig
from repurpose_tpu.data.batching import collate
from repurpose_tpu.data.synthetic import SyntheticDataset
from repurpose_tpu.parallel.mesh import create_mesh, describe_mesh, mesh_self_check
from repurpose_tpu.parallel.sharding import (
    batch_sharding,
    param_specs,
    shard_params,
)
from repurpose_tpu.train.state import create_train_state
from repurpose_tpu.train.step import make_train_step

TINY = ModelConfig(
    vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
    num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
    attention_impl="xla", matmul_precision="highest",
)
TRAIN = TrainConfig(batch_size=8, buckets=(64,), epochs=1)


def test_mesh_axis_sizes():
    assert MeshConfig(data=-1, model=2).axis_sizes(8) == (4, 2, 1, 1)
    assert MeshConfig(data=2, model=2, seq=2).axis_sizes(8) == (2, 2, 2, 1)
    assert MeshConfig(data=-1, pipe=4).axis_sizes(8) == (2, 1, 1, 4)
    with pytest.raises(ValueError):
        MeshConfig(data=3).axis_sizes(8)


def test_mesh_self_check_and_describe():
    mesh = create_mesh(MeshConfig(data=-1))
    assert mesh.devices.size == 8
    assert mesh_self_check(mesh) == 8
    desc = describe_mesh(mesh)
    assert "8" in desc and "data" in desc


def test_param_specs_tp_rules():
    state, _, _ = create_train_state(TINY, TRAIN, 1, jax.random.key(0))
    specs = param_specs(state.params)
    layer = specs["encoder"]["layer_0"]
    assert layer["attn"]["qkv"]["kernel"] == P(None, "model")
    assert layer["attn"]["qkv"]["bias"] == P("model")
    assert layer["attn"]["out"]["kernel"] == P("model", None)
    assert layer["linear1"]["kernel"] == P(None, "model")
    assert layer["linear2"]["kernel"] == P("model", None)
    assert specs["input_projection"]["kernel"] == P()
    assert specs["cls_head"]["out"]["kernel"] == P()


@pytest.mark.parametrize("mesh_cfg", [MeshConfig(data=-1, model=1), MeshConfig(data=4, model=2), MeshConfig(data=2, model=2, seq=2)])
def test_train_step_matches_single_device(mesh_cfg):
    """dp/tp/sp-sharded training must produce the same numbers as one device."""
    ds = SyntheticDataset([50, 40, 60, 55, 45, 58, 52, 48], TINY, seed=4)
    batch = collate([ds[i] for i in range(8)], TRAIN.buckets, 8)
    rng = jax.random.key(7)

    state0, tx, sched = create_train_state(TINY, TRAIN, 2, jax.random.key(0))
    step = make_train_step(TINY, TRAIN, tx, sched, donate=False)

    mesh = create_mesh(mesh_cfg)
    sharded = dataclasses.replace(state0, params=shard_params(state0.params, mesh))
    sh = batch_sharding(mesh, seq_sharded=mesh_cfg.seq > 1)
    dev_batch = type(batch)(*[
        jax.device_put(x, sh) if getattr(x, "ndim", 0) >= 2 else jax.device_put(x)
        for x in batch
    ])

    # Train both for several steps: a real sharding bug (double-counted psum,
    # wrong-axis reduction) diverges fast; cross-device float reduction order
    # only wiggles the low bits.
    ref_state, got_state = state0, sharded
    for _ in range(5):
        ref_state, ref_m = step(ref_state, batch, rng)
        got_state, got_m = step(got_state, dev_batch, rng)
        np.testing.assert_allclose(
            float(got_m["loss"]), float(ref_m["loss"]), rtol=2e-3
        )
        np.testing.assert_allclose(
            float(got_m["grad_norm"]), float(ref_m["grad_norm"]), rtol=1e-2
        )


@pytest.mark.parametrize(
    "mesh_cfg",
    [MeshConfig(data=4, model=2), MeshConfig(data=2, model=2, seq=2)],
)
def test_packed_train_step_matches_single_device(mesh_cfg):
    """Sequence-PACKED training under dp/tp/sp sharding must reproduce the
    single-device packed trajectory (seg_ids/positions shard along with the
    batch; block-diagonal attention + per-video PE must survive
    partitioning). Packed == unpacked is proven separately
    (tests/test_packing.py); this pins packed x mesh."""
    from repurpose_tpu.data.batching import pack_batch, plan_packing
    from repurpose_tpu.parallel.sharding import make_global_batch

    durs = [30, 20, 28, 25, 30, 22, 26, 24]
    ds = SyntheticDataset(durs, TINY, seed=4)
    samples = [ds[i] for i in range(len(durs))]
    packed = pack_batch(
        samples, plan_packing(durs, 64, 8)[0], bucket=64, batch_size=8
    )
    assert packed.seg_ids is not None and (packed.seg_ids >= 1).any()
    tc = TrainConfig(
        batch_size=8, buckets=(64,), epochs=1,
        loss_norm="batch_size", pack_sequences=True,
    )
    rng = jax.random.key(7)

    state0, tx, sched = create_train_state(TINY, tc, 2, jax.random.key(0))
    step = make_train_step(TINY, tc, tx, sched, donate=False)

    mesh = create_mesh(mesh_cfg)
    sharded = dataclasses.replace(state0, params=shard_params(state0.params, mesh))
    dev_batch = make_global_batch(packed, mesh, seq_sharded=mesh_cfg.seq > 1)

    ref_state, got_state = state0, sharded
    for _ in range(4):
        ref_state, ref_m = step(ref_state, packed, rng)
        got_state, got_m = step(got_state, dev_batch, rng)
        assert int(got_m["n_real"]) == len(durs)
        np.testing.assert_allclose(
            float(got_m["loss"]), float(ref_m["loss"]), rtol=2e-3
        )
        np.testing.assert_allclose(
            float(got_m["grad_norm"]), float(ref_m["grad_norm"]), rtol=1e-2
        )


def test_ring_attention_training_matches_single_device():
    """attention_impl='ring' on a (data=2, seq=4) mesh must reproduce the
    single-device xla-attention training trajectory."""
    ds = SyntheticDataset([50, 40, 60, 55, 45, 58, 52, 48], TINY, seed=4)
    batch = collate([ds[i] for i in range(8)], TRAIN.buckets, 8)
    rng = jax.random.key(7)

    state0, tx, sched = create_train_state(TINY, TRAIN, 2, jax.random.key(0))
    step_ref = make_train_step(TINY, TRAIN, tx, sched, donate=False)

    mesh = create_mesh(MeshConfig(data=2, model=1, seq=4))
    ring_cfg = dataclasses.replace(TINY, attention_impl="ring")
    step_ring = make_train_step(ring_cfg, TRAIN, tx, sched, donate=False, mesh=mesh)

    from repurpose_tpu.parallel.sharding import make_global_batch

    sharded = dataclasses.replace(state0, params=shard_params(state0.params, mesh))
    dev_batch = make_global_batch(batch, mesh, seq_sharded=True)

    ref_state, ring_state = state0, sharded
    for _ in range(4):
        ref_state, ref_m = step_ref(ref_state, batch, rng)
        ring_state, ring_m = step_ring(ring_state, dev_batch, rng)
        np.testing.assert_allclose(
            float(ring_m["loss"]), float(ref_m["loss"]), rtol=2e-3
        )
        np.testing.assert_allclose(
            float(ring_m["grad_norm"]), float(ref_m["grad_norm"]), rtol=1e-2
        )
