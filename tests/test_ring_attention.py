"""Ring attention vs full attention on a (data=2, seq=4) virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from repurpose_tpu.config import MeshConfig
from repurpose_tpu.ops.attention import mha_xla
from repurpose_tpu.ops.ring_attention import ring_attention
from repurpose_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshConfig(data=2, model=1, seq=4))


def _inputs(rng, b=2, t=64, h=4, dh=16, tail_pad=True):
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    mask = np.ones((b, t), bool)
    if tail_pad:
        mask[0, 40:] = False  # padding spans multiple seq shards
        mask[1, 55:] = False
    return q, k, v, jnp.asarray(mask)


def test_matches_full_attention(mesh, rng):
    q, k, v, mask = _inputs(rng)
    want = jax.jit(mha_xla)(q, k, v, mask)

    sh = NamedSharding(mesh, P("data", "seq", None, None))
    msh = NamedSharding(mesh, P("data", "seq"))
    args = (
        jax.device_put(q, sh), jax.device_put(k, sh),
        jax.device_put(v, sh), jax.device_put(mask, msh),
    )
    got = jax.jit(
        lambda a, b_, c, m: ring_attention(a, b_, c, m, mesh)
    )(*args)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )


def test_gradients_flow(mesh, rng):
    q, k, v, mask = _inputs(rng, t=32, tail_pad=False)
    sh = NamedSharding(mesh, P("data", "seq", None, None))
    msh = NamedSharding(mesh, P("data", "seq"))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    md = jax.device_put(mask, msh)

    def loss_ring(a, b_, c):
        return jnp.sum(ring_attention(a, b_, c, md, mesh) ** 2)

    def loss_full(a, b_, c):
        return jnp.sum(mha_xla(a, b_, c, mask) ** 2)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qd, kd, vd)
    g_full = jax.jit(jax.grad(loss_full, argnums=(0, 1, 2)))(q, k, v)
    for gr, gf, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gf), atol=1e-4, rtol=1e-3, err_msg=name
        )


def test_gradients_with_padding(mesh, rng):
    """Custom-VJP backward must match full attention where padding spans
    seq shards (masked keys get zero dk/dv; padded queries still backprop)."""
    q, k, v, mask = _inputs(rng)  # tail_pad=True
    sh = NamedSharding(mesh, P("data", "seq", None, None))
    msh = NamedSharding(mesh, P("data", "seq"))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    md = jax.device_put(mask, msh)

    g_ring = jax.jit(
        jax.grad(
            lambda a, b_, c: jnp.sum(ring_attention(a, b_, c, md, mesh) ** 2),
            argnums=(0, 1, 2),
        )
    )(qd, kd, vd)
    g_full = jax.jit(
        jax.grad(
            lambda a, b_, c: jnp.sum(mha_xla(a, b_, c, mask) ** 2),
            argnums=(0, 1, 2),
        )
    )(q, k, v)
    valid = np.asarray(mask)
    for gr, gf, name in zip(g_ring, g_full, "qkv"):
        gr, gf = np.asarray(gr), np.asarray(gf)
        np.testing.assert_allclose(gr, gf, atol=2e-4, rtol=1e-3, err_msg=name)
        if name in "kv":  # masked keys must receive exactly-zero grads
            assert np.abs(gr[~valid]).max() == 0.0


def test_backward_memory_advantage():
    """The O(T/n) claim, measured: compile forward+backward at T=8192 on an
    8-way seq ring vs the same computation with gather (XLA all-gathers K/V)
    sharding, and compare XLA's peak temp allocations. The ring program's
    biggest block is [B,H,T/n,T/n]; gather materializes [B,H,T/n,T]-scale
    score buffers plus full-sequence K/V — the ring must be several times
    smaller (VERDICT r1 item 6)."""
    mesh8 = create_mesh(MeshConfig(data=1, model=1, seq=8))
    b, t, h, dh = 1, 8192, 4, 32
    q = jax.ShapeDtypeStruct((b, t, h, dh), jnp.float32)
    mask = jnp.ones((b, t), bool)
    sh = NamedSharding(mesh8, P(None, "seq", None, None))
    msh = NamedSharding(mesh8, P(None, "seq"))

    def temp_bytes(loss_fn):
        g = jax.jit(
            jax.grad(loss_fn, argnums=(0, 1, 2)),
            in_shardings=(sh, sh, sh, msh),
        )
        compiled = g.lower(q, q, q, jax.ShapeDtypeStruct((b, t), bool)).compile()
        return compiled.memory_analysis().temp_size_in_bytes

    ring_bytes = temp_bytes(
        lambda a, b_, c, m: jnp.sum(ring_attention(a, b_, c, m, mesh8) ** 2)
    )
    gather_bytes = temp_bytes(lambda a, b_, c, m: jnp.sum(mha_xla(a, b_, c, m) ** 2))
    assert ring_bytes * 3 < gather_bytes, (ring_bytes, gather_bytes)


def test_ring_inference_pipeline_matches_gather(mesh, rng):
    """Seq-sharded EVAL (VERDICT r1 item 6: ring was train-only): the
    InferencePipeline keeps ring live over the mesh and must produce the same
    kept segments/scores as the replicated gather-attention pipeline."""
    import dataclasses

    from repurpose_tpu.config import ModelConfig, TestConfig
    from repurpose_tpu.infer import InferencePipeline
    from repurpose_tpu.models import build_model, init_model_params

    cfg_ring = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
        num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
        attention_impl="ring", matmul_precision="highest", dropout=0.0,
    )
    cfg_xla = dataclasses.replace(cfg_ring, attention_impl="xla")
    params = init_model_params(build_model(cfg_xla), cfg_xla, jax.random.key(0))
    tcfg = TestConfig(
        pre_nms_topk=64, pre_nms_thresh=0.2, duration_thresh=0.001,
        max_seg_per_min=2.0,
    )
    b, t = 2, 64
    vis = rng.normal(0, 1, (b, t, 8)).astype(np.float32)
    aud = rng.normal(0, 1, (b, t, 12)).astype(np.float32)
    txt = rng.normal(0, 1, (b, t, 4)).astype(np.float32)
    durs = [50, 64]
    mask = np.zeros((b, t), bool)
    for i, d in enumerate(durs):
        mask[i, :d] = True
        vis[i, d:] = aud[i, d:] = txt[i, d:] = 0.0

    ring_pipe = InferencePipeline(cfg_ring, params, tcfg, mesh=mesh)
    assert ring_pipe._mesh is not None  # ring actually live, not fallen back
    xla_pipe = InferencePipeline(cfg_xla, params, tcfg)
    got = ring_pipe.score_batch(vis, aud, txt, mask, durs, ["a", "b"])
    want = xla_pipe.score_batch(vis, aud, txt, mask, durs, ["a", "b"])
    for g, w in zip(got, want):
        assert len(g["scores"]) == len(w["scores"])
        np.testing.assert_allclose(g["scores"], w["scores"], atol=1e-5)
        np.testing.assert_allclose(g["segments"], w["segments"], atol=1e-4)


def test_fully_masked_shard_finite(mesh, rng):
    # One whole seq shard is padding — outputs must stay finite.
    q, k, v, _ = _inputs(rng, tail_pad=False)
    mask = np.ones((2, 64), bool)
    mask[:, 48:] = False  # the last shard (positions 48..63) is all padding
    sh = NamedSharding(mesh, P("data", "seq", None, None))
    msh = NamedSharding(mesh, P("data", "seq"))
    got = jax.jit(lambda a, b_, c, m: ring_attention(a, b_, c, m, mesh))(
        jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh),
        jax.device_put(jnp.asarray(mask), msh),
    )
    assert np.isfinite(np.asarray(got)).all()
