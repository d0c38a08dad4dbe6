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
