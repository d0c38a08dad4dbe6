"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repurpose_tpu.ops.attention import mha_xla
from repurpose_tpu.ops.flash_attention import mha_pallas


def _inputs(rng, b=2, t=256, h=4, dh=32, masked_tail=True):
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    mask = np.ones((b, t), bool)
    if masked_tail:
        mask[0, t // 2 :] = False
        mask[1, t - 10 :] = False
    return q, k, v, jnp.asarray(mask)


def test_forward_matches_xla(rng):
    q, k, v, mask = _inputs(rng)
    want = jax.jit(mha_xla)(q, k, v, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=128))(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )


def test_forward_bf16(rng):
    q, k, v, mask = _inputs(rng, t=128)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = jax.jit(mha_xla)(qb, kb, vb, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=128))(qb, kb, vb, mask)
    assert got.dtype == jnp.bfloat16
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[valid],
        np.asarray(want, np.float32)[valid],
        atol=3e-2,
    )


@pytest.mark.parametrize("backward", ["xla", "pallas"])
def test_gradients_match_xla(rng, backward):
    q, k, v, mask = _inputs(rng, t=128)

    def loss_pallas(q, k, v):
        out = mha_pallas(q, k, v, mask, q_block=64, backward=backward)
        return jnp.sum(jnp.where(mask[..., None, None], out, 0.0) ** 2)

    def loss_xla(q, k, v):
        out = mha_xla(q, k, v, mask)
        return jnp.sum(jnp.where(mask[..., None, None], out, 0.0) ** 2)

    g_pallas = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(q, k, v)
    g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for gp, gx, name in zip(g_pallas, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=1e-4, rtol=1e-3, err_msg=name
        )


def test_rejects_non_divisible_t(rng):
    q, k, v, mask = _inputs(rng, t=100)
    with pytest.raises(ValueError, match="multiple"):
        mha_pallas(q, k, v, mask, q_block=64)


def test_fully_masked_rows_finite(rng):
    q, k, v, _ = _inputs(rng, b=1, t=128, masked_tail=False)
    mask = jnp.zeros((1, 128), bool)  # every key padded
    out = jax.jit(lambda *a: mha_pallas(*a, q_block=128))(q, k, v, mask)
    assert np.isfinite(np.asarray(out)).all()
