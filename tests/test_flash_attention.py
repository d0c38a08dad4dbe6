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


def test_non_divisible_t_falls_back_to_xla(rng):
    # T=100 has no power-of-two block divisor >= 8 -> must fall back, not crash.
    q, k, v, mask = _inputs(rng, t=100)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=64))(q, k, v, mask)
    want = jax.jit(mha_xla)(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )


def test_odd_multiple_t_picks_smaller_block(rng):
    # T=96 is not a multiple of the preferred 256 but divides by 32.
    q, k, v, mask = _inputs(rng, t=96)
    got = jax.jit(lambda *a: mha_pallas(*a))(q, k, v, mask)
    want = jax.jit(mha_xla)(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )


def test_pallas_backward_non_multiple_k_block(rng):
    # T=384: q_block 128 divides, preferred k_block 256 does NOT — the bwd
    # must pick a dividing block instead of silently dropping tail gradients.
    q, k, v, mask = _inputs(rng, t=384)

    def loss(fn):
        return lambda a, b_, c: jnp.sum(
            jnp.where(mask[..., None, None], fn(a, b_, c), 0.0) ** 2
        )

    g_p = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_pallas(a, b_, c, mask, q_block=128, backward="pallas")),
        argnums=(0, 1, 2),
    ))(q, k, v)
    g_x = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_xla(a, b_, c, mask)), argnums=(0, 1, 2)
    ))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=1e-4, rtol=1e-3, err_msg=name
        )


def test_fully_masked_rows_finite(rng):
    q, k, v, _ = _inputs(rng, b=1, t=128, masked_tail=False)
    mask = jnp.zeros((1, 128), bool)  # every key padded
    out = jax.jit(lambda *a: mha_pallas(*a, q_block=128))(q, k, v, mask)
    assert np.isfinite(np.asarray(out)).all()


def test_streaming_forward_matches_xla(rng, monkeypatch):
    """Long-T (k-blocked online-softmax) forward interior: force the
    streaming path at a CPU-friendly T and compare against XLA exactly."""
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "STREAM_MAX_T", 128)
    monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
    q, k, v, mask = _inputs(rng, t=256)
    want = jax.jit(mha_xla)(q, k, v, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=64))(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )


def test_streaming_gradients_match_xla(rng, monkeypatch):
    """Streaming dq (k-blocked) and dk/dv (q-chunked) kernels vs XLA grads."""
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "STREAM_MAX_T", 128)
    monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
    q, k, v, mask = _inputs(rng, t=256)

    def loss(fn):
        return lambda a, b_, c: jnp.sum(
            jnp.where(mask[..., None, None], fn(a, b_, c), 0.0) ** 2
        )

    g_p = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_pallas(a, b_, c, mask, q_block=64, backward="pallas")),
        argnums=(0, 1, 2),
    ))(q, k, v)
    g_x = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_xla(a, b_, c, mask)), argnums=(0, 1, 2)
    ))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=1e-4, rtol=1e-3, err_msg=name
        )


def test_streaming_t4096_forward_and_grad(rng):
    """The real trigger (T > STREAM_MAX_T = 2048) at reduced head dims:
    fwd + both backward kernels run the streaming interiors and match XLA."""
    q, k, v, mask = _inputs(rng, b=1, t=4096, h=2, dh=8, masked_tail=False)
    mask = np.array(mask)  # writable copy
    mask[0, 3000:] = False
    mask = jnp.asarray(mask)

    def loss(fn):
        return lambda a, b_, c: jnp.mean(
            jnp.where(mask[..., None, None], fn(a, b_, c), 0.0) ** 2
        )

    want = jax.jit(mha_xla)(q, k, v, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, backward="pallas"))(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )
    g_p = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_pallas(a, b_, c, mask, backward="pallas")),
        argnums=(0, 1, 2),
    ))(q, k, v)
    g_x = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_xla(a, b_, c, mask)), argnums=(0, 1, 2)
    ))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=1e-6, rtol=1e-3, err_msg=name
        )


def test_fully_masked_rows_finite_streaming(rng, monkeypatch):
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "STREAM_MAX_T", 64)
    monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
    q, k, v, _ = _inputs(rng, b=1, t=128, masked_tail=False)
    mask = jnp.zeros((1, 128), bool)
    out = jax.jit(lambda *a: mha_pallas(*a, q_block=64))(q, k, v, mask)
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_softmax_interior_close_to_f32(rng):
    """attn_softmax_dtype="bfloat16": outputs stay within bf16-grade error of
    the f32-interior kernel, forward and gradients (both kernel families)."""
    import repurpose_tpu.ops.flash_attention as fa

    for t, kw in [(256, {}), (256, {"q_block": 64})]:
        q, k, v, mask = _inputs(rng, t=t)
        f32 = jax.jit(lambda *a: mha_pallas(*a, **kw))(q, k, v, mask)
        b16 = jax.jit(lambda *a: mha_pallas(*a, softmax_dtype="bfloat16", **kw))(
            q, k, v, mask
        )
        valid = np.asarray(mask)
        np.testing.assert_allclose(
            np.asarray(b16)[valid], np.asarray(f32)[valid], atol=2e-2
        )

    q, k, v, mask = _inputs(rng, t=256)

    def loss(sm):
        return lambda a, b_, c: jnp.mean(
            jnp.where(
                mask[..., None, None],
                mha_pallas(a, b_, c, mask, backward="pallas", softmax_dtype=sm),
                0.0,
            )
            ** 2
        )

    g32 = jax.jit(jax.grad(loss("float32"), argnums=(0, 1, 2)))(q, k, v)
    g16 = jax.jit(jax.grad(loss("bfloat16"), argnums=(0, 1, 2)))(q, k, v)
    for a, b_, name in zip(g16, g32, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, err_msg=name
        )


def test_bf16_softmax_streaming(rng, monkeypatch):
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "STREAM_MAX_T", 128)
    monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
    q, k, v, mask = _inputs(rng, t=256)
    want = jax.jit(mha_xla)(q, k, v, mask)
    got = jax.jit(
        lambda *a: mha_pallas(*a, q_block=64, softmax_dtype="bfloat16")
    )(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-2
    )


def test_empty_row_in_batch_zero_grads(rng):
    """Prefix skipping edge case: a batch mixing a fully-padded row (kvl=0,
    every block skipped) with a full row and a partial row. Outputs on valid
    positions and ALL grads must match XLA exactly; the empty row's grads are
    exactly zero (its loss contribution is masked, and skipped blocks write
    zeros rather than garbage)."""
    q, k, v, _ = _inputs(rng, b=3, t=256, masked_tail=False)
    mask = np.ones((3, 256), bool)
    mask[1, :] = False  # empty row in the MIDDLE of the batch
    mask[2, 100:] = False
    mask = jnp.asarray(mask)

    def loss(fn):
        return lambda a, b_, c: jnp.sum(
            jnp.where(mask[..., None, None], fn(a, b_, c), 0.0) ** 2
        )

    got = jax.jit(lambda *a: mha_pallas(*a, q_block=64, backward="pallas"))(
        q, k, v, mask
    )
    want = jax.jit(mha_xla)(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )
    g_p = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_pallas(a, b_, c, mask, q_block=64, backward="pallas")),
        argnums=(0, 1, 2),
    ))(q, k, v)
    g_x = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_xla(a, b_, c, mask)), argnums=(0, 1, 2)
    ))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=1e-4, rtol=1e-3, err_msg=name
        )
        assert not np.isnan(np.asarray(gp)).any(), name
    for gp in g_p:
        np.testing.assert_array_equal(np.asarray(gp)[1], 0.0)


def test_empty_row_streaming_zero_grads(rng, monkeypatch):
    """Same empty-row edge case through the STREAMING kernel interiors
    (dynamic k-sweep bound cdiv(kvl=0) = 0 iterations)."""
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "STREAM_MAX_T", 128)
    monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
    q, k, v, _ = _inputs(rng, b=2, t=256, masked_tail=False)
    mask = np.ones((2, 256), bool)
    mask[0, :] = False
    mask[1, 150:] = False
    mask = jnp.asarray(mask)

    def loss(fn):
        return lambda a, b_, c: jnp.sum(
            jnp.where(mask[..., None, None], fn(a, b_, c), 0.0) ** 2
        )

    g_p = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_pallas(a, b_, c, mask, q_block=64, backward="pallas")),
        argnums=(0, 1, 2),
    ))(q, k, v)
    g_x = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_xla(a, b_, c, mask)), argnums=(0, 1, 2)
    ))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=1e-4, rtol=1e-3, err_msg=name
        )
    for gp in g_p:
        np.testing.assert_array_equal(np.asarray(gp)[0], 0.0)


def test_hbm_streaming_forward_matches_xla(rng, monkeypatch):
    """Arbitrary-T (HBM-resident K/V, double-buffered DMA) forward interior:
    force the HBM path at a CPU-friendly T and compare against XLA. On the
    chip this path is bit-exact vs the slab streaming kernels at T=8192
    (same online-softmax math, same block size)."""
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "HBM_STREAM_T", 128)
    monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
    q, k, v, mask = _inputs(rng, t=256)
    want = jax.jit(mha_xla)(q, k, v, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=64))(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )


def test_hbm_streaming_gradients_match_xla(rng, monkeypatch):
    """HBM dq (DMA-chunked K/V) + the 4-axis streaming dk/dv vs XLA grads,
    including a fully-padded row (kvl=0: zero DMA iterations)."""
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "HBM_STREAM_T", 128)
    monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
    q, k, v, _ = _inputs(rng, b=3, t=256, masked_tail=False)
    mask = np.ones((3, 256), bool)
    mask[0, 180:] = False
    mask[1, :] = False
    mask = jnp.asarray(mask)

    def loss(fn):
        return lambda a, b_, c: jnp.sum(
            jnp.where(mask[..., None, None], fn(a, b_, c), 0.0) ** 2
        )

    g_p = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_pallas(a, b_, c, mask, q_block=64, backward="pallas")),
        argnums=(0, 1, 2),
    ))(q, k, v)
    g_x = jax.jit(jax.grad(
        loss(lambda a, b_, c: mha_xla(a, b_, c, mask)), argnums=(0, 1, 2)
    ))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=1e-4, rtol=1e-3, err_msg=name
        )
    for gp in g_p:
        np.testing.assert_array_equal(np.asarray(gp)[1], 0.0)


# -- sequence-packed bounded-sweep kernel ------------------------------------------


def _packed_inputs(rng, b=2, t=256, h=4, dh=32):
    """Two packed rows: row 0 = videos of 100+80 steps then padding; row 1 =
    videos of 120+136 steps (full row)."""
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    seg = np.full((b, t), -1, np.int32)
    seg[0, :100] = 0
    seg[0, 100:180] = 1
    seg[1, :120] = 0
    seg[1, 120:] = 1
    mask = seg >= 0
    return q, k, v, jnp.asarray(mask), jnp.asarray(seg)


def test_packed_block_bounds_brute_force(rng):
    from repurpose_tpu.ops.flash_attention import _packed_block_bounds

    *_, mask, seg = _packed_inputs(rng)
    qb, kb = 64, 64
    lo, hi = jax.jit(lambda s: _packed_block_bounds(s, qb, kb))(seg)
    lo, hi = np.asarray(lo), np.asarray(hi)
    seg = np.asarray(seg)
    b, t = seg.shape
    for bi in range(b):
        # per-position video span
        for i in range(t // qb):
            rows = range(i * qb, (i + 1) * qb)
            allowed = set()
            for r in rows:
                if seg[bi, r] < 0:
                    continue
                same = np.nonzero(seg[bi] == seg[bi, r])[0]
                allowed.update(range(same.min(), same.max() + 1))
            if not allowed:
                continue  # fully-padded block: kernel skips it anyway
            want_lo, want_hi = min(allowed) // kb, -(-(max(allowed) + 1) // kb)
            assert lo[bi, i] <= want_lo and hi[bi, i] >= want_hi
            # and tight: bounds never include a block with no allowed key
            assert lo[bi, i] == want_lo and hi[bi, i] == want_hi


def test_packed_stream_forward_matches_xla(rng, monkeypatch):
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "PACKED_STREAM_T", 128)
    monkeypatch.setattr(fa, "PACKED_K_BLOCK", 64)
    q, k, v, mask, seg = _packed_inputs(rng)
    want = jax.jit(lambda *a: mha_xla(*a, seg_ids=seg))(q, k, v, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=64, seg_ids=seg))(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )


def test_packed_stream_gradients_match_xla(rng, monkeypatch):
    """Bounded-sweep forward's (o, lse) feed the dense packed backward via the
    custom VJP — grads must match the XLA packed path."""
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "PACKED_STREAM_T", 128)
    monkeypatch.setattr(fa, "PACKED_K_BLOCK", 64)
    q, k, v, mask, seg = _packed_inputs(rng)

    def loss(f):
        def inner(q, k, v):
            out = f(q, k, v)
            return jnp.sum(jnp.where(mask[..., None, None], out, 0.0) ** 2)
        return inner

    g_p = jax.jit(jax.grad(
        loss(lambda *a: mha_pallas(*a, mask, q_block=64, seg_ids=seg)),
        argnums=(0, 1, 2),
    ))(q, k, v)
    g_x = jax.jit(jax.grad(
        loss(lambda *a: mha_xla(*a, mask, seg_ids=seg)), argnums=(0, 1, 2)
    ))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=1e-4, rtol=1e-3, err_msg=name
        )


def test_packed_stream_bf16(rng, monkeypatch):
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "PACKED_STREAM_T", 128)
    monkeypatch.setattr(fa, "PACKED_K_BLOCK", 64)
    q, k, v, mask, seg = _packed_inputs(rng)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = jax.jit(lambda *a: mha_xla(*a, seg_ids=seg))(qb, kb, vb, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=64, seg_ids=seg))(qb, kb, vb, mask)
    assert got.dtype == jnp.bfloat16
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[valid],
        np.asarray(want, np.float32)[valid],
        atol=3e-2,
    )


def test_odd_bucket_gradient_falls_back(rng):
    """Buckets in (256, 512] not divisible by 8 (e.g. 300): the forward's
    q block is trivially legal (t itself) but the fused backward's k block
    is not — _mha_bwd must swap in the XLA-recompute backward for such
    shapes (keeping the fast Pallas forward) instead of dying on the fused
    backward's block assert at the first gradient step (review finding r3)."""
    t = 300
    q = jnp.asarray(rng.normal(0, 1, (2, t, 2, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (2, t, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (2, t, 2, 16)), jnp.float32)
    lens = np.array([t, t - 5])
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])

    g = jax.grad(lambda q_: mha_pallas(q_, k, v, mask, softmax_dtype="float32").sum())(q)
    gr = jax.grad(lambda q_: mha_xla(q_, k, v, mask).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-6)


# -- sequence packing at long T (VERDICT r3 item 3: packed long-T kernels) ----------


def _packed_loss(f, mask):
    def inner(q, k, v):
        out = f(q, k, v)
        return jnp.sum(jnp.where(mask[..., None, None], out, 0.0) ** 2)
    return inner


def _assert_packed_grads_match(q, k, v, mask, seg, q_block=64, atol=1e-4):
    g_p = jax.jit(jax.grad(
        _packed_loss(
            lambda *a: mha_pallas(*a, mask, q_block=q_block, seg_ids=seg), mask
        ),
        argnums=(0, 1, 2),
    ))(q, k, v)
    g_x = jax.jit(jax.grad(
        _packed_loss(lambda *a: mha_xla(*a, mask, seg_ids=seg), mask),
        argnums=(0, 1, 2),
    ))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=atol, rtol=1e-3, err_msg=name
        )


def test_packed_streaming_window_forward_and_grads(rng, monkeypatch):
    """STREAM_MAX_T < t <= HBM_STREAM_T packed: the bounded-sweep streaming
    forward plus the packed streaming dq and overlap-gated 4-axis streaming
    dkv — forward and all three grads match the XLA packed path."""
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "STREAM_MAX_T", 128)
    monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
    monkeypatch.setattr(fa, "PACKED_K_BLOCK", 64)
    monkeypatch.setattr(fa, "DEFAULT_K_BLOCK", 64)
    monkeypatch.setattr(fa, "DEFAULT_Q_BLOCK", 64)
    q, k, v, mask, seg = _packed_inputs(rng)  # t=256 > patched STREAM_MAX_T
    want = jax.jit(lambda *a: mha_xla(*a, seg_ids=seg))(q, k, v, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=64, seg_ids=seg))(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )
    _assert_packed_grads_match(q, k, v, mask, seg)


def test_packed_hbm_window_forward_and_grads(rng, monkeypatch):
    """t > HBM_STREAM_T packed: HBM-resident K/V with double-buffered DMA,
    seg bias, and the bounded k sweep — forward + grads match XLA packed."""
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "STREAM_MAX_T", 64)
    monkeypatch.setattr(fa, "HBM_STREAM_T", 128)
    monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
    monkeypatch.setattr(fa, "PACKED_K_BLOCK", 64)
    monkeypatch.setattr(fa, "DEFAULT_K_BLOCK", 64)
    monkeypatch.setattr(fa, "DEFAULT_Q_BLOCK", 64)
    q, k, v, mask, seg = _packed_inputs(rng)  # t=256 > patched HBM_STREAM_T
    want = jax.jit(lambda *a: mha_xla(*a, seg_ids=seg))(q, k, v, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=64, seg_ids=seg))(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )
    _assert_packed_grads_match(q, k, v, mask, seg)


def test_packed_streaming_bf16(rng, monkeypatch):
    import repurpose_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "STREAM_MAX_T", 128)
    monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
    monkeypatch.setattr(fa, "PACKED_K_BLOCK", 64)
    q, k, v, mask, seg = _packed_inputs(rng)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = jax.jit(lambda *a: mha_xla(*a, seg_ids=seg))(qb, kb, vb, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=64, seg_ids=seg))(qb, kb, vb, mask)
    assert got.dtype == jnp.bfloat16
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[valid],
        np.asarray(want, np.float32)[valid],
        atol=3e-2,
    )


@pytest.mark.slow
def test_packed_t4096_forward_and_grad(rng):
    """The real trigger (T=4096 > STREAM_MAX_T=2048) at reduced head dims:
    two multi-hour-scale videos packed into each 4096-bucket row, unpatched
    routing constants — packed streaming fwd/dq/dkv end to end."""
    b, t, h, dh = 1, 4096, 2, 32
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    seg = np.full((b, t), -1, np.int32)
    seg[0, :1800] = 0
    seg[0, 1800:3900] = 1
    mask = jnp.asarray(seg >= 0)
    seg = jnp.asarray(seg)
    want = jax.jit(lambda *a: mha_xla(*a, seg_ids=seg))(q, k, v, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, seg_ids=seg))(q, k, v, mask)
    valid = np.asarray(mask)[..., None, None] & np.ones((1, 1, h, dh), bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid[:, :, 0, 0]], np.asarray(want)[valid[:, :, 0, 0]],
        atol=2e-5, rtol=1e-4,
    )
    _assert_packed_grads_match(q, k, v, mask, seg, q_block=None, atol=2e-4)


def _pathological_packed_inputs(rng, t=256, h=4, dh=32):
    """Three adversarial rows for the packed kernels: row 0 = eight tiny
    videos at odd offsets (every video crosses a 64-block boundary or sits
    inside one), row 1 = ONE video spanning the whole row (bounds degrade to
    the dense sweep), row 2 = fully padded (kernel must skip it entirely)."""
    b = 3
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.float32)
    seg = np.full((b, t), -1, np.int32)
    edges = [0, 27, 61, 64, 65, 130, 190, 191, 250]  # odd spans incl. len-1
    for vid, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
        seg[0, lo:hi] = vid
    seg[1, :] = 0
    mask = seg >= 0
    return q, k, v, jnp.asarray(mask), jnp.asarray(seg)


@pytest.mark.parametrize("window", ["dense", "stream", "hbm"])
def test_packed_pathological_layouts(rng, monkeypatch, window):
    """Adversarial packings (tiny videos at odd offsets incl. length-1, a
    full-row video, a fully-padded row) through each packed kernel window —
    forward and all grads must match the XLA packed path."""
    import repurpose_tpu.ops.flash_attention as fa

    if window != "dense":
        monkeypatch.setattr(fa, "STREAM_MAX_T", 128 if window == "stream" else 64)
        monkeypatch.setattr(fa, "PACKED_STREAM_T", 128)
        monkeypatch.setattr(fa, "STREAM_K_BLOCK", 64)
        monkeypatch.setattr(fa, "PACKED_K_BLOCK", 64)
        monkeypatch.setattr(fa, "DEFAULT_K_BLOCK", 64)
        monkeypatch.setattr(fa, "DEFAULT_Q_BLOCK", 64)
    if window == "hbm":
        monkeypatch.setattr(fa, "HBM_STREAM_T", 128)
    q, k, v, mask, seg = _pathological_packed_inputs(rng)
    want = jax.jit(lambda *a: mha_xla(*a, seg_ids=seg))(q, k, v, mask)
    got = jax.jit(lambda *a: mha_pallas(*a, q_block=64, seg_ids=seg))(q, k, v, mask)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-5, rtol=1e-4
    )
    _assert_packed_grads_match(q, k, v, mask, seg)
