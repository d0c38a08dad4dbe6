"""Cross-modal fusion variant (the reference's unused transformer.py library,
wired as a runnable MMCTCross model)."""

import jax
import jax.numpy as jnp
import numpy as np

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.models.cross_modal import MMCTCross, UniModalEncoder

TINY = ModelConfig(
    vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
    text_num_layers=1, cross_num_layers=1, num_heads=2, d_ff=32, hidden_dim=8,
    compute_dtype="float32", attention_impl="xla",
)


def _batch(rng, b=2, t=32):
    vis = jnp.asarray(rng.normal(0, 1, (b, t, 8)), jnp.float32)
    aud = jnp.asarray(rng.normal(0, 1, (b, t, 12)), jnp.float32)
    txt = jnp.asarray(rng.normal(0, 1, (b, t, 4)), jnp.float32)
    mask = np.ones((b, t), bool)
    mask[0, t // 2 :] = False
    return vis, aud, txt, jnp.asarray(mask)


def test_cross_model_forward_shapes(rng):
    model = MMCTCross(TINY)
    vis, aud, txt, mask = _batch(rng)
    params = jax.jit(
        lambda r: model.init(r, vis, aud, txt, mask, True)["params"]
    )(jax.random.key(0))
    out = jax.jit(lambda p: model.apply({"params": p}, vis, aud, txt, mask, True))(params)
    assert out.cls_logits.shape == (2, 32, 1)
    assert out.offsets.shape == (2, 32, 2)
    assert (np.asarray(out.offsets) >= 0).all()  # reg head ReLU
    assert np.isfinite(np.asarray(out.cls_logits)).all()


def test_cross_model_trains(rng):
    model = MMCTCross(TINY)
    vis, aud, txt, mask = _batch(rng)
    labels = jnp.asarray(rng.integers(0, 2, (2, 32)), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, vis, aud, txt, mask, True)["params"]
    )(jax.random.key(0))

    from repurpose_tpu.ops.losses import masked_cls_loss

    @jax.jit
    def loss_fn(p):
        out = model.apply({"params": p}, vis, aud, txt, mask, True)
        return masked_cls_loss(out.cls_logits, labels, mask)

    g = jax.jit(jax.grad(loss_fn))(params)
    norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
    assert max(norms) > 0 and all(np.isfinite(n) for n in norms)


def test_unimodal_encoder_masking(rng):
    enc = UniModalEncoder(TINY, num_layers=1)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 8)), jnp.float32)
    mask = jnp.ones((1, 16), bool)
    params = jax.jit(lambda r: enc.init(r, x, mask, True)["params"])(jax.random.key(0))
    run = jax.jit(lambda xx, m: enc.apply({"params": params}, xx, m, True))
    # changing a masked-out position must not affect valid outputs
    mask2 = mask.at[0, 10:].set(False)
    x2 = x.at[0, 12].set(99.0)
    o1 = run(x, mask2)
    o2 = run(x2, mask2)
    np.testing.assert_allclose(
        np.asarray(o1)[0, :10], np.asarray(o2)[0, :10], atol=1e-5
    )


def test_bottleneck_model_forward_and_grads(rng):
    import dataclasses

    from repurpose_tpu.models import build_model
    from repurpose_tpu.ops.losses import masked_cls_loss

    cfg = dataclasses.replace(TINY, fusion="bottleneck")
    model = build_model(cfg)
    vis, aud, txt, mask = _batch(rng)
    labels = jnp.asarray(rng.integers(0, 2, (2, 32)), jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, vis, aud, txt, mask, True)["params"]
    )(jax.random.key(0))
    assert "bottleneck_tokens" in params

    out = jax.jit(lambda p: model.apply({"params": p}, vis, aud, txt, mask, True))(params)
    assert out.cls_logits.shape == (2, 32, 1)
    assert np.isfinite(np.asarray(out.cls_logits)).all()

    @jax.jit
    def loss_fn(p):
        o = model.apply({"params": p}, vis, aud, txt, mask, True)
        return masked_cls_loss(o.cls_logits, labels, mask)

    g = jax.jit(jax.grad(loss_fn))(params)
    # the bottleneck tokens must receive gradient (fusion actually flows)
    assert float(jnp.abs(g["bottleneck_tokens"]).max()) > 0
