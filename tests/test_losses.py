"""Loss parity vs golden outputs of the reference TorchScript losses
(models/losses.py), plus masking/reduction semantics."""

import json
import os

import jax.numpy as jnp
import numpy as np

from repurpose_tpu.ops.losses import (
    ctr_diou_loss_1d,
    masked_cls_loss,
    masked_reg_loss,
    sigmoid_focal_loss,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "losses.json")


def _golden():
    return json.load(open(GOLDEN))


def test_focal_matches_reference():
    g = _golden()
    got = sigmoid_focal_loss(
        jnp.asarray(g["logits"], jnp.float32), jnp.asarray(g["targets"], jnp.float32)
    )
    # rtol allows fp32 rounding differences between equivalent stable-BCE forms.
    np.testing.assert_allclose(got, np.asarray(g["focal"]), rtol=2e-4, atol=1e-7)


def test_focal_default_alpha_gamma():
    # alpha=0.7, gamma=2.0 are the reference defaults (models/losses.py:8-9).
    x = jnp.asarray([[0.0]])
    y = jnp.asarray([[1.0]])
    # p=0.5, ce=log(2), loss = 0.7 * log(2) * 0.25
    np.testing.assert_allclose(
        sigmoid_focal_loss(x, y), 0.7 * np.log(2) * 0.25, rtol=1e-6
    )


def test_diou_matches_reference():
    g = _golden()
    got = ctr_diou_loss_1d(
        jnp.asarray(g["off_in"], jnp.float32), jnp.asarray(g["off_tg"], jnp.float32)
    )
    np.testing.assert_allclose(got, np.asarray(g["diou"]), rtol=1e-5, atol=1e-6)


def test_masked_cls_loss_ignores_padding():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 10, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=(2, 10)), jnp.float32)
    mask_full = jnp.ones((2, 10), bool)
    mask_half = mask_full.at[:, 5:].set(False)
    full = masked_cls_loss(logits, labels, mask_full)
    half = masked_cls_loss(logits, labels, mask_half)
    manual = sigmoid_focal_loss(logits[..., 0], labels)[:, :5].sum()
    np.testing.assert_allclose(half, manual, rtol=1e-6)
    assert half < full


def test_masked_reg_loss_positive_only():
    offsets = jnp.ones((1, 4, 2))
    gt = jnp.ones((1, 4, 2)) * 2
    labels = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    mask = jnp.asarray([[True, True, False, True]])
    per = ctr_diou_loss_1d(offsets, gt)
    np.testing.assert_allclose(
        masked_reg_loss(offsets, gt, labels, mask), per[0, 0], rtol=1e-6
    )
