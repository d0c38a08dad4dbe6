"""Loss functions as pure jnp — trivially jittable, fusible by XLA.

Re-derivations of the reference's TorchScript losses:
- sigmoid focal loss (RetinaNet), alpha=0.7 gamma=2.0 — models/losses.py:4-53;
- 1-D center-offset Distance-IoU loss — models/losses.py:56-116 (defined in the
  reference but excluded from training, main.py:664; exposed here behind
  ``TrainConfig.reg_loss_weight``);
- the masked-sum classification objective — models/MMCTransformer.py:159-179.

Losses compute in float32 regardless of the activation dtype (the reference
casts to float at losses.py:35-36); on TPU the focal-loss elementwise chain
fuses into the preceding matmul's epilogue, so there is no bandwidth win from
a handwritten kernel here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def sigmoid_focal_loss(
    inputs: Array,
    targets: Array,
    alpha: float = 0.7,
    gamma: float = 2.0,
) -> Array:
    """Elementwise focal loss (no reduction), float32.

    loss = alpha_t * BCE(x, y) * (1 - p_t)^gamma, with
    p_t = p*y + (1-p)*(1-y), alpha_t = alpha*y + (1-alpha)*(1-y).
    """
    x = inputs.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    # Numerically stable BCE-with-logits: max(x,0) - x*y + log1p(exp(-|x|)).
    ce = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * y + (1.0 - p) * (1.0 - y)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * y + (1.0 - alpha) * (1.0 - y)
        loss = alpha_t * loss
    return loss


def ctr_diou_loss_1d(
    input_offsets: Array,
    target_offsets: Array,
    eps: float = 1e-8,
) -> Array:
    """Distance-IoU loss on (left, right) offsets around a shared center.

    Elementwise over leading dims; offsets are assumed non-negative (the model's
    reg head ends in ReLU, models/MMCTransformer.py:92, and GT offsets are
    distances). No runtime assert — under jit, garbage-in is the caller's bug.
    """
    inp = input_offsets.astype(jnp.float32)
    tgt = target_offsets.astype(jnp.float32)
    lp, rp = inp[..., 0], inp[..., 1]
    lg, rg = tgt[..., 0], tgt[..., 1]

    lkis = jnp.minimum(lp, lg)
    rkis = jnp.minimum(rp, rg)
    intsctk = rkis + lkis
    unionk = (lp + rp) + (lg + rg) - intsctk
    iouk = intsctk / jnp.clip(unionk, eps, None)

    len_c = jnp.maximum(lp, lg) + jnp.maximum(rp, rg)
    rho = 0.5 * (rp - lp - rg + lg)
    return 1.0 - iouk + jnp.square(rho / jnp.clip(len_c, eps, None))


def masked_cls_loss(
    cls_logits: Array,  # [B, T, 1]
    labels: Array,  # [B, T]
    mask: Array,  # [B, T] (bool or 0/1)
    alpha: float = 0.7,
    gamma: float = 2.0,
) -> Array:
    """Summed focal loss over valid timesteps (MMCTransformer.losses :159-179)."""
    focal = sigmoid_focal_loss(cls_logits[..., 0], labels, alpha=alpha, gamma=gamma)
    return jnp.sum(focal * mask.astype(jnp.float32))


def masked_reg_loss(
    offsets: Array,  # [B, T, 2]
    gt_offsets: Array,  # [B, T, 2]
    labels: Array,  # [B, T] — regression is supervised on positive seconds only
    mask: Array,  # [B, T]
) -> Array:
    """Summed DIoU loss over valid positive timesteps.

    Capability beyond the shipped reference (which trains cls-only); weighting
    is controlled by ``TrainConfig.reg_loss_weight`` (default 0.0 for parity).
    """
    diou = ctr_diou_loss_1d(offsets, gt_offsets)
    w = mask.astype(jnp.float32) * labels.astype(jnp.float32)
    return jnp.sum(diou * w)
