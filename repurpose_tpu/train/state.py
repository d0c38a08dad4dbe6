"""Train state: params + optimizer state + step, as one pytree.

Optimizer parity with the reference (main.py:190-191): torch ``Adam(lr,
weight_decay)`` applies L2 regularization *inside the gradient* (g + wd * p)
before the moment updates — reproduced by putting
``optax.add_decayed_weights`` *before* ``scale_by_adam`` in the chain (the
decoupled-AdamW ordering would place it after and NOT match).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from repurpose_tpu.config import ModelConfig, TrainConfig
from repurpose_tpu.models import build_model, init_model_params
from repurpose_tpu.train.schedule import warmup_cosine_schedule


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    nonfinite_count: jax.Array = flax.struct.field(
        default_factory=lambda: jnp.int32(0)
    )
    """Running count of train steps whose loss or grad norm was non-finite.

    Updated inside the jitted step, so every step is checked with zero extra
    host syncs; the Trainer reads it before each checkpoint save (refusing to
    persist a poisoned state) and on its periodic probe. The reference has no
    divergence guard at all."""


def _not_reg_head(params) -> Any:
    """Mask pytree: False on every leaf under a ``reg_head`` subtree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not any(getattr(p, "key", None) == "reg_head" for p in path),
        params,
    )


def make_optimizer(
    train_cfg: TrainConfig, steps_per_epoch: int
) -> tuple[optax.GradientTransformation, Callable]:
    """Adam + warmup->cosine schedule (reference main.py:190-206).

    Parity subtlety: with the regression loss disabled (the reference's
    shipped setup, main.py:664), NO loss touches the reg head, so its torch
    grads are ``None`` and ``torch.optim.Adam`` skips those params entirely —
    including their weight decay. JAX autodiff yields zeros instead, and
    zero-grad Adam + L2-in-gradient would silently decay the head to 0 at
    ~lr/step. ``optax.masked`` freezes the reg_head subtree exactly like
    torch does (verified against a trained reference checkpoint in
    tests/test_train_parity.py). With reg_loss_weight > 0 the head trains
    normally."""
    total_steps = train_cfg.epochs * steps_per_epoch
    warmup_steps = train_cfg.warmup_epochs * steps_per_epoch
    schedule = warmup_cosine_schedule(train_cfg.lr, warmup_steps, total_steps)
    tx = optax.chain(
        optax.add_decayed_weights(train_cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )
    if train_cfg.reg_loss_weight == 0.0:
        tx = optax.masked(tx, _not_reg_head)
    return tx, schedule


def create_train_state(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    steps_per_epoch: int,
    rng: jax.Array,
    mesh=None,
) -> tuple[TrainState, optax.GradientTransformation, Callable]:
    model = build_model(model_cfg, mesh=mesh)
    params = init_model_params(model, model_cfg, rng)
    tx, schedule = make_optimizer(train_cfg, steps_per_epoch)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0)), tx, schedule
