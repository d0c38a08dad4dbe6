"""Learning-rate schedule: linear warmup then cosine annealing.

Parity with the reference's dual-scheduler setup (main.py:194-206, 405-409):
LambdaLR warmup ``(step+1)/warmup_steps`` for ``step < warmup_steps``, then
CosineAnnealingLR with ``T_max = total_steps`` stepped once per iteration.
With the shipped config (warmup_epochs=0, configs/Repurpose.yaml:39) this is
exactly ``lr * 0.5 * (1 + cos(pi * step / total_steps))``.

For warmup > 0 the reference's two torch schedulers both mutate the same
optimizer LR with ill-defined interplay; here the cosine phase simply starts
counting at the end of warmup — a deliberate, documented clean-up.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int
):
    """Returns an optax-compatible ``schedule(step) -> lr``."""
    total_steps = max(total_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            warm = (step + 1.0) / warmup_steps
        else:
            warm = 1.0
        # Clamp: if actual steps exceed the estimate (per-epoch batch counts
        # can vary with bucket grouping), hold the LR at the annealed floor
        # instead of cycling back up (torch's recursion would rise again).
        cos_step = jnp.clip(step - warmup_steps, 0.0, total_steps)
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * cos_step / total_steps))
        return base_lr * jnp.where(step < warmup_steps, warm, cosine)

    return schedule
