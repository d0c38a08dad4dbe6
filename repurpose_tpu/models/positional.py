"""Sinusoidal positional encoding.

Same numerics as the reference's table (models/MMCTransformer.py:9-22):
pe[t, 2i] = sin(t * exp(-2i * ln(10000)/d)), pe[t, 2i+1] = cos(...).
Computed as a traced constant — XLA folds it into the compiled program, so
there is no host->device transfer and no parameter to checkpoint.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sinusoidal_positional_encoding(seq_len: int, d_model: int) -> jnp.ndarray:
    """Return [seq_len, d_model] float32 PE table."""
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    angles = position * div_term[None, :]
    pe = jnp.zeros((seq_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles[:, : (d_model // 2)]))
    return pe
