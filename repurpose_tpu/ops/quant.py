"""Dynamic int8 quantized matmul path (inference).

v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate. This module
provides a drop-in ``dot_general`` for flax Dense layers that dynamically
quantizes activations per-row and weights per-column to int8, runs the
integer matmul, and rescales — no calibration pass, works with existing
float checkpoints (weights quantize on the fly; the elementwise quantize cost
is negligible next to the matmul).

Enable with ModelConfig.quantize="int8" (inference configs only — the
straight-through estimator needed for training is out of scope). Accuracy is
validated against the fp32 path in tests; expect ~1e-2-level logit deltas,
comparable to bf16 activations.

STATUS (round-2 measurements, chained on-device so the tunnel's RPC floor is
out of the numbers — round 1's "1.5x slower" was that floor, not the op):
- T=2048 batch 8: 29.98 ms vs bf16 29.34 ms — parity (the forward is
  attention-bound there; attention is not quantized).
- T=256: 2.78 vs 2.96 ms (1.06x faster); T=512: 5.32 vs 5.50 ms (1.03x) —
  where the Dense matmuls dominate, int8 wins modestly.
The dynamic-quantize overhead is NOT the limiter (weight quantize is
O(K*N) ~= matmul/2048; activation quantize O(M*K) ~= matmul/N): the gap to
the MXU's nominal 2x int8 rate sits in XLA's int8 dot lowering on v5e. A
native-int8 Pallas matmul kernel is the remaining lever (ROADMAP.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def int8_dynamic_dot_general(lhs: Array, rhs: Array, dimension_numbers, precision=None,
                             preferred_element_type=None):
    """dot_general for Dense layers ((..., K) x (K, N)): dynamic int8."""
    (lc, rc), (lb, rb) = dimension_numbers
    # Only the plain Dense pattern is quantized; anything else falls back.
    if lb or rb or list(lc) != [lhs.ndim - 1] or list(rc) != [0] or rhs.ndim != 2:
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers,
            precision=precision, preferred_element_type=preferred_element_type,
        )
    x = lhs.astype(jnp.float32)
    w = rhs.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    x_scale = jnp.maximum(x_scale, 1e-12)
    w_scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    w_scale = jnp.maximum(w_scale, 1e-12)
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers, preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * x_scale * w_scale
    # honor dot_general's dtype contract: promoted input dtype unless the
    # caller asked for something specific (flax Dense relies on this to keep
    # bf16 activations bf16)
    target = (
        preferred_element_type
        if preferred_element_type is not None
        else jnp.promote_types(lhs.dtype, rhs.dtype)
    )
    return out.astype(target)
