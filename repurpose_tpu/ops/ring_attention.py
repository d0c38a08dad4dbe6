"""Ring attention: exact masked attention with K/V sharded over the ``seq``
mesh axis.

Capability beyond the reference (SURVEY.md §5.7: it has NO sequence
parallelism — long videos were simply truncated at 1800 s). The plain seq
sharding in this framework lets XLA all-gather K/V around attention, which
materializes the full sequence per device; ring attention never does — each
device holds one sequence shard and the K/V blocks rotate around the ring
(``jax.lax.ppermute``, riding adjacent ICI links) while an online-softmax
accumulator folds in one block per step. Peak memory per device is O(T/n)
activations + one in-flight block, enabling multi-hour videos.

Numerics: scores/softmax in float32, identical results to ``mha_xla`` up to
fp reassociation (verified by tests on a virtual mesh). The key-padding mask
travels with its K/V block. Backward is JAX autodiff through the scan —
fine at these scales; a custom VJP is a later optimization.

Usage (inside jit, activations sharded [B, T, H, Dh] with T over "seq"):

    out = ring_attention(q, k, v, key_valid, mesh)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from repurpose_tpu.ops.attention import NEG_INF

Array = jax.Array


def _ring_body(q, k, v, key_valid, axis_name: str, batch_axis: str, model_axis: str, precision: str):
    """Per-shard computation: q [B, Tq, H, Dh] local; k/v/mask rotate."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    b, tq, h, _ = q.shape
    qf = q.astype(jnp.float32)

    def fold(k_cur, v_cur, m_cur, acc, m_max, denom):
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, k_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale
        s = s + jnp.where(m_cur[:, None, None, :], 0.0, NEG_INF)
        blk_max = jnp.max(s, axis=-1)  # [B, H, Tq]
        new_max = jnp.maximum(m_max, blk_max)
        corr = jnp.exp(m_max - new_max)
        p = jnp.exp(s - new_max[..., None])  # [B, H, Tq, K]
        denom = denom * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32, precision=precision,
        )
        return acc, new_max, denom

    def step(carry, _):
        # rotate FIRST, then fold: the local block is folded before the scan,
        # so the loop runs n-1 rotations (not n — no wasted final ICI hop).
        k_cur, v_cur, m_cur, acc, m_max, denom = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        m_cur = jax.lax.ppermute(m_cur, axis_name, perm)
        acc, m_max, denom = fold(k_cur, v_cur, m_cur, acc, m_max, denom)
        return (k_cur, v_cur, m_cur, acc, m_max, denom), None

    # Accumulator inits must be marked device-varying over the ring axis so
    # the scan carry type stays consistent after the first ppermute.
    # Outputs vary over every axis the inputs vary over (data, seq, model).
    vary = lambda x: jax.lax.pvary(x, (axis_name, batch_axis, model_axis))
    acc0, m0, d0 = fold(
        k, v, key_valid,
        vary(jnp.zeros((b, h, tq, dh), jnp.float32)),
        vary(jnp.full((b, h, tq), -jnp.inf, jnp.float32)),
        vary(jnp.zeros((b, h, tq), jnp.float32)),
    )
    init = (k, v, key_valid, acc0, m0, d0)
    (_, _, _, acc, _, denom), _ = jax.lax.scan(step, init, None, length=n - 1)
    out = acc / jnp.maximum(denom[..., None], 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # [B, Tq, H, Dh]


def ring_attention(
    q: Array, k: Array, v: Array, key_valid: Array,
    mesh: Mesh, seq_axis: str = "seq", batch_axis: str = "data",
    model_axis: str = "model", precision: str = "default",
) -> Array:
    """[B, T, H, Dh] x3 + mask [B, T], T sharded over ``seq_axis`` ->
    [B, T, H, Dh] with the same sharding. Call from traced (jit) code."""
    # Heads shard over the model axis: TP's qkv projection already produces
    # head-sharded activations, and attention is independent per head, so the
    # ring runs on local heads with no gather (exact under any model size).
    qkv_spec = P(batch_axis, seq_axis, model_axis, None)
    mask_spec = P(batch_axis, seq_axis)
    body = functools.partial(
        _ring_body, axis_name=seq_axis, batch_axis=batch_axis,
        model_axis=model_axis, precision=precision,
    )
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
    )(q, k, v, key_valid)
