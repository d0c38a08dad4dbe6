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
travels with its K/V block.

Backward is a custom VJP in the flash-attention style: the forward saves only
its O(T/n) shards (q, k, v, mask, out, logsumexp) and the backward re-rotates
the K/V blocks around the ring, recomputing each score block from the saved
LSE — dq accumulates locally while dk/dv accumulators travel WITH their
blocks and take one final hop home. Peak backward memory is the same O(T/n)
as the forward (autodiff-through-scan would have saved all n rotated K/V
blocks, i.e. the full sequence — measured by the memory-analysis test in
tests/test_ring_attention.py::test_backward_memory_advantage).

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


def _rotate(xs, axis_name: str, perm):
    return tuple(jax.lax.ppermute(x, axis_name, perm) for x in xs)


def _ring_forward(q, k, v, key_valid, axis_name, batch_axis, model_axis, precision):
    """Per-shard forward: q [B, Tq, H, Dh] local; k/v/mask rotate.

    Returns (out [B, Tq, H, Dh], lse [B, H, Tq]) — lse is the global
    logsumexp of the masked scaled scores, the residual the backward needs to
    reconstruct exact softmax blocks without a second online-max pass."""
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
        k_cur, v_cur, m_cur = _rotate((k_cur, v_cur, m_cur), axis_name, perm)
        acc, m_max, denom = fold(k_cur, v_cur, m_cur, acc, m_max, denom)
        return (k_cur, v_cur, m_cur, acc, m_max, denom), None

    # Accumulator inits must be marked device-varying over the ring axis so
    # the scan carry type stays consistent after the first ppermute.
    # Outputs vary over every axis the inputs vary over (data, seq, model).
    vary = lambda x: jax.lax.pcast(x, (axis_name, batch_axis, model_axis), to="varying")
    acc0, m0, d0 = fold(
        k, v, key_valid,
        vary(jnp.zeros((b, h, tq, dh), jnp.float32)),
        vary(jnp.full((b, h, tq), -jnp.inf, jnp.float32)),
        vary(jnp.zeros((b, h, tq), jnp.float32)),
    )
    init = (k, v, key_valid, acc0, m0, d0)
    (_, _, _, acc, m_max, denom), _ = jax.lax.scan(step, init, None, length=n - 1)
    out = acc / jnp.maximum(denom[..., None], 1e-30)
    # lse = -inf marks fully-masked query rows (NEG_INF scores still produce a
    # finite max of NEG_INF*scale-ish; truly -inf only for tq rows with
    # denom==0, which cannot happen since NEG_INF is finite — keep the guard
    # for robustness anyway).
    lse = m_max + jnp.log(jnp.maximum(denom, 1e-30))
    return out.transpose(0, 2, 1, 3).astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _ring_attention_shard(q, k, v, key_valid, axis_name, batch_axis, model_axis, precision):
    out, _ = _ring_forward(
        q, k, v, key_valid, axis_name, batch_axis, model_axis, precision
    )
    return out


def _ring_fwd(q, k, v, key_valid, axis_name, batch_axis, model_axis, precision):
    out, lse = _ring_forward(
        q, k, v, key_valid, axis_name, batch_axis, model_axis, precision
    )
    return out, (q, k, v, key_valid, out, lse)


def _ring_bwd(axis_name, batch_axis, model_axis, precision, res, dout):
    """Flash-style ring backward. Saved residuals are one shard each; the
    K/V blocks (with their dk/dv accumulators riding along) make n-1
    rotations for the recompute plus ONE final hop that carries each finished
    dk/dv home to its block's own device."""
    q, k, v, key_valid, out, lse = res
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qf = q.astype(jnp.float32)
    dof = dout.astype(jnp.float32)
    # delta_i = sum_d dout_id * out_id  (per query) — the softmax-jacobian term
    delta = jnp.einsum("bqhd,bqhd->bhq", dof, out.astype(jnp.float32))

    def fold(k_cur, v_cur, m_cur, dk_cur, dv_cur, dq):
        kf = k_cur.astype(jnp.float32)
        vf = v_cur.astype(jnp.float32)
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, kf,
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale
        s = s + jnp.where(m_cur[:, None, None, :], 0.0, NEG_INF)
        p = jnp.exp(s - lse[..., None])  # exact softmax probs from saved lse
        dv_cur = dv_cur + jnp.einsum(
            "bhqk,bqhd->bkhd", p, dof,
            preferred_element_type=jnp.float32, precision=precision,
        )
        dp = jnp.einsum(
            "bqhd,bkhd->bhqk", dof, vf,
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - delta[..., None])  # [B, H, Tq, Tk]
        dq = dq + jnp.einsum(
            "bhqk,bkhd->bqhd", ds, kf,
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale
        dk_cur = dk_cur + jnp.einsum(
            "bhqk,bqhd->bkhd", ds, qf,
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale
        return dk_cur, dv_cur, dq

    def step(carry, _):
        k_cur, v_cur, m_cur, dk_cur, dv_cur, dq = carry
        # dk/dv ride with their block so each block accumulates its gradient
        # contribution from every device it visits.
        k_cur, v_cur, m_cur, dk_cur, dv_cur = _rotate(
            (k_cur, v_cur, m_cur, dk_cur, dv_cur), axis_name, perm
        )
        dk_cur, dv_cur, dq = fold(k_cur, v_cur, m_cur, dk_cur, dv_cur, dq)
        return (k_cur, v_cur, m_cur, dk_cur, dv_cur, dq), None

    vary = lambda x: jax.lax.pcast(x, (axis_name, batch_axis, model_axis), to="varying")
    dk0, dv0, dq0 = fold(
        k, v, key_valid,
        vary(jnp.zeros(k.shape, jnp.float32)),
        vary(jnp.zeros(v.shape, jnp.float32)),
        vary(jnp.zeros(q.shape, jnp.float32)),
    )
    init = (k, v, key_valid, dk0, dv0, dq0)
    (_, _, _, dk, dv, dq), _ = jax.lax.scan(step, init, None, length=n - 1)
    # After n-1 rotations device i holds block i+1 (mod n) and its finished
    # dk/dv; one more hop (i -> i+1) delivers them home.
    dk, dv = _rotate((dk, dv), axis_name, perm)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_ring_attention_shard.defvjp(_ring_fwd, _ring_bwd)


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
    def body(q_, k_, v_, m_):
        # positional call: custom_vjp functions reject keyword arguments
        return _ring_attention_shard(
            q_, k_, v_, m_, seq_axis, batch_axis, model_axis, precision
        )

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
    )(q, k, v, key_valid)
