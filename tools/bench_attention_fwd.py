#!/usr/bin/env python
"""Attention-forward experiments at the headline shape [8, 2048, 8, 64].

The inference pipeline at bucket 2048 is attention-bound (ROADMAP.md), and the
forward sits at ~20-25% MFU. Candidates measured here, all chained on-device
(N_CHAIN serially-dependent iterations inside one program — the tunnel's
~30-40 ms RPC floor amortizes to noise):

A. mha_xla vs mha_pallas (current default) — sanity baseline.
B. q_block sweep for the Pallas forward: K/V slab HBM reloads scale with
   T/q_block, VMEM scores scale with q_block.
C. "no-transpose" variant: BlockSpecs index the native [B, T, H, Dh] layout
   directly (block (1, Tq, 1, Dh) at index (bi, i, hi)), eliminating the
   [B,T,H,Dh]->[B,H,T,Dh] transposes of q/k/v and the output transpose —
   4 full HBM round trips per layer in the current kernel.

Run AFTER any other TPU job finishes (shared chip: concurrent runs corrupt
both measurements).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from repurpose_tpu.ops.attention import NEG_INF, mha_xla
from repurpose_tpu.ops.flash_attention import mha_pallas

N_CHAIN = 100
B, T, H, DH = 8, 2048, 8, 64


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0])


def timed(fn, *args, reps=3):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN


def chain(step):
    @jax.jit
    def run(*args):
        def body(c, _):
            out = step(c, *args)
            return out.reshape(-1)[0].astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_CHAIN)
        return c

    return run


# -- no-transpose forward kernel ----------------------------------------------------


def _fwd_kernel_nt(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float, heads: int):
    # Flat [B, T, D] layout: q [1, Tq, D]; k/v [1, T, D]; mask [1, T]. One
    # program computes ALL heads for its q block — no [B,T,H,Dh]->[B,H,T,Dh]
    # transposes, no head reshape, K/V slab loaded once per q block.
    d = q_ref.shape[-1]
    dh = d // heads
    bias = jnp.where(mask_ref[0] != 0, 0.0, NEG_INF)  # [1, T]
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = (q_ref[0, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
        s = jax.lax.dot_general(
            q, k_ref[0, :, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v_ref.dtype), v_ref[0, :, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)


def mha_pallas_nt(
    q, k, v, key_valid, heads=8, q_block=256, d_block=128, interpret=False
):
    """Same semantics as mha_pallas forward; flat [B, T, D] in/out. The grid
    blocks the feature axis at ``d_block`` (>=128 for lane alignment), i.e.
    ``d_block // dh`` heads per program — bounds live score buffers."""
    b, t, d = q.shape
    dh = d // heads
    scale = 1.0 / (dh**0.5)
    heads_per_block = d_block // dh
    mask = key_valid[:, None, :].astype(jnp.int32)
    blk_q = pl.BlockSpec(
        (1, q_block, d_block), lambda bi, di, i: (bi, i, di), memory_space=pltpu.VMEM
    )
    blk_kv = pl.BlockSpec(
        (1, t, d_block), lambda bi, di, i: (bi, 0, di), memory_space=pltpu.VMEM
    )
    blk_mask = pl.BlockSpec(
        (1, 1, t), lambda bi, di, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_nt, scale=scale, heads=heads_per_block),
        grid=(b, d // d_block, t // q_block),
        in_specs=[blk_q, blk_kv, blk_kv, blk_mask],
        out_specs=blk_q,
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v, mask)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    q = jax.device_put(rng.normal(0, 1, (B, T, H, DH)).astype(jnp.bfloat16))
    k = jax.device_put(rng.normal(0, 1, (B, T, H, DH)).astype(jnp.bfloat16))
    v = jax.device_put(rng.normal(0, 1, (B, T, H, DH)).astype(jnp.bfloat16))
    mask = np.ones((B, T), bool)
    mask[:, 1800:] = False
    mask = jax.device_put(mask)

    qf = q.reshape(B, T, H * DH)
    kf = k.reshape(B, T, H * DH)
    vf = v.reshape(B, T, H * DH)

    # correctness of the no-transpose variant vs the shipping kernel
    a = np.asarray(mha_pallas(q, k, v, mask)).astype(np.float32)
    b_ = np.asarray(mha_pallas_nt(qf, kf, vf, mask, heads=H)).astype(np.float32)
    err = np.abs(a.reshape(B, T, H * DH) - b_).max()
    print(f"nt-vs-current max abs diff: {err:.4f}", file=sys.stderr)

    flops = 2 * 2 * B * H * T * T * DH  # qk + pv

    def perturb(c, x):
        return x + c.astype(x.dtype) * 1e-6

    t_xla = timed(chain(lambda c, q, k, v: mha_xla(perturb(c, q), k, v, mask)), q, k, v)
    print(f"xla:            {t_xla*1e3:7.3f} ms ({flops/t_xla/1e12:.0f} TFLOP/s)", file=sys.stderr)
    for qb in (128, 256, 512, 1024):
        t_p = timed(
            chain(lambda c, q, k, v, qb=qb: mha_pallas(perturb(c, q), k, v, mask, q_block=qb)),
            q, k, v,
        )
        print(f"pallas qb={qb:4d}: {t_p*1e3:7.3f} ms ({flops/t_p/1e12:.0f} TFLOP/s)", file=sys.stderr)
    for qb in (128, 256, 512):
        t_nt = timed(
            chain(
                lambda c, q, k, v, qb=qb: mha_pallas_nt(
                    perturb(c, q), k, v, mask, heads=H, q_block=qb
                )
            ),
            qf, kf, vf,
        )
        print(f"no-transpose qb={qb:4d}: {t_nt*1e3:7.3f} ms ({flops/t_nt/1e12:.0f} TFLOP/s)", file=sys.stderr)
    # end-to-end deltas the transposes cost: current path includes reshape+
    # transpose around the kernel; flat path consumes [B,T,D] directly.
    t_cur_e2e = timed(
        chain(
            lambda c, qf, kf, vf: mha_pallas(
                perturb(c, qf).reshape(B, T, H, DH), kf.reshape(B, T, H, DH),
                vf.reshape(B, T, H, DH), mask,
            ).reshape(B, T, H * DH)
        ),
        qf, kf, vf,
    )
    print(f"current e2e (flat->flat): {t_cur_e2e*1e3:7.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
