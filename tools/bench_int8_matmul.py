#!/usr/bin/env python
"""Microbenchmark: can a native Pallas int8 matmul beat XLA's int8 dot and
bf16 on v5e at the MMCT Dense shapes?

VERDICT.md round-1 item 7 asks for int8 to be made a real capability
(measured >=1.3x bf16 forward) or retired. ops/quant.py's round-2 chained
measurements put XLA's dynamic-int8 at parity with bf16 at T=2048; the
hypothesis is that XLA's int8 dot lowering on v5e leaves the MXU's nominal
2x int8 rate on the table and a hand-written Pallas kernel can claim it.

Shapes: the flagship encoder's Dense layers at batch 8 x bucket 2048
(M=16384): (M,512)x(512,512) qkv/out, (M,512)x(512,2048) ffn-up,
(M,2048)x(2048,512) ffn-down.

All timings chain N iterations inside one jitted scan (CLAUDE.md: ~30-40 ms
RPC floor per dispatch on this box) and report per-iteration time.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CHAIN = 500
SHAPES = [(16384, 512, 512), (16384, 512, 2048), (16384, 2048, 512)]


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
    """step: carry_scalar -> out array; returns jitted N_CHAIN-scan."""

    @jax.jit
    def run(*args):
        def body(c, _):
            out = step(c, *args)
            return out.reshape(-1)[0].astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_CHAIN)
        return c

    return run


# -- Pallas int8 matmul kernel -----------------------------------------------


def _int8_mm_kernel(x_ref, w_ref, ws_ref, o_ref):
    # x block [BM, K] bf16; w [K, BN] int8 (pre-quantized); ws [1, BN] f32.
    # Fused: per-row dynamic activation quantize -> int8 MXU dot -> dequant.
    x = x_ref[:].astype(jnp.float32)
    xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0  # [BM, 1]
    xs = jnp.maximum(xs, 1e-12)
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * xs * ws_ref[:]).astype(o_ref.dtype)


def pallas_int8_matmul(x, wq, ws, bm=512, bn=None, interpret=False):
    m, k = x.shape
    _, n = wq.shape
    bn = bn or n
    return pl.pallas_call(
        _int8_mm_kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, wq, ws)


# -- pure-int8-dot Pallas (both operands pre-quantized; upper bound) ----------


def _int8_core_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def pallas_int8_core(xq, wq, bm=512, interpret=False):
    m, k = xq.shape
    _, n = wq.shape
    return pl.pallas_call(
        _int8_core_kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        interpret=interpret,
    )(xq, wq)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    for m, k, n in SHAPES:
        x = jax.device_put(rng.normal(0, 1, (m, k)).astype(jnp.bfloat16))
        w = jax.device_put(rng.normal(0, 0.02, (k, n)).astype(jnp.bfloat16))
        wf = w.astype(jnp.float32)
        ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)

        flops = 2.0 * m * k * n

        # 1. bf16 XLA dot (the incumbent)
        t_bf16 = timed(
            chain(lambda c, x, w: jax.lax.dot(x + c.astype(x.dtype), w)), x, w
        )
        # 2. XLA int8 core dot (both pre-quantized)
        t_xla8 = timed(
            chain(
                lambda c, xq, wq: jax.lax.dot_general(
                    xq + c.astype(jnp.int8), wq,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            ),
            xq, wq,
        )
        # 3. Pallas int8 core dot
        t_pl8core = timed(
            chain(lambda c, xq, wq: pallas_int8_core(xq + c.astype(jnp.int8), wq)),
            xq, wq,
        )
        # 4. Pallas fused dynamic-quant matmul (production candidate)
        t_pl8 = timed(
            chain(lambda c, x, wq, ws: pallas_int8_matmul(x + c.astype(x.dtype), wq, ws)),
            x, wq, ws,
        )

        def tops(t):
            return flops / t / 1e12

        print(
            f"[{m}x{k}x{n}] bf16 {t_bf16*1e3:.3f} ms ({tops(t_bf16):.0f} T) | "
            f"xla-int8 {t_xla8*1e3:.3f} ({tops(t_xla8):.0f} T) | "
            f"pallas-int8-core {t_pl8core*1e3:.3f} ({tops(t_pl8core):.0f} T) | "
            f"pallas-fused {t_pl8*1e3:.3f} ({tops(t_pl8):.0f} T)",
            file=sys.stderr,
        )

        # numerics sanity for the fused kernel
        ref = xf @ (wq.astype(jnp.float32) * ws)
        got = np.asarray(pallas_int8_matmul(x, wq, ws)).astype(np.float32)
        rel = np.abs(got - np.asarray(ref)) / (np.abs(np.asarray(ref)) + 1.0)
        print(f"  fused-kernel max rel err vs fp32xQw: {rel.max():.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
