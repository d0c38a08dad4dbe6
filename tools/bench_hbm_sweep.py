#!/usr/bin/env python
"""Block sweep for the HBM-resident attention kernels at long T.

BENCH_r04: train MFU decays 19.1% @4096 -> 16.2% @32768; the HBM kernels
(_flash_fwd_hbm_kernel, _bwd_dq_hbm_kernel, 4-axis streaming dkv) were tuned
round 3 and never re-swept after the packed/seg-bias refactors (VERDICT r4
weak #4). Sweeps, back-to-back in one process at [1, 32768, 8, 64]:

  fwd:  STREAM_K_BLOCK (HBM DMA chunk) x HBM_FWD_D_BLOCK x q_block
  grad: STREAM_K_BLOCK x HBM_BWD_D_BLOCK x DEFAULT_K_BLOCK (dkv key block)

on the attention fwd / grad microbench (chained), then confirms any winner
on the full train step at T=32768 B=1 remat (the bench.py long-T row shape).

Usage: python tools/bench_hbm_sweep.py [--t 32768] [--grad] [--step]
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, H, DH = 1, 8, 64


def _sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0])


def timed(fn, *args, n_chain, reps=3):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n_chain


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=32768)
    ap.add_argument("--grad", action="store_true", help="sweep the backward too")
    ap.add_argument("--step", action="store_true",
                    help="confirm best config on the full train step")
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()
    T = args.t

    import jax
    import jax.numpy as jnp

    import repurpose_tpu.ops.flash_attention as fa
    from repurpose_tpu.ops.flash_attention import mha_pallas
    from repurpose_tpu.utils.platform import (
        enable_compilation_cache, honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}  T={T}", file=sys.stderr)
    assert T > fa.HBM_STREAM_T, "not in the HBM-kernel regime"

    rng = np.random.default_rng(0)
    q, k, v = (
        jax.device_put(rng.normal(0, 1, (B, T, H, DH)).astype(np.float32)
                       .astype(jnp.bfloat16))
        for _ in range(3)
    )
    mask = np.zeros((B, T), bool)
    mask[:, : T - 128] = True
    kv = jax.device_put(mask)

    # attention-only FLOPs for MFU context (2 matmuls fwd, 5 passes bwd)
    valid = int(mask.sum())
    flops_fwd = 4 * B * H * DH * valid * valid / B / B  # 2*2 per score elem
    peak = 394e12

    def fwd_chain(qb):
        @jax.jit
        def run(c, q, k, v, kv):
            def body(ci, _):
                o = mha_pallas(q + (ci * 1e-6).astype(q.dtype), k, v, kv,
                               q_block=qb)
                return jnp.sum(o).astype(jnp.float32), ()
            c2, _ = jax.lax.scan(body, c, None, length=args.chain)
            return c2
        return run

    def grad_chain(qb):
        def one(q, k, v, kv):
            return jnp.sum(
                mha_pallas(q, k, v, kv, q_block=qb).astype(jnp.float32)
            )
        g = jax.grad(one, argnums=(0, 1, 2))

        @jax.jit
        def run(c, q, k, v, kv):
            def body(ci, _):
                gq, gk, gv = g(q + (ci * 1e-6).astype(q.dtype), k, v, kv)
                return (jnp.sum(gq) + jnp.sum(gk) + jnp.sum(gv)).astype(
                    jnp.float32
                ), ()
            c2, _ = jax.lax.scan(body, c, None, length=args.chain)
            return c2
        return run

    base = (fa.STREAM_K_BLOCK, fa.HBM_FWD_D_BLOCK, fa.HBM_BWD_D_BLOCK,
            fa.DEFAULT_K_BLOCK)
    print("-- forward sweep --", file=sys.stderr)
    best_fwd, best_cfg = float("inf"), None
    for kb, db, qb in itertools.product(
        (512, 1024, 2048), (None, 256, 512), (256, 512, 1024)
    ):
        fa.STREAM_K_BLOCK, fa.HBM_FWD_D_BLOCK = kb, db
        try:
            ms = timed(fwd_chain(qb), jnp.float32(0.0), q, k, v, kv,
                       n_chain=args.chain) * 1e3
        except Exception as e:
            print(f"kb={kb:5d} db={str(db):4s} qb={qb:5d}: FAILED "
                  f"({str(e)[:80]})", file=sys.stderr)
            continue
        mfu = flops_fwd / (ms / 1e3) / peak
        tag = " <-- best" if ms < best_fwd else ""
        if ms < best_fwd:
            best_fwd, best_cfg = ms, (kb, db, qb)
        print(f"kb={kb:5d} db={str(db):4s} qb={qb:5d}: {ms:8.2f} ms "
              f"(attn-MFU {mfu:.1%}){tag}", file=sys.stderr)
    print(f"fwd best: {best_cfg} @ {best_fwd:.2f} ms", file=sys.stderr)

    if args.grad:
        print("-- backward sweep (fwd pinned to best) --", file=sys.stderr)
        fa.STREAM_K_BLOCK, fa.HBM_FWD_D_BLOCK = best_cfg[0], best_cfg[1]
        qb = best_cfg[2]
        best_g, best_gcfg = float("inf"), None
        for kb, bdb, dkb in itertools.product(
            (512, 1024, 2048), (None, 256), (256, 512)
        ):
            fa.STREAM_K_BLOCK, fa.HBM_BWD_D_BLOCK = kb, bdb
            fa.DEFAULT_K_BLOCK = dkb
            try:
                ms = timed(grad_chain(qb), jnp.float32(0.0), q, k, v, kv,
                           n_chain=max(2, args.chain // 2)) * 1e3
            except Exception as e:
                print(f"kb={kb:5d} bdb={str(bdb):4s} dkb={dkb:4d}: FAILED "
                      f"({str(e)[:80]})", file=sys.stderr)
                continue
            tag = " <-- best" if ms < best_g else ""
            if ms < best_g:
                best_g, best_gcfg = ms, (kb, bdb, dkb)
            print(f"kb={kb:5d} bdb={str(bdb):4s} dkb={dkb:4d}: {ms:8.2f} ms"
                  f"{tag}", file=sys.stderr)
        print(f"grad best: {best_gcfg} @ {best_g:.2f} ms", file=sys.stderr)

    (fa.STREAM_K_BLOCK, fa.HBM_FWD_D_BLOCK, fa.HBM_BWD_D_BLOCK,
     fa.DEFAULT_K_BLOCK) = base

    if args.step:
        # full train step at the bench.py long-T row shape, default blocks
        # vs swept blocks back-to-back
        from repurpose_tpu.config import ModelConfig, TrainConfig
        from repurpose_tpu.data.batching import Batch
        from repurpose_tpu.train.state import create_train_state
        from repurpose_tpu.train.step import make_train_step
        import dataclasses

        mcfg = dataclasses.replace(ModelConfig(), remat=True)
        tc = TrainConfig(batch_size=B, buckets=(T,))
        state, tx, sched = create_train_state(mcfg, tc, 100, jax.random.key(1))
        step = make_train_step(mcfg, tc, tx, sched, donate=False)
        batch = Batch(
            jax.device_put(rng.normal(0, 1, (B, T, 512)).astype(np.float32)),
            jax.device_put(rng.normal(0, 1, (B, T, 2048)).astype(np.float32)),
            jax.device_put(rng.normal(0, 1, (B, T, 384)).astype(np.float32)),
            kv,
            jax.device_put((rng.uniform(size=(B, T)) < 0.3).astype(np.float32)),
            jax.device_put(np.abs(rng.normal(0, 10, (B, T, 2))).astype(np.float32)),
            jax.device_put(np.asarray([T - 128], np.int32)),
        )
        key = jax.random.key(2, impl="rbg")

        def mkchain(step):
            @jax.jit
            def run(st, b):
                def body(s, _):
                    s2, m = step(s, b, key)
                    return s2, m["loss"]
                _, losses = jax.lax.scan(body, st, None, length=3)
                return losses[-1]
            return run

        ms = timed(mkchain(step), state, batch, n_chain=3) * 1e3
        print(f"train step default blocks: {ms:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
