#!/usr/bin/env python
"""Kernel-level attribution of the packed-train overhead at bucket 2048.

BENCH_r04: packed train is 87.2 ms/step vs 74.4 unpacked at the same
[6, 2048] shapes (+17%) — videos/s still wins (the packed step covers ~2x
the videos), but the overhead had no attribution (VERDICT r4 weak #3). This
decomposes it, packed vs unpacked back-to-back at IDENTICAL shapes:

  attn-fwd      mha_pallas forward alone, x16-layer-equivalent chain
  attn-grad     value_and_grad through mha_pallas alone
  model-fwd     full MMCT eval forward
  model-grad    full value_and_grad (no optimizer)
  full-step     make_train_step (grad + Adam + metrics)

Measured (v5e, 2026-08-19, back-to-back): the whole delta is the attention
BACKWARD (packed 5.65 vs unpacked 4.87 ms/layer-grad; x16 = +12.5 ms = the
step delta; the packed forward is FREE at 3.02 vs 3.00) — and it is real
work, not overhead: 93%-fill packed rows carry 1.44x the valid seconds of
the 64%-fill unpacked batch whose prefix-skipping kernels skip a third of
their blocks. Per valid second packed is ~19% cheaper. Retunes measured
dead (bwd d_block >=256 OOMs scoped vmem; streaming dq/dkv at 2048 loses);
the select-form bias (bool mask after exp, not an f32 slab) shipped from
this attribution — bit-identical grads, 6.36 vs 6.44 ms same-process.
Full story: ROADMAP.md "Packed-train step overhead".

Usage: python tools/bench_packed_parts.py [--sweep] [--chain N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, T = 6, 2048
# corpus-quantile FFD fill for the packed row layout (same recipe as
# tools/bench_packed_train.py — the videos-per-row mix decides how much
# block-diagonal structure the seg kernels must honor)
CORPUS_QUANTILES = [
    112, 268, 365, 447, 498, 534, 594, 633, 687, 750, 813, 890, 950, 1033,
    1156, 1245, 1406, 1523, 1676, 1800, 1800, 1800, 1800, 1800, 1800, 1800,
    1800, 1800, 1800, 1800, 1800, 1800,
]


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
    ap.add_argument("--sweep", action="store_true",
                    help="block sweeps on the attn-grad microbench")
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()
    n_chain = args.chain

    import jax
    import jax.numpy as jnp

    from repurpose_tpu.config import ModelConfig, TrainConfig
    from repurpose_tpu.data.batching import Batch, pack_batch, plan_packing
    from repurpose_tpu.models import build_model
    from repurpose_tpu.ops.flash_attention import mha_pallas
    from repurpose_tpu.train.state import create_train_state
    from repurpose_tpu.train.step import _loss_fn, make_train_step
    from repurpose_tpu.utils.platform import (
        enable_compilation_cache, honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

    cfg = ModelConfig()
    rng = np.random.default_rng(0)

    # ---- one packed batch (corpus FFD) + one unpacked batch, same shapes ----
    pool = list(CORPUS_QUANTILES)
    np.random.default_rng(42).shuffle(pool)
    pdurs: list = []
    for d in pool * 4:
        cand = pdurs + [int(d)]
        if len(plan_packing(cand, T, BATCH)) > 1:
            continue
        pdurs = cand
        if sum(pdurs) >= 0.925 * BATCH * T:
            break
    rows = plan_packing(pdurs, T, BATCH)[0]

    def sample(d):
        return {
            "visual": rng.normal(0, 1, (d, cfg.vis_dim)).astype(np.float32),
            "audio": rng.normal(0, 1, (d, cfg.aud_dim)).astype(np.float32),
            "text": rng.normal(0, 1, (d, cfg.text_dim)).astype(np.float32),
            "duration": d,
            "labels": (rng.uniform(size=(d,)) < 0.3).astype(np.float32),
            "segments": np.abs(rng.normal(0, 10, (d, 2))).astype(np.float32),
        }

    pb = pack_batch([sample(d) for d in pdurs], rows, T, batch_size=BATCH)
    print(
        f"packed layout: {len(pdurs)} videos in {BATCH} rows "
        f"(fill {sum(pdurs)/(BATCH*T):.1%})",
        file=sys.stderr,
    )

    mask = np.zeros((BATCH, T), bool)
    DUR_U = [1800, 1313, 900, 1800, 600, 1500]
    for i, d in enumerate(DUR_U):
        mask[i, :d] = True
    ub = Batch(
        jax.device_put(rng.normal(0, 1, (BATCH, T, cfg.vis_dim)).astype(np.float32)),
        jax.device_put(rng.normal(0, 1, (BATCH, T, cfg.aud_dim)).astype(np.float32)),
        jax.device_put(rng.normal(0, 1, (BATCH, T, cfg.text_dim)).astype(np.float32)),
        jax.device_put(mask),
        jax.device_put((rng.uniform(size=(BATCH, T)) < 0.3).astype(np.float32)),
        jax.device_put(np.abs(rng.normal(0, 10, (BATCH, T, 2))).astype(np.float32)),
        jax.device_put(np.asarray(DUR_U, np.int32)),
    )
    pb = jax.device_put(pb)

    # ---- attention microbench: one layer's mha at model dims, x n_chain ----
    h, dh = cfg.num_heads, cfg.d_model // cfg.num_heads
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    qkv = [
        jax.device_put(rng.normal(0, 1, (BATCH, T, h, dh)).astype(cd))
        for _ in range(3)
    ]
    key_valid = jax.device_put(mask)
    seg = getattr(pb, "seg_ids", None)
    if seg is None:  # field name check — Batch may call it seg/seg_ids
        raise SystemExit(f"Batch fields: {pb._fields}")

    sm = cfg.attn_softmax_dtype  # the model's bf16 softmax interior keeps
    # the packed dense kernel inside the 16M scoped-vmem limit; the f32
    # default OOMs at [6,2048] d_block 256 (measured — see ROADMAP)

    def attn_fwd(seg_ids):
        @jax.jit
        def run(c, q, k, v, kv):
            def body(ci, _):
                o = mha_pallas(q + (ci * 1e-6).astype(q.dtype), k, v, kv,
                               seg_ids=seg_ids, softmax_dtype=sm)
                return jnp.sum(o).astype(jnp.float32), ()
            c2, _ = jax.lax.scan(body, c, None, length=n_chain)
            return c2
        return run

    def attn_grad(seg_ids):
        def one(q, k, v, kv):
            return jnp.sum(
                mha_pallas(q, k, v, kv, seg_ids=seg_ids,
                           softmax_dtype=sm).astype(jnp.float32)
            )
        g = jax.grad(one, argnums=(0, 1, 2))

        @jax.jit
        def run(c, q, k, v, kv):
            def body(ci, _):
                gq, gk, gv = g(q + (ci * 1e-6).astype(q.dtype), k, v, kv)
                s = (jnp.sum(gq) + jnp.sum(gk) + jnp.sum(gv)).astype(jnp.float32)
                return s, ()
            c2, _ = jax.lax.scan(body, c, None, length=n_chain)
            return c2
        return run

    rows_out = {}
    for name, mk in (("attn-fwd", attn_fwd), ("attn-grad", attn_grad)):
        for packed in (False, True):
            seg_ids = seg if packed else None
            kv = pb.mask if packed else key_valid
            ms = timed(mk(seg_ids), jnp.float32(0.0), *qkv, kv,
                       n_chain=n_chain) * 1e3
            rows_out[f"{name}[{'packed' if packed else 'unpacked'}]"] = ms
            print(f"{name:12s} {'packed' if packed else 'unpacked':9s} "
                  f"{ms:7.2f} ms/call (x16 layers = {16*ms:6.1f} ms)",
                  file=sys.stderr)

    # ---- model-level: fwd, grad, full step ----
    model = build_model(cfg)
    key_rbg = jax.random.key(2, impl="rbg")

    def perturb(b, c):
        return b._replace(visual=b.visual + c * 1e-6)

    for packed in (False, True):
        b = pb if packed else ub
        tc = TrainConfig(
            batch_size=BATCH, buckets=(T,),
            pack_sequences=packed,
            loss_norm="batch_size" if packed else "config_batch_size",
        )
        state, tx, sched = create_train_state(cfg, tc, 100, jax.random.key(1))
        tag = "packed" if packed else "unpacked"

        @jax.jit
        def fwd_chain(c, b, tc=tc):
            def body(ci, _):
                loss, _ = _loss_fn(model, tc, state.params, perturb(b, ci),
                                   None, False)
                return ci + loss, ()
            c2, _ = jax.lax.scan(body, c, None, length=n_chain)
            return c2

        ms = timed(fwd_chain, jnp.float32(0.0), b, n_chain=n_chain) * 1e3
        rows_out[f"model-fwd[{tag}]"] = ms
        print(f"model-fwd    {tag:9s} {ms:7.2f} ms", file=sys.stderr)

        import optax

        gfn = jax.grad(
            lambda p, bb, tc=tc: _loss_fn(model, tc, p, bb, key_rbg, True)[0]
        )

        @jax.jit
        def grad_chain(c, b):
            def body(ci, _):
                grads = gfn(state.params, perturb(b, ci))
                return ci + optax.global_norm(grads), ()
            c2, _ = jax.lax.scan(body, c, None, length=n_chain)
            return c2

        ms = timed(grad_chain, jnp.float32(0.0), b, n_chain=n_chain) * 1e3
        rows_out[f"model-grad[{tag}]"] = ms
        print(f"model-grad   {tag:9s} {ms:7.2f} ms", file=sys.stderr)

        step = make_train_step(cfg, tc, tx, sched, donate=False)

        @jax.jit
        def step_chain(st, b):
            def body(s, _):
                s2, m = step(s, b, key_rbg)
                return s2, m["loss"]
            _, losses = jax.lax.scan(body, st, None, length=n_chain)
            return losses[-1]

        ms = timed(step_chain, state, b, n_chain=n_chain) * 1e3
        rows_out[f"full-step[{tag}]"] = ms
        print(f"full-step    {tag:9s} {ms:7.2f} ms", file=sys.stderr)

    print(rows_out)

    if args.sweep:
        import repurpose_tpu.ops.flash_attention as fa

        print("\n-- packed attn-grad block sweep --", file=sys.stderr)
        base = (fa.PACKED_BWD_D_BLOCK, fa.PACKED_Q_BLOCK, fa.PACKED_K_BLOCK)
        for bwd_db in (None, 128, 256, 512):
            for qb in (256, 512):
                fa.PACKED_BWD_D_BLOCK, fa.PACKED_Q_BLOCK = bwd_db, qb
                try:
                    ms = timed(attn_grad(seg), jnp.float32(0.0), *qkv, pb.mask,
                               n_chain=n_chain) * 1e3
                    print(f"bwd_db={str(bwd_db):4s} qb={qb:4d}: {ms:7.2f} ms",
                          file=sys.stderr)
                except Exception as e:
                    print(f"bwd_db={str(bwd_db):4s} qb={qb:4d}: FAILED "
                          f"({str(e)[:90]})", file=sys.stderr)
        fa.PACKED_BWD_D_BLOCK, fa.PACKED_Q_BLOCK, fa.PACKED_K_BLOCK = base


if __name__ == "__main__":
    main()
