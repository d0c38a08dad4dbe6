#!/usr/bin/env python
"""Packed vs unpacked TRAIN-step throughput at bucket 2048 (TPU), plus the
packed-backward d_block sweep (flash_attention.PACKED_BWD_D_BLOCK).

Same measurement discipline as bench.py: N_CHAIN serially-dependent train
steps inside one compiled program (lax.scan carries the TrainState),
best-of-3, back-to-back in one process.

Unpacked: the reference per-GPU batch (6 rows, configs/Repurpose.yaml:40)
with the bench duration mix (~66% fill). Packed: corpus-quantile durations
FFD-packed into 6 rows at the split-achievable ~93% fill
(TrainConfig.pack_sequences; loss/grad equality vs unpacked proven in
tests/test_packing.py) — one step covers ~2x the videos, so videos/s is the
number to compare.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHAIN = 10
BUCKET = 2048
BATCH = 6
DURATIONS = [1800, 1313, 900, 1800, 600, 1500]
CORPUS_QUANTILES = [
    112, 268, 365, 447, 498, 534, 594, 633, 687, 750, 813, 890, 950, 1033,
    1156, 1245, 1406, 1523, 1676, 1800, 1800, 1800, 1800, 1800, 1800, 1800,
    1800, 1800, 1800, 1800, 1800, 1800,
]


def _time(fn, *args, reps=3):
    import jax

    def sync(out):
        np.asarray(jax.tree.leaves(out)[0])

    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax

    from repurpose_tpu.config import ModelConfig, TrainConfig
    from repurpose_tpu.data.batching import Batch, pack_batch, plan_packing
    from repurpose_tpu.train.state import create_train_state
    from repurpose_tpu.train.step import make_train_step
    from repurpose_tpu.utils.platform import (
        enable_compilation_cache, honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()

    cfg = ModelConfig()
    rng = np.random.default_rng(0)

    def sample(d, targets=True):
        s = {
            "visual": rng.normal(0, 1, (d, cfg.vis_dim)).astype(np.float32),
            "audio": rng.normal(0, 1, (d, cfg.aud_dim)).astype(np.float32),
            "text": rng.normal(0, 1, (d, cfg.text_dim)).astype(np.float32),
            "duration": d,
        }
        if targets:
            s["labels"] = (rng.uniform(size=(d,)) < 0.3).astype(np.float32)
            s["segments"] = np.abs(rng.normal(0, 10, (d, 2))).astype(np.float32)
        return s

    def chain(tc, batch):
        state, tx, sched = create_train_state(cfg, tc, 100, jax.random.key(1))
        step = make_train_step(cfg, tc, tx, sched, donate=False)
        key = jax.random.key(2, impl="rbg" if tc.rng_impl == "rbg" else None)

        @jax.jit
        def run(state, batch):
            def body(st, _):
                st, metrics = step(st, batch, key)
                return st, metrics["loss"]
            _, losses = jax.lax.scan(body, state, None, length=N_CHAIN)
            return losses[-1]

        return run, (state, jax.device_put(batch))

    # ---- unpacked (bench.py train row shape) ----
    mask = np.zeros((BATCH, BUCKET), bool)
    for i, d in enumerate(DURATIONS):
        mask[i, :d] = True
    ub = Batch(
        rng.normal(0, 1, (BATCH, BUCKET, cfg.vis_dim)).astype(np.float32),
        rng.normal(0, 1, (BATCH, BUCKET, cfg.aud_dim)).astype(np.float32),
        rng.normal(0, 1, (BATCH, BUCKET, cfg.text_dim)).astype(np.float32),
        mask,
        (rng.uniform(size=(BATCH, BUCKET)) < 0.3).astype(np.float32),
        np.abs(rng.normal(0, 10, (BATCH, BUCKET, 2))).astype(np.float32),
        np.asarray(DURATIONS, np.int32),
    )
    tc_u = TrainConfig(batch_size=BATCH, buckets=(BUCKET,))
    run, args = chain(tc_u, ub)
    un_s = _time(run, *args) / N_CHAIN
    print(
        f"unpacked: {un_s*1e3:.1f} ms/step (batch {BATCH}) -> "
        f"{BATCH/un_s:.1f} videos/s",
        file=sys.stderr,
    )

    # ---- packed, sweeping the backward d_block ----
    pool = list(CORPUS_QUANTILES)
    np.random.default_rng(42).shuffle(pool)
    pdurs: list[int] = []
    for d in pool * 4:
        cand = pdurs + [int(d)]
        if len(plan_packing(cand, BUCKET, BATCH)) > 1:
            continue
        pdurs = cand
        if sum(pdurs) >= 0.925 * BATCH * BUCKET:
            break
    rows = plan_packing(pdurs, BUCKET, BATCH)[0]
    print(
        f"packed: {len(pdurs)} videos in {len(rows)} rows "
        f"(fill {sum(pdurs)/(BATCH*BUCKET):.1%})",
        file=sys.stderr,
    )
    pb = pack_batch([sample(d) for d in pdurs], rows, BUCKET, batch_size=BATCH)
    tc_p = TrainConfig(
        batch_size=BATCH, buckets=(BUCKET,),
        loss_norm="batch_size", pack_sequences=True,
    )

    import repurpose_tpu.ops.flash_attention as fa

    for bwd_db in (None, 256):
        fa.PACKED_BWD_D_BLOCK = bwd_db
        try:
            run, args = chain(tc_p, pb)
            pk_s = _time(run, *args) / N_CHAIN
        except Exception as e:  # scoped-vmem OOM at compile: record, move on
            print(f"packed[bwd_db={bwd_db}]: FAILED ({str(e)[:120]})",
                  file=sys.stderr)
            continue
        print(
            f"packed[bwd_db={bwd_db}]: {pk_s*1e3:.1f} ms/step "
            f"({len(pdurs)} videos) -> {len(pdurs)/pk_s:.1f} videos/s "
            f"({(len(pdurs)/pk_s)/(BATCH/un_s):.2f}x unpacked)",
            file=sys.stderr,
        )
    fa.PACKED_BWD_D_BLOCK = None


if __name__ == "__main__":
    main()
