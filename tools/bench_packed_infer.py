#!/usr/bin/env python
"""Packed vs unpacked inference throughput at the headline bucket (TPU).

Same measurement discipline as bench.py: N_CHAIN serially-dependent
forward+decode iterations inside one compiled program (carry threaded into
the visual input at its own dtype), best-of-3, back-to-back in one process.

Unpacked: batch 8 x bucket 2048 with the bench DURATIONS mix (~66% fill; the
prefix-skipping kernels already skip padded query blocks). Packed: the same
duration mix cycled until FFD fills 8 rows of 2048 (~99% fill), scoring
~12 videos per batch through the block-diagonal kernels + device unpack +
decode. The win is the padding share of projection/FFN/head compute.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHAIN = 20
BUCKET = 2048
BATCH = 8
DURATIONS = [1800, 1313, 900, 1800, 600, 1500, 1100, 1750]
# 32 evenly-spaced duration quantiles of the reference val split
# (/root/reference/data/val.json timeRange spans; p50=1313, mean 1218,
# 40% at the 1800 s cap) — the corpus-representative pool the packer draws
# from, shuffled-deterministic, until BATCH rows of BUCKET are full.
CORPUS_QUANTILES = [
    112, 268, 365, 447, 498, 534, 594, 633, 687, 750, 813, 890, 950, 1033,
    1156, 1245, 1406, 1523, 1676, 1800, 1800, 1800, 1800, 1800, 1800, 1800,
    1800, 1800, 1800, 1800, 1800, 1800,
]


def _sync(out):
    import jax

    np.asarray(jax.tree.leaves(out)[0])


def _time(fn, *args, reps=3):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from repurpose_tpu.config import ModelConfig, TestConfig
    from repurpose_tpu.data.batching import pack_batch, packing_layout, plan_packing
    from repurpose_tpu.models.mmct import MMCT
    from repurpose_tpu.ops.decode import decode_batch, decode_packed
    from repurpose_tpu.utils.platform import (
        enable_compilation_cache, honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()

    cfg = ModelConfig()
    test_cfg = TestConfig()
    model = MMCT(cfg)
    params = model.init_params(jax.random.key(0), bucket=64)
    rng = np.random.default_rng(0)

    # ---- unpacked batch (bench.py shape) ----
    durs = [min(d, BUCKET) for d in (DURATIONS * 2)[:BATCH]]
    mask = np.zeros((BATCH, BUCKET), bool)
    for i, d in enumerate(durs):
        mask[i, :d] = True
    vis = rng.normal(0, 1, (BATCH, BUCKET, cfg.vis_dim)).astype(np.float32)
    aud = rng.normal(0, 1, (BATCH, BUCKET, cfg.aud_dim)).astype(np.float32)
    txt = rng.normal(0, 1, (BATCH, BUCKET, cfg.text_dim)).astype(np.float32)

    @jax.jit
    def run_unpacked(vis, aud, txt, m, durations):
        def body(carry, _):
            out = model.apply(
                {"params": params}, vis + carry * 1e-6, aud, txt, m, True
            )
            res = decode_batch(
                out.cls_logits[..., 0], out.offsets, m, durations, test_cfg
            )
            return res.scores[0, 0].astype(jnp.float32), ()
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_CHAIN)
        return carry

    # ---- packed batch: draw corpus-quantile durations until BATCH rows fill
    pool = list(CORPUS_QUANTILES)
    np.random.default_rng(42).shuffle(pool)
    pdurs: list[int] = []
    for d in pool * 4:
        cand = pdurs + [int(d)]
        if len(plan_packing(cand, BUCKET, BATCH)) > 1:
            continue  # doesn't fit this batch; try a different duration
        pdurs = cand
        # stop at the split-wide FFD fill (92.5% over all of val.json) —
        # filling further would flatter packing beyond what production sees
        if sum(pdurs) >= 0.925 * BATCH * BUCKET:
            break
    rows = plan_packing(pdurs, BUCKET, BATCH)[0]
    fill = sum(pdurs) / (BATCH * BUCKET)
    n_videos = len(pdurs)
    print(
        f"packed: {n_videos} videos in {len(rows)} rows (fill {fill:.1%})",
        file=sys.stderr,
    )
    samples = [
        {
            "visual": rng.normal(0, 1, (d, cfg.vis_dim)).astype(np.float32),
            "audio": rng.normal(0, 1, (d, cfg.aud_dim)).astype(np.float32),
            "text": rng.normal(0, 1, (d, cfg.text_dim)).astype(np.float32),
            "duration": d,
        }
        for d in pdurs
    ]
    batch = pack_batch(samples, rows, BUCKET, batch_size=BATCH)
    _, row_of, start, length = packing_layout(rows, pdurs, BUCKET)
    cap = -(-n_videos // 8) * 8
    pad = cap - n_videos
    row_of = np.pad(row_of, (0, pad))
    start = np.pad(start, (0, pad))
    length = np.pad(length, (0, pad))

    def make_run_packed():
        @jax.jit
        def run_packed(vis, aud, txt, m, seg, posn, row_of, start, length):
            def body(carry, _):
                out = model.apply(
                    {"params": params}, vis + carry * 1e-6, aud, txt, m, True,
                    seg_ids=seg, positions=posn,
                )
                res = decode_packed(
                    out.cls_logits[..., 0], out.offsets, row_of, start, length,
                    test_cfg,
                )
                return res.scores[0, 0].astype(jnp.float32), ()
            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_CHAIN)
            return carry
        return run_packed

    un_args = tuple(
        jax.device_put(a)
        for a in (vis, aud, txt, mask, np.asarray(durs, np.int32))
    )
    pk_args = tuple(
        jax.device_put(a)
        for a in (
            batch.visual, batch.audio, batch.text, batch.mask,
            batch.seg_ids, batch.positions, row_of, start, length,
        )
    )

    import repurpose_tpu.ops.flash_attention as fa

    un_s = _time(run_unpacked, *un_args) / N_CHAIN
    print(
        f"unpacked: {un_s*1e3:.2f} ms/batch-{BATCH} -> {BATCH/un_s:.1f} videos/s",
        file=sys.stderr,
    )
    # packed interior sweep over the CALL-TIME knobs (PACKED_D_BLOCK /
    # PACKED_Q_BLOCK / PACKED_STREAM_T): dense [Tq, T] slab at several
    # (d_block, q_block) tilings — the seg bias is rebuilt once per d-block
    # program, so fewer/larger d blocks amortize it over more heads — vs the
    # bounded k sweep. NOTE an earlier sweep patched fa.DEFAULT_Q_BLOCK,
    # which is bound into mha_pallas' signature at def time and was inert;
    # these knobs are read inside _flash_forward at call time.
    db0, qb0 = fa.PACKED_D_BLOCK, fa.PACKED_Q_BLOCK
    for name, stream_t, k_block, d_block, q_block in (
        ("dense-db128-qb512", None, 512, 128, 512),
        ("dense-db128-qb256", None, 512, 128, 256),
        ("dense-db256-qb512", None, 512, 256, 512),
        ("dense-db256-qb256", None, 512, 256, 256),
        ("dense-db256-qb128", None, 512, 256, 128),
        ("stream-kb512", 128, 512, 256, 512),
    ):
        fa.PACKED_STREAM_T = stream_t
        fa.PACKED_K_BLOCK = k_block
        fa.PACKED_D_BLOCK = d_block
        fa.PACKED_Q_BLOCK = q_block
        try:
            pk_s = _time(make_run_packed(), *pk_args) / N_CHAIN
        except Exception as e:  # scoped-vmem OOM at compile: record, move on
            print(f"packed[{name}]: FAILED ({str(e)[:120]})", file=sys.stderr)
            continue
        print(
            f"packed[{name}]: {pk_s*1e3:.2f} ms/batch-{n_videos} -> "
            f"{n_videos/pk_s:.1f} videos/s ({(n_videos/pk_s)/(BATCH/un_s):.2f}x)",
            file=sys.stderr,
        )
    fa.PACKED_D_BLOCK, fa.PACKED_Q_BLOCK = db0, qb0
    fa.PACKED_STREAM_T = None
    fa.PACKED_K_BLOCK = 512


if __name__ == "__main__":
    main()
