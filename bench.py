#!/usr/bin/env python
"""Benchmark: videos scored per second per chip (the north-star throughput
metric, BASELINE.md) plus per-bucket inference/train throughput and MFU.

Measurement method (this box reaches its TPU through a network tunnel with a
~30-40 ms per-dispatch RPC floor and ~5x run-to-run noise): every timed
sample chains N_CHAIN iterations INSIDE one compiled program via lax.scan —
one dispatch, one fetch — so the number measures the chip, not the tunnel.
A scalar from each iteration's output feeds the next iteration's input
(carry), which defeats XLA loop-invariant code motion without changing the
work. Stage monotonicity (forward <= forward+decode+NMS) is asserted.

Outage hardening (the round-3 bench was zeroed by an 11+ hour tunnel outage;
VERDICT.md r3 item 1): this script is a PARENT that never imports jax. It
probes the backend in subprocesses with hours-scale exponential backoff,
then runs the measurements in a WORKER subprocess that checkpoints each
section's result to a state file the moment it completes — the packed
headline is measured FIRST. If the worker dies or hangs (per-run timeout),
the parent re-probes and respawns it; completed sections are never
re-measured, and a section that kills the worker twice is skipped with a
recorded error. At the end (or on SIGTERM) the parent prints exactly ONE
JSON line from whatever was captured: full results, partial results
("partial": true), or — if the tunnel never came up — the last committed
numbers marked "stale": true, so the driver's parsed artifact is never null.
Budgets (env-tunable): BENCH_TOTAL_BUDGET_S (default 8 h),
BENCH_PROBE_BUDGET_S (default 4 h per outage), BENCH_WORKER_TIMEOUT_S
(default 1 h per worker run — cold compiles through the remote relay are
minutes each).

Wall-clock governor (round-5; VERDICT r4 item 1 — the r4 run was killed by
the driver's external timeout at 15/17 sections): the worker tracks LIVE
measurement seconds (probe/outage waiting excluded) in the state file and
enforces BENCH_GOVERNOR_S (default 40 min): when the remaining governor
budget drops under BENCH_TIGHT_S (default 10 min) the long-chain sections
shrink n_chain (recorded per row), and a section that no longer fits is
recorded as "budget_skipped" in section_errors instead of dying at signal
15 mid-compile. Sections are ordered so the expensive long-T train rows run
right after the headline group — the cheap small-bucket rows can absorb a
squeeze, a 20-minute compile cannot. The persistent compilation cache
(~/.cache/repurpose_tpu/xla) makes reruns nearly compile-free, so a full
prewarmed pass fits the governor with a wide margin.

Baseline ("vs_baseline"): the reference repo publishes NO numbers
(BASELINE.md). Denominator derivation, per component:
- decode + CPU Soft-NMS: **measured** by running the reference's own code
  (tools/bench_reference_decode.py): 0.76 ms/video mixed-density average on
  this host (round 1 guessed ~25 ms — wrong; superseded).
- forward: analytic, favorable to the reference. inference.py:31 scores
  batch_size=1; a T=1218 s (corpus mean) forward is ~176 GFLOP. As shipped
  (torch 2.0 defaults: TF32 OFF => fp32 CUDA cores, 19.5 TFLOP/s peak on
  A100) at a generous 60% achieved => ~15 ms; batch-1 eager launch overhead
  ~2-3 ms; H2D ~1 ms.
=> ~19 ms/video => ~52 videos/s/A100. Even granting TF32 everywhere
(~6 ms forward => ~10 ms/video => ~100 videos/s) only halves vs_baseline;
both variants are recorded in BASELINE.md. A100_REFERENCE_VIDEOS_PER_S uses
the as-shipped (fp32) figure.

Headline value: PACKED serving throughput at bucket 2048 (sequence packing is
the production serving path — FFD packs several videos per row at the split's
achievable 92.5% fill; per-video results are value-identical to unpacked,
tests/test_packing.py). The unpacked per-bucket rows remain in the JSON under
"buckets" (and "unpacked_videos_per_s") for round-over-round comparison.

Prints ONE JSON line with the headline metric plus per-bucket and train-step
breakdowns; prose goes to stderr.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

A100_REFERENCE_VIDEOS_PER_S = 52.0  # derivation above + BASELINE.md

# (bucket, batch): long-T buckets shrink the batch — the multi-hour-video
# scenario is low-batch, and it bounds bench wall-clock.
BUCKETS = ((256, 8), (512, 8), (1024, 8), (2048, 8), (4096, 8), (8192, 8),
           (16384, 2), (32768, 1))
HEADLINE_BUCKET = 2048
BATCH = 8
TRAIN_BATCH = 6  # the reference's per-GPU batch (configs/Repurpose.yaml:40)
TRAIN_BUCKETS = (1024, 2048)
# Long-T capability rows (streaming flash kernels past T=2048, HBM-resident
# K/V with double-buffered DMA past T=8192; the reference hard-caps at PE
# max_len 5000, models/MMCTransformer.py:11): batch shrinks and remat turns
# on to fit v5e HBM.
LONGT_TRAIN = ((3, 4096, False), (1, 8192, True), (1, 16384, True))
N_CHAIN = 20
N_TRAIN_CHAIN = 10
N_LONGT_CHAIN = 5
DURATIONS = [1800, 1313, 900, 1800, 600, 1500, 1100, 1750]  # ~p50/p90 mix
# 32 evenly-spaced duration quantiles of the reference val split
# (/root/reference/data/val.json timeRange spans; p50=1313, mean 1218, 40% at
# the 1800 s cap) — the pool the sequence packer draws from. Packed serving
# (inference.py --pack; results value-identical to unpacked,
# tests/test_packing.py + ops/decode.py:decode_packed) FFDs videos from this
# pool until the batch reaches the split-wide achievable fill (92.5% over all
# of val.json) instead of the unpacked ~60%; the headline row measures it.
CORPUS_QUANTILES = [
    112, 268, 365, 447, 498, 534, 594, 633, 687, 750, 813, 890, 950, 1033,
    1156, 1245, 1406, 1523, 1676, 1800, 1800, 1800, 1800, 1800, 1800, 1800,
    1800, 1800, 1800, 1800, 1800, 1800,
]
PACKED_FILL_TARGET = 0.925
# Buckets past the corpus cap (1800 s) model LONG videos, not corpus padding:
# durations are these fractions of the bucket, so the rows measure multi-hour
# work (the prefix-skipping kernels would otherwise skip ~80% of a 16k bucket
# filled with 1800 s videos and the row would measure skipping, not compute).
LONGT_FILL = [1.0, 0.8, 0.65, 0.9, 0.7, 1.0, 0.85, 0.75]
LONGT_MIN_T = 4096

# v5e peak: 394 TFLOP/s bf16 (jax-ml.github.io/scaling-book hardware table).
PEAK_FLOPS = {"TPU v5 lite": 394e12, "cpu": 1e12}

# Last driver- or builder-captured live numbers, emitted with "stale": true
# when the tunnel never comes up within the probe budget (VERDICT.md r3 item
# 1c: `parsed` must never be null). Update when a newer live run lands.
LAST_GOOD = {
    "value": 529.0,  # packed @2048: 26.45 ms/batch-14 => 529 videos/s/chip
    "vs_baseline": round(529.0 / A100_REFERENCE_VIDEOS_PER_S, 2),
    "headline_mode": "packed",
    "unpacked_videos_per_s": 342.0,
    "source": (
        "round-3 builder-run measurement on the live chip "
        "(tools/bench_packed_infer.py; BASELINE.md round-3 note). Last "
        "driver-captured artifact: BENCH_r02.json 301 videos/s unpacked."
    ),
}

# ------------------------- budgets (env-tunable) --------------------------

TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 8 * 3600))
PROBE_BUDGET_S = float(os.environ.get("BENCH_PROBE_BUDGET_S", 4 * 3600))
WORKER_TIMEOUT_S = float(os.environ.get("BENCH_WORKER_TIMEOUT_S", 3600))
# Wall-clock governor over LIVE measurement time (worker-side; outage
# waiting excluded). Sized so a cache-warm full pass (~10 min) fits several
# times over, while a cold-compile pass degrades by shrinking chains and
# explicitly budget-skipping instead of being killed by the driver timeout.
GOVERNOR_S = float(os.environ.get("BENCH_GOVERNOR_S", 2400))
TIGHT_S = float(os.environ.get("BENCH_TIGHT_S", 600))


def _flops_forward(cfg, b: int, t: int, durations=None) -> float:
    """EXECUTED dense-matmul FLOPs of one MMCT forward (2*MACs), per batch —
    the numerator of hardware MFU. Projection/FFN/head matmuls run on the
    full padded T (XLA computes padded rows; that waste counts as executed).
    The attention T^2 term counts only the blocks the flash kernels actually
    run: prefix skipping drops query blocks past each row's last valid key
    (kvl), and the streaming interior (t > STREAM_MAX_T) also bounds its key
    sweep at ceil(kvl / k_block). Without ``durations``, assumes full fill."""
    from repurpose_tpu.ops.flash_attention import (
        DEFAULT_Q_BLOCK, STREAM_K_BLOCK, STREAM_MAX_T, _pick_block,
    )

    d, dff, L = cfg.d_model, cfg.d_ff, cfg.self_num_layers
    head = 2 * cfg.concat_dim * d + 2 * d * d + 4 * d * cfg.hidden_dim
    flops = b * t * (L * (8 * d * d + 4 * d * dff) + head)
    qb = _pick_block(t, min(DEFAULT_Q_BLOCK, t)) or t
    kb = (_pick_block(t, STREAM_K_BLOCK) or t) if t > STREAM_MAX_T else t
    for dur in durations if durations is not None else [t] * b:
        kvl = min(dur, t)
        q_rows = -(-kvl // qb) * qb
        k_cols = -(-kvl // kb) * kb if t > STREAM_MAX_T else t
        flops += L * 4 * q_rows * k_cols * d
    return float(flops)


def _sync(out) -> None:
    # Fetch a small leaf instead of block_until_ready: through the remote
    # tunnel, block alone has been observed to return before completion; a
    # data fetch cannot (stream-ordered).
    import jax
    import numpy as np

    np.asarray(jax.tree.leaves(out)[0])


def _time(fn, *args, reps: int = 3) -> float:
    """Best-of-reps wall time of one chained dispatch (compile excluded)."""
    _sync(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# =============================== worker ===================================
# Runs the actual measurements; checkpoints every completed section to the
# state file so a tunnel drop mid-run loses only the in-flight section.


def section_keys() -> list:
    """Every measurement section's state key, in the worker's priority order
    (headline first). Single source of truth: `_Worker.sections()` asserts
    its keys match, and `_emit` sizes its completeness check from it —
    adding a section cannot silently skew the `partial` flag again."""
    keys = ["packed", f"bucket_{HEADLINE_BUCKET}", "stage_delta",
            f"train_{HEADLINE_BUCKET}", "train_packed", "train_accum"]
    # Long-T train rows next: the two rows the r4 driver timeout killed are
    # the most compile-expensive — run them while budget is plentiful; the
    # cheap small-bucket rows below absorb a squeeze gracefully.
    keys += [f"train_{t}" for _, t, _ in LONGT_TRAIN]
    keys += [f"train_{t}" for t in TRAIN_BUCKETS if t != HEADLINE_BUCKET]
    keys += [f"bucket_{t}" for t, _ in BUCKETS if t != HEADLINE_BUCKET]
    return keys


def _atomic_write(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _bench_durations(b: int, t: int) -> list:
    if t >= LONGT_MIN_T:  # long-video rows: fill scales with the bucket
        return [int(f * t) for f in (LONGT_FILL * ((b - 1) // len(LONGT_FILL) + 1))[:b]]
    return [min(d, t) for d in (DURATIONS * ((b - 1) // len(DURATIONS) + 1))[:b]]


def _corpus_durations(bucket: int, batch: int) -> list:
    """Draw corpus-quantile durations until one FFD batch reaches the
    split-wide achievable fill (not the ideal 100%)."""
    import numpy as np

    from repurpose_tpu.data.batching import plan_packing

    pool = list(CORPUS_QUANTILES)
    np.random.default_rng(42).shuffle(pool)
    pdurs: list = []
    for dur in pool * 4:
        cand = pdurs + [int(dur)]
        if len(plan_packing(cand, bucket, batch)) > 1:
            continue  # doesn't fit this batch; try a different duration
        pdurs = cand
        if sum(pdurs) >= PACKED_FILL_TARGET * batch * bucket:
            break
    return pdurs


class _Worker:
    """Measurement sections over a shared model/params context."""

    def __init__(self):
        import jax
        import numpy as np

        from repurpose_tpu.config import ModelConfig, TestConfig
        from repurpose_tpu.models.mmct import MMCT

        self.jax, self.np = jax, np
        self.cfg = ModelConfig()  # flagship dims, bf16, pallas attention
        self.test_cfg = TestConfig()
        self.model = MMCT(self.cfg)
        self.params = self.model.init_params(jax.random.key(0), bucket=64)
        self.rng = np.random.default_rng(0)
        dev_kind = jax.devices()[0].device_kind
        self.peak = next(
            (v for k, v in PEAK_FLOPS.items() if k.lower() in dev_kind.lower()),
            394e12,
        )
        self.n_chips = jax.device_count()
        # governor: remaining live budget (seconds), set by run_worker before
        # each section; None disables shrinking (BENCH_ONLY test runs)
        self.remaining = None

    def _chain(self, n: int) -> int:
        """Shrink a section's chain length when the governor budget is tight
        (the recorded per-row n_chain keeps the reliability judgeable)."""
        if self.remaining is not None and self.remaining < TIGHT_S:
            return max(2, n // 2)
        return n

    def make_args(self, b: int, t: int):
        jax, np, cfg = self.jax, self.np, self.cfg
        mask = np.zeros((b, t), bool)
        durations = _bench_durations(b, t)
        for i, d in enumerate(durations):
            mask[i, :d] = True
        return (
            jax.device_put(self.rng.normal(0, 1, (b, t, cfg.vis_dim)).astype(np.float32)),
            jax.device_put(self.rng.normal(0, 1, (b, t, cfg.aud_dim)).astype(np.float32)),
            jax.device_put(self.rng.normal(0, 1, (b, t, cfg.text_dim)).astype(np.float32)),
            jax.device_put(mask),
            jax.device_put(np.asarray(durations, np.int32)),
        )

    def chained(self, stage: str, n: int):
        """One jitted program running n serially-dependent pipeline iters."""
        import jax.numpy as jnp

        from repurpose_tpu.ops.decode import decode_batch

        jax, model, params = self.jax, self.model, self.params
        test_cfg = self.test_cfg

        @jax.jit
        def run(visual, audio, text, m, durs):
            def body(carry, _):
                out = model.apply(
                    {"params": params}, visual + carry * 1e-6, audio, text, m, True
                )
                if stage == "full":
                    res = decode_batch(
                        out.cls_logits[..., 0], out.offsets, m, durs, test_cfg
                    )
                    nxt = res.scores[0, 0].astype(jnp.float32)
                else:
                    nxt = out.cls_logits[0, 0, 0].astype(jnp.float32)
                return nxt, ()
            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return carry

        return run

    # ---- sections -------------------------------------------------------

    def sec_packed(self, results: dict) -> None:
        """HEADLINE: packed serving at bucket 2048 (inference.py --pack):
        FFD lifts batch fill from ~66% (corpus durations vs bucket) to ~92%,
        so the projection/FFN/head matmuls stop burning padding and the
        block-diagonal packed kernels score more videos per batch. Per-video
        results are value-identical to unpacked (tests/test_packing.py)."""
        import jax.numpy as jnp

        from repurpose_tpu.data.batching import iter_packed_batches
        from repurpose_tpu.ops.decode import decode_packed

        jax, np, cfg = self.jax, self.np, self.cfg
        model, params, test_cfg, rng = self.model, self.params, self.test_cfg, self.rng

        pdurs = _corpus_durations(HEADLINE_BUCKET, BATCH)
        n_videos = len(pdurs)
        fill = sum(pdurs) / (BATCH * HEADLINE_BUCKET)
        samples = [
            {
                "visual": rng.normal(0, 1, (dur, cfg.vis_dim)).astype(np.float32),
                "audio": rng.normal(0, 1, (dur, cfg.aud_dim)).astype(np.float32),
                "text": rng.normal(0, 1, (dur, cfg.text_dim)).astype(np.float32),
                "duration": dur,
            }
            for dur in pdurs
        ]
        (pbatch, (row_of, start, length), _, _), = iter_packed_batches(
            samples.__getitem__, pdurs, (HEADLINE_BUCKET,), BATCH
        )

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

        pk_args = tuple(
            jax.device_put(a)
            for a in (
                pbatch.visual, pbatch.audio, pbatch.text, pbatch.mask,
                pbatch.seg_ids, pbatch.positions, row_of, start, length,
            )
        )
        pk_s = _time(run_packed, *pk_args) / N_CHAIN
        row_fills = [int(d) for d in pbatch.durations]  # per-row fill
        pk_mfu = (
            _flops_forward(cfg, BATCH, HEADLINE_BUCKET, row_fills)
            / pk_s / self.peak
        )
        results["packed"] = {
            "full_ms_per_batch": round(pk_s * 1e3, 2),
            "videos_per_s": round(n_videos / pk_s, 1),
            "n_videos": n_videos,
            "fill": round(fill, 3),
            "mfu": round(pk_mfu, 3),
            "bucket": HEADLINE_BUCKET,
            "n_chain": N_CHAIN,
        }
        print(
            f"packed @ {HEADLINE_BUCKET}: {pk_s*1e3:.2f} ms/batch-{n_videos} "
            f"(fill {fill:.1%}, {n_videos/pk_s:.1f} videos/s, MFU {pk_mfu:.1%})",
            file=sys.stderr,
        )

    def sec_bucket(self, results: dict, t: int, bsz: int) -> None:
        n = self._chain(N_CHAIN if t <= HEADLINE_BUCKET else N_LONGT_CHAIN)
        args = self.make_args(bsz, t)
        full_s = _time(self.chained("full", n), *args) / n
        vids = bsz / full_s
        mfu = (
            _flops_forward(self.cfg, bsz, t, _bench_durations(bsz, t))
            / full_s / self.peak
        )
        results["buckets"][str(t)] = {
            "full_ms_per_batch": round(full_s * 1e3, 2),
            "videos_per_s": round(vids, 1),
            "mfu": round(mfu, 3),
            "batch": bsz,
            # long-T rows chain fewer steps — record it so row reliability
            # is judgeable (timings here fluctuate with chain length)
            "n_chain": n,
        }
        print(
            f"bucket {t}: forward+decode+nms {full_s*1e3:.2f} ms/batch-{bsz} "
            f"({vids:.1f} videos/s, MFU {mfu:.1%})",
            file=sys.stderr,
        )

    def sec_stage_delta(self, results: dict) -> None:
        """Forward-only must not exceed full (forward+decode+NMS)."""
        full = results["buckets"].get(str(HEADLINE_BUCKET))
        assert full is not None, (
            f"prerequisite bucket_{HEADLINE_BUCKET} missing (skipped?) — "
            "stage delta has no full-pipeline baseline to compare against"
        )
        args = self.make_args(BATCH, HEADLINE_BUCKET)
        fwd_s = _time(self.chained("forward", N_CHAIN), *args) / N_CHAIN
        full_s = full["full_ms_per_batch"] / 1e3
        results["forward_ms_per_batch"] = round(fwd_s * 1e3, 2)
        print(
            f"stage delta @ {HEADLINE_BUCKET}: forward {fwd_s*1e3:.2f} ms vs "
            f"full {full_s*1e3:.2f} ms (decode+NMS adds {(full_s-fwd_s)*1e3:.2f} ms)",
            file=sys.stderr,
        )
        assert fwd_s <= full_s * 1.02, (
            f"non-monotone stages: forward {fwd_s*1e3:.2f} ms > full "
            f"{full_s*1e3:.2f} ms — measurement still noise-dominated"
        )

    def _measure_train(self, b: int, t: int, remat: bool, n_chain: int,
                       grad_accum_steps: int = 1,
                       grad_accum_dtype: str = "float32",
                       want_memory: bool = False) -> dict:
        import dataclasses

        from repurpose_tpu.config import TrainConfig
        from repurpose_tpu.data.batching import Batch
        from repurpose_tpu.train.state import create_train_state
        from repurpose_tpu.train.step import make_train_step

        jax, np, rng = self.jax, self.np, self.rng
        mcfg = dataclasses.replace(self.cfg, remat=remat)
        tc = TrainConfig(batch_size=b, buckets=(t,),
                         grad_accum_steps=grad_accum_steps,
                         grad_accum_dtype=grad_accum_dtype)
        state, tx, sched = create_train_state(mcfg, tc, 100, jax.random.key(1))
        step = make_train_step(mcfg, tc, tx, sched, donate=False)
        v, a, x, m, durs = self.make_args(b, t)
        labels = jax.device_put(
            (rng.uniform(size=(b, t)) < 0.3).astype(np.float32)
        )
        segs = jax.device_put(np.abs(rng.normal(0, 10, (b, t, 2))).astype(np.float32))
        batch = Batch(v, a, x, m, labels, segs, durs)

        step_key = jax.random.key(2, impl="rbg" if tc.rng_impl == "rbg" else None)

        @jax.jit
        def train_chain(state, batch):
            def body(st, _):
                st, metrics = step(st, batch, step_key)
                return st, metrics["loss"]
            st, losses = jax.lax.scan(body, state, None, length=n_chain)
            return losses[-1]

        step_s = _time(train_chain, state, batch) / n_chain
        mfu = (
            3 * _flops_forward(mcfg, b, t, _bench_durations(b, t))
            / step_s / self.peak
        )
        out = {
            "step_ms": round(step_s * 1e3, 2),
            "videos_per_s": round(b / step_s, 1),
            "batch": b,
            "remat": remat,
            "mfu": round(mfu, 3),
            "n_chain": n_chain,
        }
        if want_memory:
            # XLA buffer-assignment bytes for ONE step (not the chain):
            # deterministic stand-in for HBM high-water, which the tunnel
            # device does not report (memory_stats() is None on axon).
            ma = (
                jax.jit(step)
                .lower(state, batch, step_key)
                .compile()
                .memory_analysis()
            )
            out["temp_mb"] = round(ma.temp_size_in_bytes / 1e6, 1)
        return out

    def sec_train(self, results: dict, b: int, t: int, remat: bool,
                  n_chain: int) -> None:
        r = self._measure_train(b, t, remat, self._chain(n_chain))
        results["train"][str(t)] = r
        print(
            f"train bucket {t}: {r['step_ms']:.1f} ms/step (batch {b}, "
            f"remat {remat}, MFU {r['mfu']:.1%})",
            file=sys.stderr,
        )

    def sec_train_accum(self, results: dict) -> None:
        """bf16 vs fp32 gradient ACCUMULATORS (TrainConfig.grad_accum_dtype,
        round-4 lever): same step at grad_accum_steps=2, measured
        back-to-back in one process, wall-clock AND compiled memory — XLA's
        buffer-assignment temp bytes stand in for runtime HBM high-water
        (device memory_stats() returns None through the axon tunnel). Both
        deltas measured ~nil round 5 (0.989x speed, 16 MB of 3206 MB temp):
        the lever is closed; fp32 stays the default."""
        b, t = TRAIN_BATCH, HEADLINE_BUCKET
        out = {}
        for dtype in ("float32", "bfloat16"):
            r = self._measure_train(
                b, t, remat=False, n_chain=N_TRAIN_CHAIN,
                grad_accum_steps=2, grad_accum_dtype=dtype,
                want_memory=True,
            )
            out[dtype] = r["step_ms"]
            out[f"{dtype}_temp_mb"] = r["temp_mb"]
            print(
                f"train accum(2, {dtype}) @ {t}: {r['step_ms']:.1f} ms/step, "
                f"compiled temp {r['temp_mb']:.1f} MB",
                file=sys.stderr,
            )
        out["bf16_speedup"] = round(out["float32"] / out["bfloat16"], 3)
        out["bf16_temp_saved_mb"] = round(
            out["float32_temp_mb"] - out["bfloat16_temp_mb"], 1
        )
        results["train_accum"] = out

    def sec_train_packed(self, results: dict) -> None:
        """Packed training (TrainConfig.pack_sequences,
        loss_norm="batch_size" — normalizes by the true video count n_real,
        train/step.py): the same corpus pool packed to ~92% fill — one step
        covers ~2x the videos of the unpacked reference-batch row, so
        videos/s is the number to read."""
        from repurpose_tpu.config import TrainConfig
        from repurpose_tpu.data.batching import iter_packed_batches
        from repurpose_tpu.train.state import create_train_state
        from repurpose_tpu.train.step import make_train_step

        jax, np, cfg, rng = self.jax, self.np, self.cfg, self.rng
        pdurs_t = _corpus_durations(HEADLINE_BUCKET, TRAIN_BATCH)
        tsamples = [
            {
                "visual": rng.normal(0, 1, (dur, cfg.vis_dim)).astype(np.float32),
                "audio": rng.normal(0, 1, (dur, cfg.aud_dim)).astype(np.float32),
                "text": rng.normal(0, 1, (dur, cfg.text_dim)).astype(np.float32),
                "labels": (rng.uniform(size=(dur,)) < 0.3).astype(np.float32),
                "segments": np.abs(rng.normal(0, 10, (dur, 2))).astype(np.float32),
                "duration": dur,
            }
            for dur in pdurs_t
        ]
        (pt_batch, _, _, _), = iter_packed_batches(
            tsamples.__getitem__, pdurs_t, (HEADLINE_BUCKET,), TRAIN_BATCH
        )
        tc_p = TrainConfig(
            batch_size=TRAIN_BATCH, buckets=(HEADLINE_BUCKET,),
            loss_norm="batch_size", pack_sequences=True,
        )
        state_p, tx_p, sched_p = create_train_state(cfg, tc_p, 100, jax.random.key(1))
        step_p = make_train_step(cfg, tc_p, tx_p, sched_p, donate=False)
        step_key = jax.random.key(2, impl="rbg" if tc_p.rng_impl == "rbg" else None)

        @jax.jit
        def train_chain_packed(state, batch):
            def body(st, _):
                st, metrics = step_p(st, batch, step_key)
                return st, metrics["loss"]
            _, losses = jax.lax.scan(body, state, None, length=N_TRAIN_CHAIN)
            return losses[-1]

        pt_s = _time(train_chain_packed, state_p, jax.device_put(pt_batch)) / N_TRAIN_CHAIN
        row_fills_t = [int(d) for d in pt_batch.durations]
        pt_mfu = (
            3 * _flops_forward(cfg, TRAIN_BATCH, HEADLINE_BUCKET, row_fills_t)
            / pt_s / self.peak
        )
        results["train"]["packed_2048"] = {
            "step_ms": round(pt_s * 1e3, 2),
            "videos_per_s": round(len(pdurs_t) / pt_s, 1),
            "n_videos": len(pdurs_t),
            "batch": TRAIN_BATCH,
            "mfu": round(pt_mfu, 3),
            "n_chain": N_TRAIN_CHAIN,
        }
        print(
            f"train packed @ {HEADLINE_BUCKET}: {pt_s*1e3:.1f} ms/step "
            f"({len(pdurs_t)} videos, {len(pdurs_t)/pt_s:.1f} videos/s, "
            f"MFU {pt_mfu:.1%})",
            file=sys.stderr,
        )

    def sections(self):
        """(key, fn) in priority order — the headline lands first so a
        mid-run outage still yields the number that matters."""
        secs = [
            ("packed", self.sec_packed),
            (f"bucket_{HEADLINE_BUCKET}", lambda r: self.sec_bucket(
                r, HEADLINE_BUCKET, dict(BUCKETS)[HEADLINE_BUCKET])),
            ("stage_delta", self.sec_stage_delta),
            (f"train_{HEADLINE_BUCKET}", lambda r: self.sec_train(
                r, TRAIN_BATCH, HEADLINE_BUCKET, False, N_TRAIN_CHAIN)),
            ("train_packed", self.sec_train_packed),
            ("train_accum", self.sec_train_accum),
        ]
        # Order matches section_keys(): long-T train rows (the most
        # compile-expensive; killed by the r4 driver timeout) run right after
        # the headline group, while governor budget is plentiful.
        for b, t, remat in LONGT_TRAIN:
            secs.append((
                f"train_{t}",
                lambda r, b=b, t=t, rm=remat: self.sec_train(
                    r, b, t, rm, N_LONGT_CHAIN),
            ))
        for t in TRAIN_BUCKETS:
            if t != HEADLINE_BUCKET:
                secs.append((f"train_{t}", lambda r, t=t: self.sec_train(
                    r, TRAIN_BATCH, t, False, N_TRAIN_CHAIN)))
        for t, bsz in BUCKETS:
            if t != HEADLINE_BUCKET:
                secs.append((
                    f"bucket_{t}",
                    lambda r, t=t, bsz=bsz: self.sec_bucket(r, t, bsz),
                ))
        assert [k for k, _ in secs] == section_keys()
        return secs


def run_worker(state_path: str) -> int:
    from repurpose_tpu.utils.platform import (
        enable_compilation_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    # many programs compile through the remote relay (minutes each, cold);
    # the persistent cache makes reruns start in seconds (docs/SERVING.md)
    enable_compilation_cache()

    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
    else:
        state = {
            "results": {"buckets": {}, "train": {}, "n_chain": N_CHAIN},
            "done": [], "skip": {}, "in_progress": None,
        }

    w = _Worker()
    state["results"]["n_chips"] = w.n_chips
    results = state["results"]
    only = os.environ.get("BENCH_ONLY")  # comma-separated keys, for testing
    only_keys = set(only.split(",")) if only else None
    for key, fn in w.sections():
        if only_keys is not None and key not in only_keys:
            continue
        if key in state["done"] or key in state["skip"]:
            continue
        # wall-clock governor: live measurement seconds accumulate in the
        # state file across worker respawns (outage waiting happens in the
        # parent and never counts). A section starting past the budget is
        # recorded explicitly instead of dying at the driver's signal 15.
        live_s = float(state.get("live_s", 0.0))
        w.remaining = GOVERNOR_S - live_s if only_keys is None else None
        if w.remaining is not None and w.remaining <= 0:
            state["skip"][key] = (
                f"budget_skipped: governor budget ({GOVERNOR_S:.0f}s live) "
                f"exhausted after {live_s:.0f}s"
            )
            print(f"section {key} budget_skipped ({live_s:.0f}s live)",
                  file=sys.stderr)
            _atomic_write(state_path, state)
            continue
        state["in_progress"] = key
        _atomic_write(state_path, state)
        t0 = time.time()
        try:
            fn(results)
        except Exception as e:
            # a Python-level failure (sanity assert, missing prerequisite,
            # code bug) is a permanent, recordable outcome — don't kill the
            # worker over it; tunnel hangs kill the PROCESS, not raise here
            state["skip"][key] = f"{type(e).__name__}: {e}"
            print(f"section {key} failed permanently: {e}", file=sys.stderr)
        state["in_progress"] = None
        state["live_s"] = live_s + (time.time() - t0)
        if key not in state["skip"]:
            state["done"].append(key)
        _atomic_write(state_path, state)
    return 0


# =============================== parent ===================================


def _probe_backend(deadline: float) -> bool:
    """Probe the TPU tunnel in a SUBPROCESS (a failed init can be memoized
    inside a process) with exponential backoff until ``deadline`` (epoch
    seconds). The round-3 outage lasted 11+ hours against a ~9-minute retry
    budget (VERDICT.md r3) — the budget is now hours-scale."""
    probe = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "np.asarray(jax.jit(lambda a: a.sum())(jnp.ones((8,), jnp.float32)))"
    )
    delay, attempt = 30.0, 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True, timeout=240
            )
            ok, last = r.returncode == 0, r.stderr.decode(errors="replace")
        except subprocess.TimeoutExpired:  # tunnel hangs as well as erroring
            ok, last = False, "probe timed out after 240s"
        if ok:
            return True
        remaining = deadline - time.time()
        if remaining <= 0:
            sys.stderr.write(last[-2000:] + "\n")
            print(
                f"backend probe failed {attempt} times; budget exhausted",
                file=sys.stderr, flush=True,
            )
            return False
        wait = min(delay, remaining, 900.0)
        print(
            f"backend probe {attempt} failed; retrying in {wait:.0f}s "
            f"({remaining/60:.0f} min of budget left)",
            file=sys.stderr, flush=True,
        )
        time.sleep(wait)
        delay = min(delay * 2, 900.0)


def _emit(state: dict | None, note: str | None = None) -> None:
    """Print exactly ONE JSON line from whatever was captured."""
    results = (state or {}).get("results") or {}
    packed = results.get("packed")
    b2048 = (results.get("buckets") or {}).get(str(HEADLINE_BUCKET))
    n_chips = results.get("n_chips", 1)
    line: dict = {
        "metric": "videos_scored_per_sec_per_chip",
        "unit": "videos/s/chip",
    }
    if packed:
        value = packed["videos_per_s"] / n_chips
        line["headline_mode"] = "packed"
    elif b2048:
        value = b2048["videos_per_s"] / n_chips
        line["headline_mode"] = "unpacked"
    else:
        # nothing measured: carry the last committed live numbers, clearly
        # marked, so the driver artifact is parseable even through an outage
        value = LAST_GOOD["value"]
        line["headline_mode"] = LAST_GOOD["headline_mode"]
        line["stale"] = True
        line["stale_source"] = LAST_GOOD["source"]
        results = dict(results)
        results["unpacked_videos_per_s"] = LAST_GOOD["unpacked_videos_per_s"]
    line["value"] = round(value, 2)
    line["vs_baseline"] = round(value / A100_REFERENCE_VIDEOS_PER_S, 2)
    if b2048:
        results = dict(results)
        results["unpacked_videos_per_s"] = b2048["videos_per_s"]
    done, skip = (state or {}).get("done", []), (state or {}).get("skip", {})
    expected = len(section_keys())
    if len(done) < expected or skip:
        line["partial"] = True
        line["sections_done"] = len(done)
        line["sections_expected"] = expected
    if skip:
        line["section_errors"] = skip
    if note:
        line["note"] = note
    line.update(results)
    print(json.dumps(line), flush=True)


def main() -> int:
    deadline = time.time() + TOTAL_BUDGET_S
    state_path = os.path.join(
        tempfile.gettempdir(), f"bench_state_{os.getpid()}.json"
    )
    state: dict = {}
    emitted = {"flag": False}

    def load_state() -> dict:
        try:
            with open(state_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return state

    def emit_once(note=None) -> None:
        if not emitted["flag"]:
            emitted["flag"] = True
            _emit(load_state(), note)

    def on_term(signum, frame):
        # the driver timing us out must still capture a parseable line
        emit_once(f"terminated by signal {signum} mid-run")
        sys.exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    fail_counts: dict = {}
    note = None
    no_progress = 0
    try:
        while True:
            probe_deadline = min(time.time() + PROBE_BUDGET_S, deadline)
            if not _probe_backend(probe_deadline):
                note = "TPU backend unreachable for the whole probe budget"
                break
            timeout = min(WORKER_TIMEOUT_S, max(60.0, deadline - time.time()))
            try:
                r = subprocess.run(
                    [sys.executable, __file__, "--worker", state_path],
                    timeout=timeout,
                )
                rc = r.returncode
            except subprocess.TimeoutExpired:
                print(
                    f"worker exceeded {timeout:.0f}s (tunnel hang?); "
                    "respawning", file=sys.stderr, flush=True,
                )
                rc = -1
            prev_progress = len(state.get("done", [])) + len(state.get("skip", {}))
            state = load_state()
            if rc == 0:
                break
            # a worker that keeps dying before completing ANY new section
            # (e.g. a code bug in setup, not a tunnel outage — the probe just
            # passed) must not spin until the budget runs out
            progress = len(state.get("done", [])) + len(state.get("skip", {}))
            no_progress = no_progress + 1 if progress <= prev_progress else 0
            if no_progress >= 3:
                note = f"worker made no progress over {no_progress} runs (rc={rc})"
                break
            if progress > prev_progress:
                # the chip completed sections since the last death, so earlier
                # per-section deaths were transient (outage mid-compile), not a
                # deterministic section bug — only CONSECUTIVE deaths in the
                # same section accumulate toward a permanent skip
                fail_counts.clear()
            stuck = state.get("in_progress")
            if stuck:
                fail_counts[stuck] = fail_counts.get(stuck, 0) + 1
                if fail_counts[stuck] >= 3:
                    state.setdefault("skip", {})[stuck] = (
                        f"killed the worker {fail_counts[stuck]} times "
                        f"(last rc={rc})"
                    )
                    state["in_progress"] = None
                    _atomic_write(state_path, state)
                    print(
                        f"section {stuck} skipped after repeated worker "
                        "deaths", file=sys.stderr, flush=True,
                    )
            if time.time() >= deadline:
                note = "total bench budget exhausted mid-run"
                break
            print(
                f"worker died (rc={rc}); re-probing backend and resuming "
                f"from {len(state.get('done', []))} completed sections",
                file=sys.stderr, flush=True,
            )
    finally:
        emit_once(note)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        sys.exit(run_worker(sys.argv[2]))
    sys.exit(main())
