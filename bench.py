#!/usr/bin/env python
"""Benchmark: videos scored per second per chip (the north-star throughput
metric, BASELINE.md).

Measures the full on-device inference pipeline — flagship MMCT forward
(bf16, 16 layers, Pallas flash attention) + decode + Soft-NMS — on synthetic
batches at the T=2048 bucket with a realistic duration mix (Repurpose-10K
mean video is ~1218 s, max 1800 s; SURVEY.md §6). Inputs are staged on device
outside the timed loop: in production input staging overlaps compute, and in
this harness host->device goes through a network tunnel that would otherwise
dominate the measurement.

Baseline ("vs_baseline"): the reference repo publishes NO numbers
(BASELINE.md), so the denominator is an analytic estimate of the as-shipped
PyTorch pipeline on one A100: inference.py:31 runs batch_size=1 with a ~300
GFLOP fp32/TF32 forward (~15 ms at a generous 20 TFLOP/s achieved), plus
per-video CPU Soft-NMS + Python decode overhead (~25 ms measured on the
reference's own code paths) => ~25 videos/s/GPU. Revisit when the A100
reference can be measured directly.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; a breakdown
goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

A100_REFERENCE_VIDEOS_PER_S = 25.0  # documented estimate, see module docstring

BUCKET = 2048
BATCH = 8
DURATIONS = [1800, 1313, 900, 1800, 600, 1500, 1100, 1750]  # ~p50/p90 mix


def _bench(fn, args, n_iters: int = 10) -> float:
    import numpy as _np

    def sync(out):
        # Fetch one small leaf instead of block_until_ready: through a
        # remote-device tunnel, block alone has been observed to return
        # before the remote step completes; a data fetch cannot. Device
        # execution is stream-ordered, so fetching the LAST output forces
        # every dispatched iteration, amortizing the one RPC round trip.
        _np.asarray(jax.tree.leaves(out)[0])

    sync(fn(*args))  # compile + warm cache
    t0 = time.perf_counter()
    out = None
    for _ in range(n_iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n_iters


def main() -> None:
    from repurpose_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax.numpy as jnp

    from repurpose_tpu.config import ModelConfig, TestConfig
    from repurpose_tpu.models.mmct import MMCT
    from repurpose_tpu.ops.decode import decode_batch

    cfg = ModelConfig()  # flagship dims, bf16, attention auto (pallas on TPU)
    test_cfg = TestConfig()
    model = MMCT(cfg)
    params = model.init_params(jax.random.key(0), bucket=64)

    rng = np.random.default_rng(0)
    b, t = BATCH, BUCKET
    mask = np.zeros((b, t), bool)
    durations = (DURATIONS * ((b + len(DURATIONS) - 1) // len(DURATIONS)))[:b]
    for i, d in enumerate(durations):
        mask[i, :d] = True
    args = (
        jax.device_put(rng.normal(0, 1, (b, t, cfg.vis_dim)).astype(np.float32)),
        jax.device_put(rng.normal(0, 1, (b, t, cfg.aud_dim)).astype(np.float32)),
        jax.device_put(rng.normal(0, 1, (b, t, cfg.text_dim)).astype(np.float32)),
        jax.device_put(mask),
        jax.device_put(np.asarray(durations, np.int32)),
    )

    @jax.jit
    def forward(visual, audio, text, m, durs):
        return model.apply({"params": params}, visual, audio, text, m, True)

    @jax.jit
    def full(visual, audio, text, m, durs):
        out = model.apply({"params": params}, visual, audio, text, m, True)
        return decode_batch(out.cls_logits[..., 0], out.offsets, m, durs, test_cfg)

    fwd_s = _bench(forward, args)
    full_s = _bench(full, args)
    print(
        f"forward: {fwd_s*1e3:.1f} ms/batch | forward+decode+nms: "
        f"{full_s*1e3:.1f} ms/batch (batch {b}, bucket {t})",
        file=sys.stderr,
    )

    n_chips = jax.device_count()
    value = b / full_s / n_chips
    print(
        json.dumps(
            {
                "metric": "videos_scored_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "videos/s/chip",
                "vs_baseline": round(value / A100_REFERENCE_VIDEOS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
