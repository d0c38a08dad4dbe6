#!/usr/bin/env python
"""Eval-loop throughput: synchronous per-batch score_batch (the round-2
Trainer.evaluate staging) vs the streamed score_stream path it now uses.

On this box every synchronous dispatch pays the tunnel's RPC floor; the
streamed path keeps `depth` batches in flight so host staging overlaps device
compute. Both loops run the SAME pipeline instance (same compiled program) in
one process, back-to-back.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._bench_common import log, sync as _sync, time_best  # noqa: E402


def _time(fn, *args, reps=3):
    return time_best(fn, *args, reps=reps)

import numpy as np


def main() -> None:
    from repurpose_tpu.utils.platform import (
        enable_compilation_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()
    import jax

    from repurpose_tpu.config import ModelConfig, TestConfig
    from repurpose_tpu.data.batching import collate
    from repurpose_tpu.data.synthetic import SyntheticDataset
    from repurpose_tpu.infer import InferencePipeline
    from repurpose_tpu.models.mmct import MMCT

    cfg = ModelConfig(dropout=0.0, attn_softmax_dtype="bfloat16")
    model = MMCT(cfg)
    params = model.init_params(jax.random.key(0), bucket=64)
    pipe = InferencePipeline(cfg, params, TestConfig())

    n_videos, bs, buckets = 64, 8, (2048,)
    rng = np.random.default_rng(0)
    ds = SyntheticDataset(rng.integers(900, 2048, n_videos).tolist(), cfg, seed=3)

    def batches():
        for i0 in range(0, n_videos, bs):
            samples = [ds[i] for i in range(i0, min(i0 + bs, n_videos))]
            b = collate(samples, buckets, bs)
            yield (b.visual, b.audio, b.text, b.mask, b.durations,
                   [s["video_id"] for s in samples])

    # warm both paths (compile once; dataset reads cache in SyntheticDataset?
    # no — regenerated per access, which is exactly the host-staging work the
    # stream overlaps)
    for _ in pipe.score_stream(batches()):
        pass

    t0 = time.perf_counter()
    n = 0
    for item in batches():
        res = pipe.score_batch(*item[:5], item[5])
        n += len(res)
    sync_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    n2 = 0
    for res in pipe.score_stream(batches()):
        n2 += len(res)
    stream_s = time.perf_counter() - t0

    print(
        f"synchronous: {sync_s:.2f} s ({n_videos/sync_s:.1f} videos/s) | "
        f"streamed: {stream_s:.2f} s ({n_videos/stream_s:.1f} videos/s) | "
        f"speedup {sync_s/stream_s:.2f}x"
    )


if __name__ == "__main__":
    main()
