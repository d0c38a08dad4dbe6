#!/usr/bin/env python
"""Long-T train steps on the real chip (streaming kernels + remat):
T=4096 B=3, T=8192 B=1+remat — the capability rows for BENCH/docs."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._bench_common import log, sync as _sync, time_best  # noqa: E402


def _time(fn, *args, reps=3):
    return time_best(fn, *args, reps=reps)

import jax
import numpy as np


def main() -> None:
    from repurpose_tpu.utils.platform import (
        enable_compilation_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()
    import dataclasses

    import jax.numpy as jnp

    from repurpose_tpu.config import ModelConfig, TrainConfig
    from repurpose_tpu.data.batching import Batch
    from repurpose_tpu.train.state import create_train_state
    from repurpose_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)
    results = {}

    def train_ms(bsz, tt, n=5, remat=False):
        mcfg = dataclasses.replace(ModelConfig(), remat=remat)
        tc = TrainConfig(batch_size=bsz, buckets=(tt,))
        state, tx, sched = create_train_state(mcfg, tc, 100, jax.random.key(1))
        step = make_train_step(mcfg, tc, tx, sched, donate=False)
        m = np.zeros((bsz, tt), bool)
        for i in range(bsz):
            m[i, : tt - 100 * i] = True
        batch = Batch(
            jax.device_put(rng.normal(0, 1, (bsz, tt, 512)).astype(np.float32)),
            jax.device_put(rng.normal(0, 1, (bsz, tt, 2048)).astype(np.float32)),
            jax.device_put(rng.normal(0, 1, (bsz, tt, 384)).astype(np.float32)),
            jax.device_put(m),
            jax.device_put((rng.uniform(size=(bsz, tt)) < 0.3).astype(np.float32)),
            jax.device_put(np.abs(rng.normal(0, 10, (bsz, tt, 2))).astype(np.float32)),
            jax.device_put(np.asarray([tt - 100 * i for i in range(bsz)], np.int32)),
        )
        key = jax.random.key(2, impl="rbg")

        @jax.jit
        def chain(state, batch):
            def body(st, _):
                st, metrics = step(st, batch, key)
                return st, metrics["loss"]
            _, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]

        return _time(chain, state, batch) / n * 1e3

    for bsz, tt, remat in [(3, 4096, False), (1, 8192, True), (2, 8192, True)]:
        tag = f"train_{tt}_b{bsz}_remat{int(remat)}"
        try:
            ms = train_ms(bsz, tt, remat=remat)
            results[tag + "_ms"] = round(ms, 2)
            print(f"{tag}: {ms:.2f} ms/step", file=sys.stderr, flush=True)
        except Exception as e:
            results[tag + "_error"] = str(e)[:300]
            print(f"{tag} FAILED: {str(e)[:300]}", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
