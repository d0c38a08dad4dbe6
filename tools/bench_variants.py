#!/usr/bin/env python
"""Back-to-back variant measurements on the real chip (chained-scan method of
bench.py, so numbers measure the chip, not the tunnel). One process, one
JSON line at the end. Variants:

- forward @2048/b8: pallas q_block 256/512, xla attention, int8 quantize
- train step @2048/b6: backward=xla (recompute) vs backward=pallas (fused
  two-kernel), and remat
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

BUCKET = 2048
BATCH = 8
TRAIN_BATCH = 6
N = 20
N_TRAIN = 10
DURATIONS = [1800, 1313, 900, 1800, 600, 1500, 1100, 1750]


def _sync(out):
    np.asarray(jax.tree.leaves(out)[0])


def _time(fn, *args, reps: int = 3) -> float:
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from repurpose_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax.numpy as jnp

    from repurpose_tpu.config import ModelConfig, TrainConfig
    from repurpose_tpu.models import build_model, init_model_params

    rng = np.random.default_rng(0)
    base = ModelConfig()
    params = init_model_params(build_model(base), base, jax.random.key(0))

    mask = np.zeros((BATCH, BUCKET), bool)
    durs = (DURATIONS * 2)[:BATCH]
    for i, d in enumerate(durs):
        mask[i, :d] = True
    args = tuple(
        jax.device_put(x)
        for x in (
            rng.normal(0, 1, (BATCH, BUCKET, base.vis_dim)).astype(np.float32),
            rng.normal(0, 1, (BATCH, BUCKET, base.aud_dim)).astype(np.float32),
            rng.normal(0, 1, (BATCH, BUCKET, base.text_dim)).astype(np.float32),
            mask,
        )
    )

    def fwd_chain(cfg):
        model = build_model(cfg)

        @jax.jit
        def run(v, a, t, m):
            def body(carry, _):
                out = model.apply({"params": params}, v + carry * 1e-6, a, t, m, True)
                return out.cls_logits[0, 0, 0].astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
            return c

        return run

    results = {}
    for name, cfg in [
        ("fwd_pallas_qb256", base),
        ("fwd_pallas_qb512", base),  # q_block override below
        ("fwd_xla", dataclasses.replace(base, attention_impl="xla")),
        ("fwd_int8", dataclasses.replace(base, quantize="int8")),
    ]:
        if name == "fwd_pallas_qb512":
            import repurpose_tpu.ops.flash_attention as fa

            fa.DEFAULT_Q_BLOCK = 512
        t = _time(fwd_chain(cfg), *args) / N
        if name == "fwd_pallas_qb512":
            import repurpose_tpu.ops.flash_attention as fa

            fa.DEFAULT_Q_BLOCK = 256
        results[name] = round(t * 1e3, 2)
        print(f"{name}: {t*1e3:.2f} ms/batch", file=sys.stderr)

    # train variants
    from repurpose_tpu.data.batching import Batch
    from repurpose_tpu.train.state import create_train_state
    from repurpose_tpu.train.step import make_train_step

    tmask = np.zeros((TRAIN_BATCH, BUCKET), bool)
    tdurs = DURATIONS[:TRAIN_BATCH]
    for i, d in enumerate(tdurs):
        tmask[i, :d] = True
    batch = Batch(
        jax.device_put(rng.normal(0, 1, (TRAIN_BATCH, BUCKET, base.vis_dim)).astype(np.float32)),
        jax.device_put(rng.normal(0, 1, (TRAIN_BATCH, BUCKET, base.aud_dim)).astype(np.float32)),
        jax.device_put(rng.normal(0, 1, (TRAIN_BATCH, BUCKET, base.text_dim)).astype(np.float32)),
        jax.device_put(tmask),
        jax.device_put((rng.uniform(size=(TRAIN_BATCH, BUCKET)) < 0.3).astype(np.float32)),
        jax.device_put(np.abs(rng.normal(0, 10, (TRAIN_BATCH, BUCKET, 2))).astype(np.float32)),
        jax.device_put(np.asarray(tdurs, np.int32)),
    )
    tc = TrainConfig(batch_size=TRAIN_BATCH, buckets=(BUCKET,))

    def train_chain(cfg):
        state, tx, sched = create_train_state(cfg, tc, 100, jax.random.key(1))
        step = make_train_step(cfg, tc, tx, sched, donate=False)

        @jax.jit
        def run(state, batch):
            def body(st, _):
                st, m = step(st, batch, jax.random.key(2))
                return st, m["loss"]
            _, losses = jax.lax.scan(body, state, None, length=N_TRAIN)
            return losses[-1]

        return lambda: _time(run, state, batch) / N_TRAIN

    for name, cfg in [
        ("train_bwd_xla", base),  # auto => pallas fwd + xla recompute bwd
        ("train_bwd_pallas", dataclasses.replace(base, attention_impl="pallas_full")),
        ("train_bwd_pallas_remat",
         dataclasses.replace(base, attention_impl="pallas_full", remat=True)),
    ]:
        t = train_chain(cfg)()
        results[name] = round(t * 1e3, 2)
        print(f"{name}: {t*1e3:.2f} ms/step", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
