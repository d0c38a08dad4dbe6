#!/usr/bin/env python
"""CNN14 extractor part-wise bench: where do the cycles go, and does anything
on ROADMAP's candidate list (batch scaling, stage isolation) move the number?

All timings chained on-device in one process (CLAUDE.md: cross-process TPU
timings on this box are noise). Stages: logmel frontend only, full pipeline,
CNN truncated after each ConvBlock — the per-block deltas localize the cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
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
    from repurpose_tpu.utils.platform import (
        enable_compilation_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()
    import flax.linen as nn
    import jax.numpy as jnp

    from repurpose_tpu.extractors.audio_frontend import logmel
    from repurpose_tpu.extractors.cnn14 import CNN14, CNN14Config, _ConvBlock, _Affine

    results = {}
    rng = np.random.default_rng(0)
    cnn = CNN14()
    waves512 = jnp.asarray(rng.normal(0, 0.1, (512, 22050)).astype(np.float32))
    params = cnn.init(jax.random.key(0), logmel(waves512[:2]))["params"]
    N = 10

    def chain(fn):
        @jax.jit
        def run(w):
            def body(c, _):
                out = fn(w + c * 1e-9)
                return out.ravel()[0].astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        return run

    for b in (256, 512, 1024):
        waves = jnp.asarray(rng.normal(0, 0.1, (b, 22050)).astype(np.float32))
        dt = _time(chain(lambda w: cnn.apply({"params": params}, logmel(w))), waves) / N
        results[f"full_b{b}_audio_s_per_s"] = round(b / dt)
        log(f"full pipeline b={b}: {b/dt:,.0f} audio-s/s ({dt*1e3:.1f} ms)")

    waves = waves512
    dt = _time(chain(lambda w: logmel(w)), waves) / N
    results["logmel_b512_ms"] = round(dt * 1e3, 2)
    log(f"logmel only b=512: {dt*1e3:.2f} ms")

    # truncated CNN: mel -> first k blocks only (stage deltas localize cost)
    class Trunc(nn.Module):
        k: int

        @nn.compact
        def __call__(self, mel):
            cfg = CNN14Config()
            x = _Affine(cfg.n_mels, name="bn0")(mel.astype(jnp.bfloat16))
            x = x[..., None]
            for i, ch in enumerate(cfg.channels[: self.k]):
                pool = (2, 2) if i < len(cfg.channels) - 1 else (1, 1)
                x = _ConvBlock(ch, pool, name=f"block{i + 1}")(x)
            return x

    mel = logmel(waves)
    prev = results["logmel_b512_ms"]
    for k in range(1, 7):
        sub = {kk: v for kk, v in params.items() if kk == "bn0" or kk.startswith("block")}
        fn = lambda w, k=k: Trunc(k).apply({"params": sub}, logmel(w))
        dt = _time(chain(fn), waves) / N * 1e3
        results[f"through_block{k}_ms"] = round(dt, 2)
        log(f"logmel+blocks1..{k}: {dt:.2f} ms (+{dt - prev:.2f})")
        prev = dt

    print(json.dumps(results))


if __name__ == "__main__":
    main()
