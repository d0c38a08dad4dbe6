#!/usr/bin/env python
"""CNN14 extractor part-wise bench: where do the cycles go?

NOTE on method: a lax.scan chain around the 12-conv network never finished
compiling through this box's remote-compile relay (broken pipe after ~35 min
— measured failure, see ROADMAP). So unlike the attention benches, these are
single-dispatch timings (best of 5, fetch-synced): each includes the tunnel's
~30-40 ms RPC floor, which is why the large-batch rows are the meaningful
ones (device time >> floor) and all comparisons stay within this process.

Stages: logmel frontend only, full pipeline at several batches, CNN truncated
after each ConvBlock at b=512 — per-block deltas localize the cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._bench_common import log, sync as _sync, time_best  # noqa: E402


def _time(fn, *args, reps=5):
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
    import flax.linen as nn
    import jax.numpy as jnp

    from repurpose_tpu.extractors.audio_frontend import logmel
    from repurpose_tpu.extractors.cnn14 import CNN14, CNN14Config, _Affine, _ConvBlock

    results = {}
    rng = np.random.default_rng(0)
    cnn = CNN14()
    waves512 = jnp.asarray(rng.normal(0, 0.1, (512, 22050)).astype(np.float32))
    params = cnn.init(jax.random.key(0), logmel(waves512[:2]))["params"]

    # params as ARGUMENTS: closed-over they bake into the HLO as constants,
    # ballooning the remote-compile request past the relay limit (HTTP 413,
    # measured)
    # scalar-reduce INSIDE jit: fetching real outputs over this box's TPU
    # tunnel measures transfer, not compute (a [512,100,64,64] truncated
    # activation is ~420 MB — measured 4.8 s "through_block1" before this)
    import jax.numpy as _jnp
    full = jax.jit(
        lambda p, w: _jnp.sum(
            cnn.apply({"params": p}, logmel(w)), dtype=_jnp.float32
        )
    )
    for b in (256, 512, 1024, 2048):
        waves = jnp.asarray(rng.normal(0, 0.1, (b, 22050)).astype(np.float32))
        dt = _time(full, params, waves)
        results[f"full_b{b}_ms"] = round(dt * 1e3, 1)
        results[f"full_b{b}_audio_s_per_s"] = round(b / dt)
        log(f"full pipeline b={b}: {b/dt:,.0f} audio-s/s ({dt*1e3:.1f} ms incl RPC floor)")

    mel_only = jax.jit(lambda w: jnp.sum(logmel(w), dtype=jnp.float32))
    dt = _time(mel_only, waves512)
    results["logmel_b512_ms"] = round(dt * 1e3, 2)
    log(f"logmel only b=512: {dt*1e3:.2f} ms")

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

    sub = {k: v for k, v in params.items() if k == "bn0" or k.startswith("block")}
    prev = results["logmel_b512_ms"]
    for k in range(1, 7):
        fn = jax.jit(
            lambda p, w, k=k: jnp.sum(
                Trunc(k).apply({"params": p}, logmel(w)), dtype=jnp.float32
            )
        )
        dt = _time(fn, sub, waves512) * 1e3
        results[f"through_block{k}_ms"] = round(dt, 2)
        log(f"logmel+blocks1..{k}: {dt:.2f} ms (+{dt - prev:.2f})")
        prev = dt

    print(json.dumps(results))


if __name__ == "__main__":
    main()
