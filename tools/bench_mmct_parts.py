#!/usr/bin/env python
"""MMCT inference-forward part-wise bench at T=2048, B=8 (one process,
chained): where do the 27 ms go?

- encoder depth sweep (0/4/8/16 layers): per-layer cost and the fixed
  (projection+heads+decode) overhead;
- attention-impl ablation at 16 layers: pallas flash vs XLA attention vs
  NO attention (identity mixer) — the no-attention delta is the total
  attention cost, FFN/LN/heads held constant.

Motivation: the round-3 campaign measured bf16-softmax-interior and batch
scaling as no-ops, pointing at the T^2 VPU elementwise work as the wall;
this bench quantifies that attribution.
"""

from __future__ import annotations

import dataclasses
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
    import jax.numpy as jnp

    from repurpose_tpu.config import ModelConfig, TestConfig
    from repurpose_tpu.models.mmct import MMCT
    from repurpose_tpu.ops.decode import decode_batch

    results = {}
    rng = np.random.default_rng(0)
    b, t = 8, 2048
    test_cfg = TestConfig()
    base = ModelConfig()

    mask_np = np.zeros((b, t), bool)
    durs = [1800, 1313, 900, 1750, 600, 1500, 1100, 1440]
    for i, d in enumerate(durs):
        mask_np[i, :d] = True
    args = (
        jax.device_put(rng.normal(0, 1, (b, t, base.vis_dim)).astype(np.float32)),
        jax.device_put(rng.normal(0, 1, (b, t, base.aud_dim)).astype(np.float32)),
        jax.device_put(rng.normal(0, 1, (b, t, base.text_dim)).astype(np.float32)),
        jax.device_put(mask_np),
        jax.device_put(np.asarray(durs, np.int32)),
    )
    N = 10

    def chain(cfg, params, with_decode=True):
        model = MMCT(cfg)

        @jax.jit
        def run(visual, audio, text, m, dd):
            def body(c, _):
                out = model.apply(
                    {"params": params},
                    visual + (c * 1e-6).astype(visual.dtype), audio, text, m, True,
                )
                if with_decode:
                    res = decode_batch(
                        out.cls_logits[..., 0], out.offsets, m, dd, test_cfg
                    )
                    return res.scores[0, 0].astype(jnp.float32), ()
                return out.cls_logits[0, 0, 0].astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        return run

    # depth sweep (same init seed; layers beyond the depth are simply absent)
    prev = None
    for layers in (0, 4, 8, 16):
        cfg = dataclasses.replace(base, self_num_layers=layers)
        model = MMCT(cfg)
        params = model.init_params(jax.random.key(0), bucket=64)
        ms = _time(chain(cfg, params), *args) / N * 1e3
        results[f"depth{layers}_ms"] = round(ms, 2)
        delta = "" if prev is None else f" (+{(ms - prev) / max(layers - pl_, 1):.2f}/layer)"
        log(f"layers={layers}: {ms:.2f} ms{delta}")
        prev, pl_ = ms, layers

    # attention ablation at 16 layers
    for impl in ("auto", "xla"):
        cfg = dataclasses.replace(base, attention_impl=impl)
        model = MMCT(cfg)
        params = model.init_params(jax.random.key(0), bucket=64)
        ms = _time(chain(cfg, params), *args) / N * 1e3
        results[f"attn_{impl}_ms"] = round(ms, 2)
        log(f"attention_impl={impl}: {ms:.2f} ms")

    # decode overhead
    cfg = base
    model = MMCT(cfg)
    params = model.init_params(jax.random.key(0), bucket=64)
    ms = _time(chain(cfg, params, with_decode=False), *args) / N * 1e3
    results["no_decode_ms"] = round(ms, 2)
    log(f"forward only (no decode): {ms:.2f} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
