#!/usr/bin/env python
"""Round-3 perf campaign: one process, back-to-back chained measurements on
the real TPU (this box's timings fluctuate ~5x across processes — CLAUDE.md —
so every comparison below happens within this single run).

Experiments (all lax.scan-chained with carry threading so XLA cannot hoist):
  A. attention fwd / fwd+bwd at [8, 2048, 8, 64]: f32 vs bf16 softmax interior
  B. model inference (forward+decode+NMS) at T=2048: B=8 f32 vs bf16, B=16/32
  C. train step T=2048 B=6: f32 vs bf16 interior
  D. long-T: inference at T=4096/8192 (streaming kernels), train at 4096/8192
     (small batch, remat on at 8192)

Writes one JSON blob to stdout at the end; prose on stderr.
"""

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

REPEATS = 3


def _time(fn, *args, reps: int = REPEATS) -> float:
    _sync(fn(*args))  # compile + warm
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
    import jax.numpy as jnp

    from repurpose_tpu.config import ModelConfig, TestConfig, TrainConfig
    from repurpose_tpu.models.mmct import MMCT
    from repurpose_tpu.ops.decode import decode_batch
    from repurpose_tpu.ops.flash_attention import mha_pallas

    results: dict = {}
    rng = np.random.default_rng(0)

    # -- A: attention kernels ------------------------------------------------
    b, t, h, dh = 8, 2048, 8, 64
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.bfloat16)
    mask_np = np.ones((b, t), bool)
    for i in range(b):
        mask_np[i, 1800 - 100 * i :] = False
    mask = jnp.asarray(mask_np)
    N = 20

    def fwd_chain(sm):
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                out = mha_pallas(q + (c * 1e-6).astype(q.dtype), k, v, mask, softmax_dtype=sm)
                return out[0, 0, 0, 0].astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        return run

    def grad_chain(sm):
        @jax.jit
        def run(q, k, v):
            def loss(q, k, v):
                o = mha_pallas(q, k, v, mask, backward="pallas", softmax_dtype=sm)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def body(c, _):
                g = jax.grad(loss, argnums=(0, 1, 2))(q + (c * 1e-6).astype(q.dtype), k, v)
                s = sum(x[0, 0, 0, 0].astype(jnp.float32) for x in g)
                return s, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        return run

    for sm in ("float32", "bfloat16"):
        ms = _time(fwd_chain(sm), q, k, v) / N * 1e3
        results[f"attn_fwd_{sm}_ms"] = round(ms, 3)
        log(f"A: attention fwd {sm}: {ms:.3f} ms")
    for sm in ("float32", "bfloat16"):
        ms = _time(grad_chain(sm), q, k, v) / N * 1e3
        results[f"attn_grad_{sm}_ms"] = round(ms, 3)
        log(f"A: attention fwd+bwd {sm}: {ms:.3f} ms")

    # -- B: model inference --------------------------------------------------
    test_cfg = TestConfig()

    def make_args(cfg, bsz, tt):
        m = np.zeros((bsz, tt), bool)
        durs = [1800, 1313, 900, 1750, 600, 1500, 1100, 1440]
        durations = [min(durs[i % len(durs)], tt) for i in range(bsz)]
        for i, d in enumerate(durations):
            m[i, :d] = True
        return (
            jax.device_put(rng.normal(0, 1, (bsz, tt, cfg.vis_dim)).astype(np.float32)),
            jax.device_put(rng.normal(0, 1, (bsz, tt, cfg.aud_dim)).astype(np.float32)),
            jax.device_put(rng.normal(0, 1, (bsz, tt, cfg.text_dim)).astype(np.float32)),
            jax.device_put(m),
            jax.device_put(np.asarray(durations, np.int32)),
        )

    def infer_chain(cfg, params, model, n):
        @jax.jit
        def run(visual, audio, text, m, durs):
            def body(c, _):
                out = model.apply(
                    {"params": params}, visual + (c * 1e-6).astype(visual.dtype), audio, text, m, True
                )
                res = decode_batch(
                    out.cls_logits[..., 0], out.offsets, m, durs, test_cfg
                )
                return res.scores[0, 0].astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return run

    base_cfg = ModelConfig()
    model = MMCT(base_cfg)
    params = model.init_params(jax.random.key(0), bucket=64)

    for sm, bsz in [("float32", 8), ("bfloat16", 8), ("bfloat16", 16), ("bfloat16", 32)]:
        cfg = ModelConfig(attn_softmax_dtype=sm)
        m2 = MMCT(cfg)
        args = make_args(cfg, bsz, 2048)
        ms = _time(infer_chain(cfg, params, m2, 10), *args) / 10 * 1e3
        vps = bsz / (ms / 1e3)
        results[f"infer_2048_b{bsz}_{sm}_ms"] = round(ms, 2)
        results[f"infer_2048_b{bsz}_{sm}_vps"] = round(vps, 1)
        log(f"B: inference T=2048 B={bsz} {sm}: {ms:.2f} ms/batch = {vps:.0f} videos/s")

    # -- C: train step -------------------------------------------------------
    from repurpose_tpu.data.batching import Batch
    from repurpose_tpu.train.state import create_train_state
    from repurpose_tpu.train.step import make_train_step

    def train_ms(cfg, bsz, tt, n=10, remat=False):
        import dataclasses

        mcfg = dataclasses.replace(cfg, remat=remat)
        tc = TrainConfig(batch_size=bsz, buckets=(tt,))
        state, tx, sched = create_train_state(mcfg, tc, 100, jax.random.key(1))
        step = make_train_step(mcfg, tc, tx, sched, donate=False)
        vv, aa, xx, mm, dd = make_args(mcfg, bsz, tt)
        labels = jax.device_put((rng.uniform(size=(bsz, tt)) < 0.3).astype(np.float32))
        segs = jax.device_put(np.abs(rng.normal(0, 10, (bsz, tt, 2))).astype(np.float32))
        batch = Batch(vv, aa, xx, mm, labels, segs, dd)
        key = jax.random.key(2, impl="rbg")

        @jax.jit
        def chain(state, batch):
            def body(st, _):
                st, metrics = step(st, batch, key)
                return st, metrics["loss"]
            st, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]

        return _time(chain, state, batch) / n * 1e3

    for sm in ("float32", "bfloat16"):
        ms = train_ms(ModelConfig(attn_softmax_dtype=sm), 6, 2048)
        results[f"train_2048_b6_{sm}_ms"] = round(ms, 2)
        log(f"C: train step T=2048 B=6 {sm}: {ms:.2f} ms")

    # -- D: long-T -----------------------------------------------------------
    cfg16 = ModelConfig(attn_softmax_dtype="bfloat16")
    for bsz, tt in [(4, 4096), (2, 8192)]:
        m2 = MMCT(cfg16)
        args = make_args(cfg16, bsz, tt)
        ms = _time(infer_chain(cfg16, params, m2, 5), *args) / 5 * 1e3
        results[f"infer_{tt}_b{bsz}_ms"] = round(ms, 2)
        results[f"infer_{tt}_b{bsz}_vps"] = round(bsz / (ms / 1e3), 1)
        log(f"D: inference T={tt} B={bsz}: {ms:.2f} ms/batch "
            f"= {bsz/(ms/1e3):.1f} videos/s")
    for bsz, tt, remat in [(3, 4096, False), (1, 8192, True)]:
        try:
            ms = train_ms(cfg16, bsz, tt, n=5, remat=remat)
            results[f"train_{tt}_b{bsz}_remat{int(remat)}_ms"] = round(ms, 2)
            log(f"D: train T={tt} B={bsz} remat={remat}: {ms:.2f} ms/step")
        except Exception as e:  # OOM documentation beats a dead campaign
            results[f"train_{tt}_b{bsz}_remat{int(remat)}_error"] = str(e)[:200]
            log(f"D: train T={tt} B={bsz} remat={remat} FAILED: {e}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
