#!/usr/bin/env python
"""Mosaic grid dimension_semantics sweep for the flash kernels, one process.

Grid is (batch, d-block, t-block) with fully independent programs; candidates:
None (compiler default), all-parallel, parallel+trailing-arbitrary.
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


def main() -> None:
    from repurpose_tpu.utils.platform import (
        enable_compilation_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()
    import jax.numpy as jnp

    import repurpose_tpu.ops.flash_attention as fa

    rng = np.random.default_rng(0)
    b, t, h, dh = 8, 2048, 8, 64
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, dh)), jnp.bfloat16)
    mask_np = np.ones((b, t), bool)
    for i in range(b):
        mask_np[i, 1800 - 100 * i:] = False
    mask = jnp.asarray(mask_np)
    N = 20
    results = {}

    def fwd_chain():
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                out = fa.mha_pallas(
                    q + (c * 1e-6).astype(q.dtype), k, v, mask, softmax_dtype="bfloat16"
                )
                return out[0, 0, 0, 0].astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        return run

    def grad_chain():
        @jax.jit
        def run(q, k, v):
            def loss(q, k, v):
                o = fa.mha_pallas(
                    q, k, v, mask, backward="pallas", softmax_dtype="bfloat16"
                )
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def body(c, _):
                g = jax.grad(loss, argnums=(0, 1, 2))(q + (c * 1e-6).astype(q.dtype), k, v)
                return sum(x[0, 0, 0, 0].astype(jnp.float32) for x in g), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        return run

    for name, sem in [
        ("default", None),
        ("all_parallel", ("parallel", "parallel", "parallel")),
        ("par_par_arb", ("parallel", "parallel", "arbitrary")),
    ]:
        fa.GRID_SEMANTICS = sem
        f = _time(fwd_chain(), q, k, v) / N * 1e3
        g = _time(grad_chain(), q, k, v) / N * 1e3
        results[name] = {"fwd_ms": round(f, 3), "grad_ms": round(g, 3)}
        print(f"{name}: fwd {f:.3f} ms, fwd+bwd {g:.3f} ms", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
