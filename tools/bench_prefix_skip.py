#!/usr/bin/env python
"""Prefix-skip interior sweep at the headline shape [8, 2048, 8, 64].

The flash kernels skip blocks past each row's last valid key (kvl). The
DENSE (single-slab) interiors can only skip on their grid axis (q blocks in
the forward/dq, k blocks in dk/dv) — the other axis stays full-T inside the
kernel. The STREAMING interiors also bound their inner fori_loop sweep at
ceil(kvl / k_block), so both axes shrink with fill. This bench measures, in
ONE process back-to-back (shared-chip rule, CLAUDE.md):

  - dense (current default at T<=2048) vs streaming at k_block 1024/512/256
  - at realistic fill (bench.py DURATIONS, ~65% of bucket 2048) AND full fill
    (worst case for streaming: pure overhead of the online-softmax rescaling)

for the forward and the full attention gradient. The selection constants
(STREAM_MAX_T / STREAM_K_BLOCK) are module-level and read at trace time, so
the sweep monkeypatches them and re-jits per variant.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import repurpose_tpu.ops.flash_attention as fa
from tools._bench_common import log, sync, time_best

N_CHAIN = 100
B, T, H, DH = 8, 2048, 8, 64
DURATIONS = [1800, 1313, 900, 1800, 600, 1500, 1100, 1750]  # bench.py mix


def make_inputs(full_fill: bool):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, (B, T, H, DH)).astype(np.float32), jnp.bfloat16)
        for _ in range(3)
    )
    mask = np.zeros((B, T), bool)
    for i, d in enumerate([T] * B if full_fill else DURATIONS):
        mask[i, : min(d, T)] = True
    return q, k, v, jnp.asarray(mask)


def fwd_chain():
    # Fresh function identity per call: jit caches per function object, and
    # the kernel choice (module constants) is baked in at trace time.
    @jax.jit
    def run(q, k, v, mask):
        def body(c, _):
            o = fa.mha_pallas(q + (c * 1e-6).astype(q.dtype), k, v, mask)
            return o[0, 0, 0, 0].astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_CHAIN)
        return c

    return run


def grad_chain():
    @jax.jit
    def run(q, k, v, mask):
        def loss(qq, kk, vv):
            o = fa.mha_pallas(qq, kk, vv, mask)
            return jnp.sum(jnp.where(mask[..., None, None], o, 0.0) ** 2).astype(
                jnp.float32
            )

        def body(c, _):
            # consume a leaf of EVERY grad output or the dkv kernel DCEs
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(
                q + (c * 1e-6).astype(q.dtype), k, v
            )
            g = (dq[0, 0, 0, 0] + dk[0, 0, 0, 0] + dv[0, 0, 0, 0])
            return g.astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_CHAIN)
        return c

    return run


def main():
    assert jax.default_backend() == "tpu", "sweep is only meaningful on the chip"
    variants = [
        ("dense", 2048, 1024),
        ("stream kb=1024", 1024, 1024),
        ("stream kb=512", 1024, 512),
        ("stream kb=256", 1024, 256),
    ]
    for fill_name, full in (("realistic ~65%", False), ("full 100%", True)):
        args = make_inputs(full)
        log(f"--- fill: {fill_name} ---")
        for name, max_t, kb in variants:
            fa.STREAM_MAX_T, fa.STREAM_K_BLOCK = max_t, kb
            f = time_best(fwd_chain(), *args) / N_CHAIN * 1e3
            g = time_best(grad_chain(), *args) / N_CHAIN * 1e3
            log(f"{name:16s} fwd {f:6.3f} ms  grad {g:6.3f} ms")
    fa.STREAM_MAX_T, fa.STREAM_K_BLOCK = 2048, 1024

    # Mixed backward combos (dense fwd throughout; the fwd winner is clear).
    # The dense and streaming dq/dkv kernels skip padding on opposite axes —
    # the combined toggle above can hide a mixed winner.
    log("--- mixed backward (dense fwd), realistic fill ---")
    args = make_inputs(False)
    for dq_name, dq_t in (("dq=dense", 2048), ("dq=stream", 1024)):
        for dkv_name, dkv_t in (("dkv=dense", 2048), ("dkv=stream", 1024)):
            fa.DQ_STREAM_T, fa.DKV_STREAM_T = dq_t, dkv_t
            g = time_best(grad_chain(), *args) / N_CHAIN * 1e3
            log(f"{dq_name:10s} {dkv_name:11s} grad {g:6.3f} ms")
    fa.DQ_STREAM_T = fa.DKV_STREAM_T = None


if __name__ == "__main__":
    main()
