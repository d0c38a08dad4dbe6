#!/usr/bin/env python
"""Attention BACKWARD A/B at the headline shape [8, 2048, 8, 64].

Times grad(sum(mha(q,k,v))) wrt q/k/v for:
  A. old transposed-layout two-kernel backward (loaded verbatim from git via
     ``git show <rev>:repurpose_tpu/ops/flash_attention.py`` — exact A/B, no
     transcription)
  B. current flat-layout backward (no transposes)
  C. XLA-recompute backward (backward="xla")

All chained on-device (N_CHAIN serially-dependent grads in one program) so
the tunnel's RPC floor amortizes to noise. Run back-to-back in ONE process;
absolute ms across processes are untrustworthy on this box (CLAUDE.md).

Usage: python tools/bench_attention_bwd.py [old_git_rev]   (default 127faff)
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from repurpose_tpu.ops.flash_attention import mha_pallas

N_CHAIN = 50
B, T, H, DH = 8, 2048, 8, 64


def load_old(rev: str):
    src = subprocess.run(
        ["git", "show", f"{rev}:repurpose_tpu/ops/flash_attention.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = "/tmp/_old_flash_attention.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("_old_flash_attention", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0])


def timed(fn, *args, reps=3):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN


def chained_grad(mha, backward, q_block=None):
    def loss(q, k, v, mask):
        kw = {"backward": backward}
        if q_block is not None:
            kw["q_block"] = q_block
        return jnp.sum(
            mha(q, k, v, mask, **kw).astype(jnp.float32)
        )

    g = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v, mask):
        def body(c, _):
            dq, dk, dv = g(q + c.astype(q.dtype), k, v, mask)
            return dq[0, 0, 0, 0].astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N_CHAIN)
        return c

    return run


def main():
    rev = sys.argv[1] if len(sys.argv) > 1 else "127faff"
    old = load_old(rev)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)
    q = jax.device_put(rng.normal(0, 1, (B, T, H, DH)).astype(jnp.bfloat16))
    k = jax.device_put(rng.normal(0, 1, (B, T, H, DH)).astype(jnp.bfloat16))
    v = jax.device_put(rng.normal(0, 1, (B, T, H, DH)).astype(jnp.bfloat16))
    mask = np.ones((B, T), bool)
    mask[:, 1800:] = False
    mask = jax.device_put(mask)

    # A single-pass fused backward (dq + VMEM-scratch dk/dv accumulation over
    # a sequential q sweep) was measured here at 3.45 ms/grad (best q_block
    # 256) vs 2.88 for the two-kernel split — retired; see the
    # flash_attention.py module docstring.
    variants = [
        (f"old-transposed ({rev})", chained_grad(old.mha_pallas, "pallas")),
        ("new-flat two-kernel", chained_grad(mha_pallas, "pallas")),
        ("xla-recompute", chained_grad(mha_pallas, "xla")),
    ]
    for name, fn in variants:
        try:
            ms = timed(fn, q, k, v, mask) * 1e3
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        print(f"{name:28s} {ms:8.3f} ms/grad")


if __name__ == "__main__":
    main()
