"""Shared timing helpers for the tools/ benches.

The sync idiom is load-bearing on this box: through the TPU network tunnel,
``jax.block_until_ready`` has been observed returning before remote
completion, so every timing sample must FETCH a (small!) result —
``np.asarray`` of the first leaf. Keep outputs scalar inside jit: fetching a
real tensor measures tunnel transfer, not compute (a truncated-CNN activation
fetch measured 4.8 s). bench.py at the repo root keeps its own inline copy so
the driver can run it standalone; every tools/ bench imports from here.
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np


def log(*a) -> None:
    print(*a, file=sys.stderr, flush=True)


def sync(out) -> None:
    np.asarray(jax.tree.leaves(out)[0])


def time_best(fn, *args, reps: int = 3) -> float:
    """Best-of-reps wall seconds of one dispatch (compile/warm excluded)."""
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
