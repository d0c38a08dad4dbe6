"""ctypes bindings for the native runtime (csrc/librepurpose_native.so).

Two accelerated host paths, both with pure-Python fallbacks so the framework
works without a toolchain:

- ``batch_load_npy``: K float32 .npy files -> one pre-zeroed [B, T, D] numpy
  buffer via threaded pread (the collate hot loop);
- ``soft_nms_native``: C++ Soft-NMS with oracle semantics — the fast host
  alternative for pipelines without a TPU (production decode runs
  ``soft_nms_tpu`` on device);

The library auto-builds on first use when g++ is available (make -C csrc).
"""

from __future__ import annotations

import ctypes
import logging
import os
import shutil
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_SO = os.path.join(_CSRC, "librepurpose_native.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    if shutil.which("make") is None or shutil.which("g++") is None:
        return False
    # fast path: make -q exits 0 when the .so is already up to date
    q = subprocess.run(["make", "-C", _CSRC, "-q"], capture_output=True)
    if q.returncode == 0 and os.path.exists(_SO):
        return True
    # build to a per-process name, then atomically rename: two processes
    # importing concurrently must not dlopen a half-linked .so
    tmp = f"librepurpose_native.build{os.getpid()}.so"
    try:
        subprocess.run(
            ["make", "-C", _CSRC, "-s", f"TARGET={tmp}"],
            check=True, capture_output=True,
        )
        os.replace(os.path.join(_CSRC, tmp), _SO)
        return True
    except subprocess.CalledProcessError as e:
        logger.warning("native build failed: %s", e.stderr.decode()[-500:])
        return False
    finally:
        try:
            os.remove(os.path.join(_CSRC, tmp))
        except OSError:
            pass


def _sources_newer_than_so() -> bool:
    try:
        so_m = os.path.getmtime(_SO)
    except OSError:
        return True
    return any(
        os.path.getmtime(os.path.join(_CSRC, f)) > so_m
        for f in os.listdir(_CSRC)
        if f.endswith((".cc", ".h"))
    )


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # run make even when the .so exists: its source dependencies make a
        # fresh build a no-op, and skipping it would silently load a binary
        # stale against edited csrc/*.cc (tests would then validate old code)
        if not _build():
            if not os.path.exists(_SO) or _sources_newer_than_so():
                # a stale .so after a FAILED build is exactly the
                # tests-validate-old-code hazard — fall back to Python
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logger.warning("native library unloadable: %s", e)
            return None
        lib.npy_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.npy_probe.restype = ctypes.c_int
        lib.npy_load_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.npy_load_f32.restype = ctypes.c_int64
        lib.npy_batch_load_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
        ]
        lib.npy_batch_load_f32.restype = ctypes.c_int
        lib.soft_nms_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_float,
            ctypes.c_float, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.soft_nms_f32.restype = ctypes.c_int64
        lib.repurpose_dtw.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.repurpose_dtw.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def probe_npy(path: str) -> tuple[int, int] | None:
    """(rows, cols) of a float32 C-order 2-D .npy, or None on any mismatch."""
    lib = get_lib()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    if lib.npy_probe(path.encode(), ctypes.byref(rows), ctypes.byref(cols)) != 0:
        return None
    return int(rows.value), int(cols.value)


def batch_load_npy(
    paths: list[str], t: int, d: int, n_threads: int = 4
) -> tuple[np.ndarray, np.ndarray] | None:
    """Load files into a zero-padded [len(paths), t, d] float32 batch.
    Returns (batch, rows per file) or None to signal numpy fallback."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, t, d), np.float32)
    rows = np.zeros(n, np.int64)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.npy_batch_load_f32(
        arr, n, out.ctypes.data_as(ctypes.c_void_p), t, d,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads,
    )
    if rc != 0:
        return None
    return out, rows


def soft_nms_native(
    scores: np.ndarray,
    segments: np.ndarray,
    sigma: float,
    thresh: float,
    max_seg_num: int,
) -> np.ndarray | None:
    """C++ Soft-NMS; returns kept original indices, or None for fallback."""
    lib = get_lib()
    if lib is None:
        return None
    s = np.ascontiguousarray(scores, np.float32)
    g = np.ascontiguousarray(segments, np.float32)
    n = s.shape[0] if s.ndim == 1 else -1
    # shape mismatches would make the C loop read past the segments buffer;
    # NaN scores and negative budgets hit oracle semantics (NaN-as-argmax-
    # max, negative-slice truncation) the C kernel deliberately doesn't
    # reproduce — route all of those to the Python oracle instead
    if n < 0 or g.shape != (n, 2) or max_seg_num < 0 or np.isnan(s).any():
        return None
    keep = np.zeros(max(n, 1), np.int64)
    n_keep = lib.soft_nms_f32(
        s.ctypes.data_as(ctypes.c_void_p), g.ctypes.data_as(ctypes.c_void_p),
        n, sigma, thresh, max_seg_num, keep.ctypes.data_as(ctypes.c_void_p),
    )
    return keep[:n_keep].copy()


def dtw_path(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimum-cost monotonic path through a [n_tokens, n_frames] cost matrix
    (down/right/diagonal steps), ordered start->end. Used by the Whisper
    cross-attention word aligner (extractors/whisper_align.py). C++ when the
    native library is available, vectorized-numpy anti-diagonal fallback
    otherwise; both produce identical paths."""
    cost = np.ascontiguousarray(cost, np.float32)
    n, m = cost.shape
    if n == 0 or m == 0:
        # no cells to traverse; the numpy backtrace would otherwise loop
        # forever chasing an unreachable (0, 0) exit
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    lib = get_lib()
    if lib is not None:
        ti = np.zeros(n + m, np.int32)
        tj = np.zeros(n + m, np.int32)
        length = lib.repurpose_dtw(
            cost.ctypes.data_as(ctypes.c_void_p), n, m,
            ti.ctypes.data_as(ctypes.c_void_p), tj.ctypes.data_as(ctypes.c_void_p),
        )
        if length > 0:
            return ti[:length].copy(), tj[:length].copy()
    return _dtw_numpy(cost)


def _dtw_numpy(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Anti-diagonal wavefront DP: cells on diagonal d = i + j depend only on
    diagonals d-1 (up/left) and d-2 (diagonal step), so each wavefront is one
    vectorized min — O(n + m) numpy ops instead of an O(n*m) Python loop."""
    n, m = cost.shape
    inf = np.float32(np.inf)
    acc = np.full((n, m), inf, np.float32)
    trace = np.zeros((n, m), np.int8)  # 0 = diag, 1 = up, 2 = left
    for d in range(n + m - 1):
        lo = max(0, d - m + 1)
        hi = min(n - 1, d)
        i = np.arange(lo, hi + 1)
        j = d - i
        c_diag = np.where(
            (i > 0) & (j > 0), acc[np.maximum(i - 1, 0), np.maximum(j - 1, 0)], inf
        )
        c_diag = np.where((i == 0) & (j == 0), 0.0, c_diag)
        c_up = np.where(i > 0, acc[np.maximum(i - 1, 0), j], inf)
        c_left = np.where(j > 0, acc[i, np.maximum(j - 1, 0)], inf)
        # tie-break order matches the C++ kernel: diag < up < left strictly,
        # else left unless up strictly beats both
        best = np.where(
            (c_diag < c_up) & (c_diag < c_left), 0,
            np.where((c_up < c_diag) & (c_up < c_left), 1, 2),
        ).astype(np.int8)
        vals = np.stack([c_diag, c_up, c_left])[best, np.arange(len(i))]
        acc[i, j] = cost[i, j] + vals
        trace[i, j] = best
    ti, tj = [], []
    i, j = n - 1, m - 1
    while True:
        ti.append(i)
        tj.append(j)
        if i == 0 and j == 0:
            break
        if i == 0:
            t = 2
        elif j == 0:
            t = 1
        else:
            t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(ti[::-1], np.int32), np.asarray(tj[::-1], np.int32)
