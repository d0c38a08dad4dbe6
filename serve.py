#!/usr/bin/env python
"""Long-lived HTTP scoring service over InferencePipeline.

The reference has no serving story: its inference.py scores batch_size=1 at
each video's exact length, one program per distinct length
(/root/reference/inference.py:31), and exits. This daemon keeps the compiled
programs (one per bucket) and the params resident on the TPU and serves
scoring requests over HTTP/JSON with CROSS-REQUEST MICROBATCHING: concurrent
clients' videos merge into shared bucket-routed (optionally sequence-packed)
batches, so the chip sees production batch shapes even when each client
sends one video.

    python serve.py --config_path configs/repurpose.yaml --resume runs/full/ckpt
    python serve.py --torch_ckpt best.pth --pack          # reference .pth
    curl -s localhost:8976/healthz
    curl -s -X POST localhost:8976/score -d '{"videos": [{"video_id": "a",
        "visual": [[...]...], "audio": [[...]...], "text": [[...]...]}]}'

API:
- ``GET /healthz`` -> {"status": "ok", platform, buckets, pack, queued,
  scored_total, uptime_s}.
- ``POST /score`` -> {"results": [...]} in request order; each result is the
  reference's result schema {video_id, segments, scores, labels, duration}
  (MMCTransformer.py:226-228,270-272) JSON-encoded. Videos carry inline
  per-second features (``visual [T,vis_dim]``, ``audio [T,aud_dim]``,
  ``text [T,text_dim]`` float lists) or — with ``--feature_root DIR`` — just
  a ``video_id`` resolved to ``DIR/{visual,audio,text}/{id}.npy`` (the
  dataset's on-disk layout, data/dataset.py:55-57).

Design notes (TPU):
- ONE scorer thread owns all device work: requests enqueue and block on an
  event; the scorer drains the queue (first video waits at most
  ``--max_wait_ms`` for company, bounded by ``--max_videos_per_batch``),
  scores every pending video in one ``score_videos`` call (bucket routing,
  static shapes, ``depth``-deep host/device pipelining), and fans results
  back out. No lock contention on the runtime, no concurrent compiles.
- ``--pack`` serves the sequence-packed path (block-diagonal attention,
  value-identical results, ~1.5x throughput at realistic fill) — packing
  across REQUESTS is exactly where FFD fill comes from in production.
- Without a checkpoint the server starts with seeded random params
  (cfg.train.seed) — smoke/testing mode, same as inference.py.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import queue
import signal
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

MAX_BODY_BYTES = 1 << 30


class _Scorer(threading.Thread):
    """Single device-owning thread: drains queued requests into one
    ``score_videos`` call and distributes the results."""

    def __init__(self, pipe, buckets, batch_size, pack, depth,
                 max_wait_s, max_videos, request_timeout_s=600.0):
        super().__init__(daemon=True, name="scorer")
        self.pipe = pipe
        self.buckets = tuple(buckets)
        self.batch_size = batch_size
        self.pack = pack
        self.depth = depth
        self.max_wait_s = max_wait_s
        self.max_videos = max_videos
        self.request_timeout_s = request_timeout_s
        self.q: queue.Queue = queue.Queue()
        self.scored_total = 0
        self._stop = False

    def submit(self, videos: list, timeout: float) -> list:
        """Called from handler threads: enqueue, block until scored."""
        slot = {"videos": videos, "ev": threading.Event(),
                "results": None, "error": None}
        self.q.put(slot)
        if not slot["ev"].wait(timeout):
            raise TimeoutError("scoring timed out")
        if slot["error"] is not None:
            raise RuntimeError(slot["error"])
        return slot["results"]

    def stop(self) -> None:
        self._stop = True
        self.q.put(None)

    def run(self) -> None:
        while not self._stop:
            slot = self.q.get()
            if slot is None:
                break
            batch = [slot]
            n = len(slot["videos"])
            deadline = time.monotonic() + self.max_wait_s
            while n < self.max_videos:
                t = deadline - time.monotonic()
                if t <= 0:
                    break
                try:
                    nxt = self.q.get(timeout=t)
                except queue.Empty:
                    break
                if nxt is None:
                    self._stop = True
                    break
                batch.append(nxt)
                n += len(nxt["videos"])
            videos = [v for s in batch for v in s["videos"]]
            try:
                results = self.pipe.score_videos(
                    videos, buckets=self.buckets, batch_size=self.batch_size,
                    depth=self.depth, pack=self.pack,
                )
                self.scored_total += len(videos)
            except Exception as e:  # fan the failure out, keep serving
                logging.exception("scoring failed")
                for s in batch:
                    s["error"] = f"{type(e).__name__}: {e}"
                    s["ev"].set()
                continue
            off = 0
            for s in batch:
                k = len(s["videos"])
                s["results"] = results[off : off + k]
                off += k
                s["ev"].set()


def _json_result(r: dict) -> dict:
    return {
        "video_id": str(r["video_id"]),
        "segments": np.asarray(r["segments"], np.float64).tolist(),
        "scores": np.asarray(r["scores"], np.float64).tolist(),
        "labels": np.asarray(r["labels"]).astype(int).tolist(),
        "duration": int(r["duration"]),
    }


def _make_handler(scorer: _Scorer, cfg, feature_root, platform, t0):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *a):  # route to logging, not stderr spam
            logging.debug("http: " + fmt, *a)

        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") not in ("/healthz", ""):
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, {
                "status": "ok",
                "platform": platform,
                "buckets": list(scorer.buckets),
                "pack": scorer.pack,
                "batch_size": scorer.batch_size,
                "queued": scorer.q.qsize(),
                "scored_total": scorer.scored_total,
                "uptime_s": round(time.monotonic() - t0, 1),
            })

        def _load_video(self, v: dict, i: int) -> dict:
            if all(k in v for k in ("visual", "audio", "text")):
                return {
                    "video_id": str(v.get("video_id", i)),
                    "visual": np.asarray(v["visual"], np.float32),
                    "audio": np.asarray(v["audio"], np.float32),
                    "text": np.asarray(v["text"], np.float32),
                }
            if feature_root and "video_id" in v:
                vid = str(v["video_id"])
                if os.path.basename(vid) != vid:  # no path traversal
                    raise ValueError(f"bad video_id {vid!r}")
                out = {"video_id": vid}
                for mod in ("visual", "audio", "text"):
                    path = os.path.join(feature_root, mod, f"{vid}.npy")
                    out[mod] = np.load(path).astype(np.float32)
                return out
            raise ValueError(
                f"video {i}: needs inline visual/audio/text features"
                + (" or a video_id under --feature_root" if feature_root
                   else " (start with --feature_root to serve by video_id)")
            )

        def do_POST(self):
            if self.path.rstrip("/") != "/score":
                # replying before draining the body would desync a keep-alive
                # connection (the unread body parses as the next request)
                self.close_connection = True
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                if not 0 < n <= MAX_BODY_BYTES:
                    self.close_connection = True
                    return self._reply(413, {"error": "bad request size"})
                req = json.loads(self.rfile.read(n))
                raw = req["videos"] if isinstance(req, dict) else req
                if not isinstance(raw, list) or not raw:
                    raise ValueError("'videos' must be a non-empty list")
                dims = (cfg.model.vis_dim, cfg.model.aud_dim, cfg.model.text_dim)
                videos = []
                for i, v in enumerate(raw):
                    lv = self._load_video(v, i)
                    for mod, d in zip(("visual", "audio", "text"), dims):
                        a = lv[mod]
                        if a.ndim != 2 or a.shape[1] != d or not len(a):
                            raise ValueError(
                                f"video {i} {mod}: expected [T>0, {d}], "
                                f"got {list(a.shape)}"
                            )
                    videos.append(lv)
            except Exception as e:
                return self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            try:
                results = scorer.submit(videos, scorer.request_timeout_s)
            except TimeoutError as e:
                return self._reply(503, {"error": str(e)})
            except Exception as e:
                return self._reply(500, {"error": str(e)})
            self._reply(200, {"results": [_json_result(r) for r in results]})

    return Handler


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--config_path", default="configs/repurpose.yaml")
    p.add_argument("--resume", default=None, help="Orbax checkpoint dir")
    p.add_argument("--torch_ckpt", default=None, help="reference .pth checkpoint")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8976)
    p.add_argument("--pack", action="store_true",
                   help="sequence-packed serving (value-identical, ~1.5x)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--depth", type=int, default=2,
                   help="host/device pipelining depth inside a drain")
    p.add_argument("--max_wait_ms", type=float, default=25.0,
                   help="how long the first queued video waits for company")
    p.add_argument("--max_videos_per_batch", type=int, default=64,
                   help="drain cap per scoring call (bounds tail latency)")
    p.add_argument("--request_timeout_s", type=float, default=600.0,
                   help="503 deadline per /score request; raise it (or pass "
                        "--warmup) when cold bucket compiles go through a "
                        "slow remote-compile path")
    p.add_argument("--feature_root", default=None,
                   help="serve by video_id from DIR/{visual,audio,text}/*.npy")
    p.add_argument("--warmup", action="store_true",
                   help="compile every bucket's program before listening")
    p.add_argument("--log-level", default="INFO")
    args = p.parse_args()

    logging.basicConfig(level=args.log_level.upper(),
                        format="%(asctime)s %(levelname)s %(message)s")

    import jax  # deferred: --help must not touch the backend

    from repurpose_tpu.config import load_config
    from repurpose_tpu.infer import InferencePipeline
    from repurpose_tpu.utils.platform import (
        enable_compilation_cache, honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()
    cfg = load_config(args.config_path)

    # same checkpoint-resolution path as inference.py (incl. seeded random
    # smoke mode when neither checkpoint flag is given)
    import inference as _inf_cli

    import dataclasses

    params = _inf_cli.load_params(args, cfg)
    pipe = InferencePipeline(
        dataclasses.replace(cfg.model, dropout=0.0), params, cfg.test_cfg
    )
    buckets = cfg.train.buckets
    scorer = _Scorer(pipe, buckets, args.batch_size, args.pack, args.depth,
                     args.max_wait_ms / 1e3, args.max_videos_per_batch,
                     request_timeout_s=args.request_timeout_s)

    if args.warmup:
        for b in buckets:
            t0c = time.time()
            # every power-of-two row count (row bucketing: a drain compiles
            # the smallest power of two >= its videos — warm them all so no
            # request ever waits on a compile). Unpacked: n tiny videos ->
            # n rows. Packed: FFD repacks tiny videos into one row, so use
            # just-over-half-bucket videos (one per row) to force n rows.
            t = (b // 2 + 8) if args.pack else min(b, 8)
            n = 1
            while n <= args.batch_size:
                pipe.score_videos(
                    [{"video_id": f"warmup_{b}_{i}",
                      "visual": np.zeros((t, cfg.model.vis_dim), np.float32),
                      "audio": np.zeros((t, cfg.model.aud_dim), np.float32),
                      "text": np.zeros((t, cfg.model.text_dim), np.float32)}
                     for i in range(n)],
                    buckets=(b,), batch_size=args.batch_size, pack=args.pack,
                )
                n *= 2
            logging.info("warmed bucket %d in %.1fs", b, time.time() - t0c)

    scorer.start()
    platform = jax.devices()[0].platform

    class _Server(ThreadingHTTPServer):
        # default backlog (5) drops SYNs under concurrent-client bursts —
        # clients see ConnectionResetError while the scorer is mid-drain
        request_queue_size = 128

    server = _Server(
        (args.host, args.port),
        _make_handler(scorer, cfg, args.feature_root, platform, time.monotonic()),
    )

    def shutdown(signum, frame):
        logging.info("signal %d: shutting down", signum)
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, shutdown)
    signal.signal(signal.SIGINT, shutdown)
    # readiness line on stdout: scripts/tests wait for it
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(platform={platform}, buckets={list(buckets)}, pack={args.pack})",
          flush=True)
    try:
        server.serve_forever()
    finally:
        scorer.stop()
        server.server_close()


if __name__ == "__main__":
    main()
