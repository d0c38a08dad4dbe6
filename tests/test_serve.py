"""serve.py end-to-end: the HTTP scoring daemon (a capability beyond the
reference — its inference.py:31 scores batch-1 per exact length and exits)
must serve concurrent clients through the cross-request microbatcher and
return exactly what a direct InferencePipeline call returns.

The server subprocess starts with NO checkpoint, i.e. seeded random params
(cfg.train.seed via inference.load_params) — the test rebuilds the identical
params in-process for the equality check."""

import json
import os
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_YAML = """
train_dataset: {label_path: d.json, video_path: v, audio_path: a, text_path: t}
val_dataset: {label_path: d.json, video_path: v, audio_path: a, text_path: t}
test_dataset: {label_path: d.json, video_path: v, audio_path: a, text_path: t}
model:
  vis_dim: 8
  aud_dim: 12
  text_dim: 6
  d_model: 32
  self_num_layers: 1
  num_heads: 2
train:
  seed: 11
  lr: 0.001
  epochs: 1
  weight_decay: 0.0
  warmup_epochs: 0
  save_epochs: 1
  batch_size: 2
  eval_freq: 0
  intra_epoch_eval_freq: 0
test_cfg:
  pre_nms_topk: 16
  pre_nms_thresh: 0.2
  duration_thresh: 1
  duration_thresh_max: 90
  max_seg_per_min: 2.0
  nms_sigma: 0.5
  min_score: 0.01
tpu:
  mesh: {data: 1, model: 1, seq: 1}
  buckets: [64, 128]
  compute_dtype: float32
  attention_impl: xla
  matmul_precision: highest
"""


def _videos(rng, lens):
    return [
        {
            "video_id": f"vid{i}",
            "visual": rng.normal(size=(t, 8)).astype(np.float32),
            "audio": rng.normal(size=(t, 12)).astype(np.float32),
            "text": rng.normal(size=(t, 6)).astype(np.float32),
        }
        for i, t in enumerate(lens)
    ]


def _post(url, payload, timeout=300):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.mark.slow
def test_serve_e2e(tmp_path):
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_YAML)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "--config_path", cfg_path, "--port", "0", "--max_wait_ms", "150",
         "--batch_size", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=REPO,
    )
    try:
        line = proc.stdout.readline()  # readiness line carries the real port
        assert "serving on" in line, (line, proc.stderr.read()[-3000:])
        port = int(line.split("http://")[1].split(" ")[0].rsplit(":", 1)[1])
        base = f"http://127.0.0.1:{port}"

        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["buckets"] == [64, 128]

        # two concurrent clients -> the scorer's drain merges them into one
        # score_videos call (max_wait_ms 150 gives the second client time)
        rng = np.random.default_rng(5)
        vids_a = _videos(rng, [30, 100])
        vids_b = _videos(rng, [64])
        vids_b[0]["video_id"] = "solo"
        out = {}

        def client(name, vids):
            payload = {"videos": [
                {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                 for k, v in d.items()} for d in vids
            ]}
            out[name] = _post(base + "/score", payload)

        ths = [threading.Thread(target=client, args=("a", vids_a)),
               threading.Thread(target=client, args=("b", vids_b))]
        for t in ths:
            t.start()
        for t in ths:
            t.join(300)
        assert set(out) == {"a", "b"}, f"client(s) hung: {out.keys()}"
        for name in ("a", "b"):
            status, body = out[name]
            assert status == 200, body
        res_a, res_b = out["a"][1]["results"], out["b"][1]["results"]
        assert [r["video_id"] for r in res_a] == ["vid0", "vid1"]
        assert [r["video_id"] for r in res_b] == ["solo"]
        assert res_a[0]["duration"] == 30 and res_a[1]["duration"] == 100
        for r in res_a + res_b:
            assert len(r["segments"]) == len(r["scores"]) == len(r["labels"])

        # served results == direct InferencePipeline on identical params
        # (the server random-inits from cfg.train.seed; reproduce in-process)
        import dataclasses

        import jax

        from repurpose_tpu.config import load_config
        from repurpose_tpu.infer import InferencePipeline
        from repurpose_tpu.models import build_model, init_model_params

        cfg = load_config(cfg_path)
        params = init_model_params(
            build_model(cfg.model), cfg.model, jax.random.key(cfg.train.seed)
        )
        pipe = InferencePipeline(
            dataclasses.replace(cfg.model, dropout=0.0), params, cfg.test_cfg
        )
        direct = pipe.score_videos(
            vids_a + vids_b, buckets=cfg.train.buckets, batch_size=2
        )
        for got, want in zip(res_a + res_b, direct):
            np.testing.assert_allclose(
                np.asarray(got["segments"], np.float32).reshape(-1, 2),
                np.asarray(want["segments"], np.float32).reshape(-1, 2),
                rtol=1e-5, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(got["scores"], np.float32),
                np.asarray(want["scores"], np.float32), rtol=1e-5, atol=1e-6,
            )

        # malformed request -> 400, and the server keeps serving after it
        try:
            _post(base + "/score", {"videos": [{"video_id": "nofeat"}]})
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "features" in json.loads(e.read())["error"]
        with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["scored_total"] == 3

        proc.terminate()  # SIGTERM path: clean shutdown
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


@pytest.mark.slow
def test_serve_packed_matches_unpacked(tmp_path):
    """--pack serves the FFD-packed path; results must match the unpacked
    daemon's (value-identity is the packing contract) for the same videos,
    including videos merged across two concurrent clients."""
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_YAML)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    rng = np.random.default_rng(7)
    vids = _videos(rng, [30, 50, 64, 100])
    payload = {"videos": [
        {k: (v.tolist() if isinstance(v, np.ndarray) else v)
         for k, v in d.items()} for d in vids
    ]}

    results = {}
    for mode, extra in (("unpacked", []), ("packed", ["--pack"])):
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "serve.py"),
             "--config_path", cfg_path, "--port", "0", "--batch_size", "2",
             "--max_wait_ms", "1", *extra],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        try:
            line = proc.stdout.readline()
            assert "serving on" in line, (line, proc.stderr.read()[-3000:])
            port = int(line.split("http://")[1].split(" ")[0].rsplit(":", 1)[1])
            status, body = _post(f"http://127.0.0.1:{port}/score", payload)
            assert status == 200, body
            results[mode] = body["results"]
            proc.terminate()
            assert proc.wait(timeout=60) == 0
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait(timeout=30)

    assert [r["video_id"] for r in results["packed"]] == \
        [r["video_id"] for r in results["unpacked"]]
    for a, b in zip(results["unpacked"], results["packed"]):
        np.testing.assert_allclose(
            np.asarray(a["segments"], np.float32).reshape(-1, 2),
            np.asarray(b["segments"], np.float32).reshape(-1, 2),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(a["scores"], np.float32),
            np.asarray(b["scores"], np.float32), rtol=1e-4, atol=1e-5,
        )
