"""Chunk fan-out runner (preprocessing/fanout.py) — host-local capability
parity with the reference's SLURM fan-out:

- submit_parallel_jobs.sh: chunk discovery by dataset type, --num-jobs limit,
  --dry-run preview
- slurm_preprocessing_job.sh:108-133: per-chunk _SUCCESS/_FAILED markers,
  resumable reruns

Workers are shimmed with a fake chunk-processor script (same seam style as
tests/test_media.py's fake ffmpeg): the REPURPOSE_FANOUT_WORKER env template
replaces the real `preprocess.py --dataset {chunk}` invocation.
"""

import json
import os
import subprocess
import sys

import pytest

from repurpose_tpu.preprocessing.fanout import (
    WORKER_ENV,
    find_chunks,
    run_fanout,
)
from repurpose_tpu.preprocessing.tools import split_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAKE_WORKER = """\
import json, os, sys
chunk = sys.argv[1]
with open(os.environ["FAKE_ARGV_LOG"], "a") as f:
    f.write(json.dumps(sys.argv[1:]) + "\\n")
entries = json.load(open(chunk))
sys.exit(1 if any(e.get("fail") for e in entries) else 0)
"""


@pytest.fixture
def splits(tmp_path, monkeypatch):
    """3 train chunks (one poisoned to fail) + 1 val chunk + fake worker."""
    entries = [{"youtube_id": f"vid{i}"} for i in range(5)]
    entries[3]["fail"] = True  # lands in train chunk 1
    src = tmp_path / "train.json"
    src.write_text(json.dumps(entries))
    split_dataset(str(src), str(tmp_path / "chunks"), chunk_size=2)
    (tmp_path / "chunks" / "val_chunk_0000.json").write_text(
        json.dumps([{"youtube_id": "v"}])
    )
    worker = tmp_path / "fake_worker.py"
    worker.write_text(FAKE_WORKER)
    argv_log = tmp_path / "argv.jsonl"
    argv_log.touch()
    monkeypatch.setenv(WORKER_ENV, f"{sys.executable} {worker} {{chunk}}")
    monkeypatch.setenv("FAKE_ARGV_LOG", str(argv_log))
    return tmp_path / "chunks", argv_log


def _argv_lines(argv_log):
    return [json.loads(l) for l in argv_log.read_text().splitlines()]


def test_find_chunks_filters_by_dataset_type(splits):
    chunks_dir, _ = splits
    assert len(find_chunks(str(chunks_dir), "train")) == 3
    assert len(find_chunks(str(chunks_dir), "val")) == 1
    assert len(find_chunks(str(chunks_dir), "all")) == 4
    assert find_chunks(str(chunks_dir), "test") == []


def test_markers_and_summary(splits):
    chunks_dir, argv_log = splits
    chunks = find_chunks(str(chunks_dir), "train")
    s = run_fanout(chunks, ["visual"], workers=2)
    assert (s["requested"], s["succeeded"], s["failed"]) == (3, 2, 1)
    assert os.path.exists(chunks_dir / "train_chunk_0000_SUCCESS")
    assert os.path.exists(chunks_dir / "train_chunk_0001_FAILED")
    assert os.path.exists(chunks_dir / "train_chunk_0002_SUCCESS")
    # marker payload records rc + duration (judgeable like the reference's log)
    payload = json.loads((chunks_dir / "train_chunk_0001_FAILED").read_text())
    assert payload["rc"] == 1
    # every worker saw exactly its chunk path
    seen = {a[0] for a in _argv_lines(argv_log)}
    assert seen == set(chunks)
    # per-chunk logs captured
    assert (chunks_dir / "train_chunk_0000_log.txt").exists()


def test_rerun_skips_success_and_failed(splits):
    chunks_dir, argv_log = splits
    chunks = find_chunks(str(chunks_dir), "train")
    run_fanout(chunks, ["visual"])
    argv_log.write_text("")
    s = run_fanout(chunks, ["visual"])  # no retry_failed
    assert s["run"] == 0 and s["skipped"] == 3
    assert _argv_lines(argv_log) == []


def test_retry_failed_reruns_only_failed_and_clears_marker(splits, tmp_path):
    chunks_dir, argv_log = splits
    chunks = find_chunks(str(chunks_dir), "train")
    run_fanout(chunks, ["visual"])
    # un-poison the failing chunk, then retry
    bad = chunks_dir / "train_chunk_0001.json"
    entries = json.loads(bad.read_text())
    for e in entries:
        e.pop("fail", None)
    bad.write_text(json.dumps(entries))
    argv_log.write_text("")
    s = run_fanout(chunks, ["visual"], retry_failed=True)
    assert (s["run"], s["succeeded"], s["skipped"]) == (1, 1, 2)
    assert [a[0] for a in _argv_lines(argv_log)] == [str(bad)]
    assert os.path.exists(chunks_dir / "train_chunk_0001_SUCCESS")
    assert not os.path.exists(chunks_dir / "train_chunk_0001_FAILED")


def test_limit(splits):
    chunks_dir, argv_log = splits
    chunks = find_chunks(str(chunks_dir), "train")
    s = run_fanout(chunks, ["visual"], limit=1)
    assert s["requested"] == 3 and s["run"] == 1
    assert len(_argv_lines(argv_log)) == 1


def test_dry_run_executes_nothing(splits, capsys):
    chunks_dir, argv_log = splits
    chunks = find_chunks(str(chunks_dir), "train")
    s = run_fanout(chunks, ["visual"], dry_run=True)
    assert s["would_run"] == 3 and s["run"] == 0
    assert _argv_lines(argv_log) == []
    assert not os.path.exists(chunks_dir / "train_chunk_0000_SUCCESS")
    out = capsys.readouterr().out
    assert out.count("DRY RUN: would run:") == 3


def test_spawn_failure_is_a_failed_marker(splits, monkeypatch):
    chunks_dir, _ = splits
    monkeypatch.setenv(WORKER_ENV, "/nonexistent/worker {chunk}")
    chunks = find_chunks(str(chunks_dir), "val")
    s = run_fanout(chunks, ["visual"])
    assert s["failed"] == 1
    payload = json.loads((chunks_dir / "val_chunk_0000_FAILED").read_text())
    assert payload["rc"] == 127


def test_cli_fanout_exit_code_and_summary(splits):
    chunks_dir, _ = splits
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "preprocess.py"), "--fanout", "2",
         "--splits-dir", str(chunks_dir), "--dataset-type", "train"],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert r.returncode == 1, r.stderr  # one poisoned chunk fails
    summary = json.loads(r.stdout[r.stdout.index("{"):])
    assert summary["succeeded"] == 2 and summary["failed"] == 1
    # a second run resumes: skips the 2 succeeded, still fails the poisoned one
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "preprocess.py"), "--fanout", "2",
         "--splits-dir", str(chunks_dir), "--dataset-type", "train",
         "--retry-failed"],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    summary2 = json.loads(r2.stdout[r2.stdout.index("{"):])
    assert summary2["skipped"] == 2 and summary2["run"] == 1
