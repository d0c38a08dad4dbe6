"""bench.py outage hardening (VERDICT.md r3 item 1): the parent must emit
exactly one parseable JSON line under every failure mode — full results,
partial results from an interrupted run, or stale last-known-good numbers
when the tunnel never comes up. The parent never imports jax, so these
tests exercise it directly on CPU."""

import json

import bench


def _emit_line(capsys, state, note=None):
    bench._emit(state, note)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, "must print exactly ONE JSON line"
    return json.loads(out[0])


def _full_state():
    buckets = {
        str(t): {"full_ms_per_batch": 10.0, "videos_per_s": 100.0 + t,
                 "mfu": 0.25, "batch": b, "n_chain": 20}
        for t, b in bench.BUCKETS
    }
    train = {str(t): {"step_ms": 50.0, "videos_per_s": 120.0, "batch": 6,
                      "remat": False, "mfu": 0.2, "n_chain": 10}
             for t in (1024, 2048, 4096, 8192, 16384)}
    train["packed_2048"] = {"step_ms": 60.0, "videos_per_s": 200.0,
                            "n_videos": 12, "batch": 6, "mfu": 0.3,
                            "n_chain": 10}
    done = [k for k, _ in _section_keys()]
    return {
        "results": {
            "buckets": buckets, "train": train, "n_chips": 1, "n_chain": 20,
            "packed": {"full_ms_per_batch": 26.4, "videos_per_s": 529.0,
                       "n_videos": 14, "fill": 0.925, "mfu": 0.4,
                       "bucket": 2048, "n_chain": 20},
            "forward_ms_per_batch": 25.9,
        },
        "done": done, "skip": {}, "in_progress": None,
    }


def _section_keys():
    return [(k, None) for k in bench.section_keys()]


def test_emit_full_run_packed_headline(capsys):
    line = _emit_line(capsys, _full_state())
    assert line["metric"] == "videos_scored_per_sec_per_chip"
    assert line["headline_mode"] == "packed"
    assert line["value"] == 529.0
    assert line["vs_baseline"] == round(529.0 / 52.0, 2)
    assert "stale" not in line and "partial" not in line
    assert line["unpacked_videos_per_s"] == 100.0 + 2048
    assert line["buckets"]["2048"]["videos_per_s"] == 100.0 + 2048


def test_emit_partial_falls_back_to_unpacked_headline(capsys):
    st = _full_state()
    del st["results"]["packed"]
    st["done"] = ["bucket_2048"]
    line = _emit_line(capsys, st)
    assert line["headline_mode"] == "unpacked"
    assert line["value"] == 100.0 + 2048
    assert line["partial"] is True
    assert line["sections_done"] == 1
    assert line["sections_expected"] == len(_section_keys())
    assert "stale" not in line


def test_emit_nothing_measured_is_stale_not_null(capsys):
    line = _emit_line(capsys, None, note="TPU backend unreachable")
    assert line["stale"] is True
    assert line["value"] == bench.LAST_GOOD["value"]
    assert line["vs_baseline"] == bench.LAST_GOOD["vs_baseline"]
    assert line["headline_mode"] == bench.LAST_GOOD["headline_mode"]
    assert "stale_source" in line and "note" in line
    assert line["unit"] == "videos/s/chip"


def test_emit_empty_state_is_stale(capsys):
    line = _emit_line(capsys, {"results": {"buckets": {}, "train": {}},
                               "done": [], "skip": {}})
    assert line["stale"] is True and line["partial"] is True


def test_emit_records_section_errors(capsys):
    st = _full_state()
    st["skip"] = {"stage_delta": "AssertionError: non-monotone stages"}
    line = _emit_line(capsys, st)
    assert line["partial"] is True
    assert "stage_delta" in line["section_errors"]
    # headline still the live packed number — a skipped side section must
    # not degrade the artifact to stale
    assert line["value"] == 529.0 and "stale" not in line


def test_emit_divides_by_chip_count(capsys):
    st = _full_state()
    st["results"]["n_chips"] = 2
    line = _emit_line(capsys, st)
    assert line["value"] == round(529.0 / 2, 2)


def test_section_keys_cover_every_worker_section():
    """bench.section_keys() is the single source of truth (the worker's
    sections() asserts against it; _emit sizes `expected` from it). Pin the
    fixed-section set so a new section must be added there, and there only —
    round 4's train_accum slipped past the old hand-counted `expected`."""
    keys = bench.section_keys()
    assert len(keys) == len(set(keys)), "state keys must be unique"
    for fixed in ("packed", "stage_delta", "train_packed", "train_accum",
                  f"bucket_{bench.HEADLINE_BUCKET}",
                  f"train_{bench.HEADLINE_BUCKET}"):
        assert fixed in keys
    assert len(keys) == (6 + (len(bench.BUCKETS) - 1)
                         + (len(bench.TRAIN_BUCKETS) - 1)
                         + len(bench.LONGT_TRAIN))


def test_probe_backend_gives_up_at_deadline(monkeypatch):
    calls = {"n": 0}

    def fake_run(*a, **k):
        calls["n"] += 1

        class R:
            returncode = 1
            stderr = b"unavailable"
        return R()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    t0 = bench.time.time()
    assert bench._probe_backend(t0 - 1) is False  # already past deadline
    assert calls["n"] == 1  # one probe, then budget check stops it
