"""Preprocessing subsystem: progress tracker, error taxonomy, downloader
retry/resume (fake ydl), transcript binning, split/inspect/cleanup tools,
feature verification."""

import json
import os

import numpy as np
import pytest

from repurpose_tpu.preprocessing.downloader import VideoDownloader
from repurpose_tpu.preprocessing.extract import bin_transcript_per_second
from repurpose_tpu.preprocessing.progress import (
    ErrorCategory,
    ProgressTracker,
    categorize_error,
)
from repurpose_tpu.preprocessing.tools import (
    cleanup_truncated,
    inspect_features,
    split_dataset,
)


# -- progress / taxonomy -------------------------------------------------------

@pytest.mark.parametrize(
    "msg,cat",
    [
        ("ERROR: Private video. Sign in if you've been granted access", ErrorCategory.PRIVATE),
        ("Video unavailable. This video has been removed", ErrorCategory.DELETED),
        ("account associated with this video has been terminated", ErrorCategory.ACCOUNT_TERMINATED),
        ("requested format is not available", ErrorCategory.FORMAT_UNAVAILABLE),
        ("blocked due to copyright claim", ErrorCategory.COPYRIGHT),
        ("Sign in to confirm you're not a bot", ErrorCategory.BOT_DETECTION),
        ("urlopen error timed out", ErrorCategory.NETWORK),
        ("something exotic", ErrorCategory.UNKNOWN),
    ],
)
def test_error_categorization(msg, cat):
    assert categorize_error(msg) is cat


def test_retryability_policy():
    assert ErrorCategory.NETWORK.retryable
    assert ErrorCategory.BOT_DETECTION.retryable
    assert not ErrorCategory.PRIVATE.retryable
    assert not ErrorCategory.DELETED.retryable


def test_progress_tracker_persistence(tmp_path):
    path = str(tmp_path / "progress.json")
    t1 = ProgressTracker(path, total=3)
    t1.mark_completed("a")
    t1.mark_failed("b", "Private video")
    t1.mark_failed("c", "connection reset")
    t2 = ProgressTracker(path, total=3)  # reload from disk
    assert t2.is_done("a")
    assert not t2.should_retry("b")  # private: permanent
    assert t2.should_retry("c")  # network: retryable
    s = t2.summary()
    assert s["completed"] == 1 and s["failed"] == 2
    assert s["by_category"] == {"private": 1, "network": 1}


# -- downloader (fake ydl) -----------------------------------------------------

class _FakeYDL:
    """Scriptable yt-dlp stand-in: outcomes[video_id] = list of exceptions /
    None per attempt."""

    outcomes: dict = {}
    attempts: dict = {}
    out_dir: str = ""

    def __init__(self, opts):
        self.opts = opts

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def download(self, urls):
        vid = urls[0].split("v=")[1]
        n = _FakeYDL.attempts.get(vid, 0)
        _FakeYDL.attempts[vid] = n + 1
        plan = _FakeYDL.outcomes.get(vid, [None])
        result = plan[min(n, len(plan) - 1)]
        if result is not None:
            raise result
        open(os.path.join(_FakeYDL.out_dir, f"{vid}.mp4"), "w").write("x")


@pytest.fixture
def downloader(tmp_path):
    _FakeYDL.outcomes = {}
    _FakeYDL.attempts = {}
    _FakeYDL.out_dir = str(tmp_path)
    return VideoDownloader(
        str(tmp_path), max_workers=2, max_retries=3, rate_limit_s=0.0,
        ydl_factory=_FakeYDL,
    )


def test_download_success_and_resume(downloader, tmp_path):
    summary = downloader.download_dataset(["v1", "v2"])
    assert summary["completed"] == 2
    # second run: nothing re-downloaded
    before = dict(_FakeYDL.attempts)
    summary2 = downloader.download_dataset(["v1", "v2"])
    assert _FakeYDL.attempts == before
    assert summary2["completed"] == 2


def test_download_retries_transient_then_succeeds(downloader):
    _FakeYDL.outcomes["v1"] = [RuntimeError("connection timed out"), None]
    summary = downloader.download_dataset(["v1"])
    assert summary["completed"] == 1
    assert _FakeYDL.attempts["v1"] == 2


def test_download_permanent_failure_not_retried(downloader):
    _FakeYDL.outcomes["v1"] = [RuntimeError("Private video")]
    summary = downloader.download_dataset(["v1"])
    assert summary["failed"] == 1
    assert _FakeYDL.attempts["v1"] == 1
    assert summary["by_category"] == {"private": 1}


# -- transcript binning ----------------------------------------------------------

def test_bin_transcript_per_second():
    """Reference overlap semantics: start <= second < end
    (text_feature_extractor.py:347-350)."""
    segs = [
        {"start": 1.2, "end": 3.7, "text": " hello "},
        {"start": 3.0, "end": 4.0, "text": "world"},
        {"start": 90.0, "end": 95.0, "text": "clamped"},
    ]
    bins = bin_transcript_per_second(segs, 6)
    assert bins == ["", "", "hello", "hello world", "", ""]


def test_text_binning_matches_reference_golden():
    """Bin-for-bin string equality against the reference's own
    extract_text_features run (golden from tools/make_goldens.py, which
    executes text_feature_extractor.py:313-391 with a recording fake
    encoder)."""
    path = os.path.join(os.path.dirname(__file__), "golden", "text_binning.json")
    cases = json.load(open(path))
    assert len(cases) >= 8
    for c in cases:
        bins = bin_transcript_per_second(c["segments"], c["duration"])
        assert bins == c["bins"], (c["segments"], bins, c["bins"])


def test_clean_text_reference_semantics():
    from repurpose_tpu.preprocessing.extract import clean_text

    assert clean_text("  multi\n\nline\t text  ") == "multi line text"
    assert clean_text("it's a—dash; test: 50% off @home") == "it's adash test 50 off home"
    assert clean_text("Hello,   WORLD!!") == "Hello, WORLD!!"
    assert clean_text("@#$%^&*") == ""
    assert clean_text("") == ""


def test_transcribe_whisperx_path(tmp_path, monkeypatch):
    """The whisperx backend follows the reference call sequence
    (load_model -> load_audio -> transcribe -> load_align_model -> align,
    text_feature_extractor.py:140-156) and caches the aligned segments."""
    import sys
    import types

    from repurpose_tpu.preprocessing.extract import TextExtractor

    calls = []
    fake = types.ModuleType("whisperx")
    fake.load_model = lambda name, device: types.SimpleNamespace(
        transcribe=lambda audio: (
            calls.append("transcribe"),
            {"language": "en", "segments": [{"start": 0.0, "end": 2.0, "text": "raw"}]},
        )[1]
    )
    fake.load_audio = lambda p: (calls.append("load_audio"), "AUDIO")[1]
    fake.load_align_model = lambda language_code, device: (
        calls.append(f"align_model:{language_code}"),
        ("ALIGN", {"meta": 1}),
    )[1]
    fake.align = lambda segs, model_a, metadata, audio, device: (
        calls.append("align"),
        {"segments": [{"start": 0.1, "end": 1.9, "text": "aligned", "words": []}]},
    )[1]
    monkeypatch.setitem(sys.modules, "whisperx", fake)

    cache = tmp_path / "t.json"
    segments = TextExtractor.transcribe("fake.wav", str(cache), backend="whisperx")
    assert segments == [{"start": 0.1, "end": 1.9, "text": "aligned"}]
    assert calls == ["load_audio", "transcribe", "align_model:en", "align"]
    # cached: a second call must not re-run ASR
    calls.clear()
    again = TextExtractor.transcribe("fake.wav", str(cache), backend="whisperx")
    assert again == segments and calls == []


# -- tools ------------------------------------------------------------------------

def test_split_dataset(tmp_path):
    entries = [{"youtube_id": f"v{i}"} for i in range(7)]
    src = tmp_path / "train.json"
    src.write_text(json.dumps(entries))
    paths = split_dataset(str(src), str(tmp_path / "chunks"), chunk_size=3)
    assert len(paths) == 3
    sizes = [len(json.load(open(p))) for p in paths]
    assert sizes == [3, 3, 1]
    manifest = json.load(open(tmp_path / "chunks" / "train_manifest.json"))
    assert manifest["total_entries"] == 7


def test_inspect_features_flags_mismatch(tmp_path):
    for d in ("vis", "aud", "txt"):
        os.makedirs(tmp_path / d)
    np.save(tmp_path / "vis" / "a.npy", np.zeros((100, 4), np.float32))
    np.save(tmp_path / "aud" / "a.npy", np.zeros((100, 8), np.float32))
    np.save(tmp_path / "txt" / "a.npy", np.zeros((50, 2), np.float32))  # mismatch
    report = inspect_features(
        ["a", "missing"], str(tmp_path / "vis"), str(tmp_path / "aud"), str(tmp_path / "txt")
    )
    assert "a" in report["mismatched"]
    assert report["videos"]["missing"]["visual"] is None


def test_cleanup_truncated(tmp_path):
    d = tmp_path / "feats"
    os.makedirs(d)
    np.save(d / "good.npy", np.zeros((120, 4), np.float32))
    np.save(d / "trunc.npy", np.zeros((1800, 4), np.float32))
    with open(d / "visual_progress.json", "w") as f:
        json.dump({"status": {"good": "completed", "trunc": "completed"}, "errors": {}}, f)
    out = cleanup_truncated([str(d)])
    assert out["count"] == 1 and "trunc.npy" in out["removed"][0]
    assert not os.path.exists(d / "trunc.npy") and os.path.exists(d / "good.npy")
    prog = json.load(open(d / "visual_progress.json"))
    assert "trunc" not in prog["status"] and "good" in prog["status"]


def test_verify_features(tmp_path):
    from repurpose_tpu.preprocessing.pipeline import (
        PreprocessConfig,
        PreprocessingPipeline,
    )

    cfg = PreprocessConfig(
        video_dir=str(tmp_path / "videos"),
        visual_dir=str(tmp_path / "vis"),
        audio_dir=str(tmp_path / "aud"),
        text_dir=str(tmp_path / "txt"),
        transcript_dir=str(tmp_path / "tr"),
    )
    pipe = PreprocessingPipeline(cfg)
    entries = [{"youtube_id": v} for v in ("a", "b")]
    ds = tmp_path / "ds.json"
    ds.write_text(json.dumps(entries))
    np.save(tmp_path / "vis" / "a.npy", np.zeros((10, 4), np.float32))
    np.save(tmp_path / "aud" / "a.npy", np.zeros((10, 8), np.float32))
    np.save(tmp_path / "txt" / "a.npy", np.zeros((10, 2), np.float32))
    np.save(tmp_path / "vis" / "b.npy", np.zeros((0, 4), np.float32))  # corrupt
    report = pipe.verify_features(str(ds))
    assert report["visual"] == {"ok": 1, "missing": 0, "corrupt": 1}
    assert report["audio"]["missing"] == 1
    assert report["complete_all_modalities"] == 1
