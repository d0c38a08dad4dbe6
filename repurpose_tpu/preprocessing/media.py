"""Media decoding helpers: ffmpeg-based frame and audio extraction.

The reference shells out to ffmpeg for all three modalities
(visual_feature_extractor_clip.py:78-92, audio_feature_extractor.py:76-86,
text_feature_extractor.py:86-100); so do we — but decoding goes straight to
numpy via pipes instead of temp-file sprawl. Stdlib-only (no librosa/
soundfile/av needed).
"""

from __future__ import annotations

import json
import logging
import shutil
import subprocess
from typing import Iterator

import numpy as np

logger = logging.getLogger(__name__)


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def probe_duration(path: str) -> float:
    out = subprocess.run(
        ["ffprobe", "-v", "error", "-show_entries", "format=duration",
         "-of", "json", path],
        capture_output=True, check=True,
    )
    return float(json.loads(out.stdout)["format"]["duration"])


def frames_1fps(path: str, width: int = 224, height: int = 224) -> Iterator[np.ndarray]:
    """Yield one RGB uint8 frame per second of video, center-cropped to
    width x height by ffmpeg (scale shorter side + crop — CLIP preprocessing
    geometry, so no PIL pass is needed afterwards)."""
    vf = (
        f"fps=1,scale='if(gt(a,1),-2,{width})':'if(gt(a,1),{height},-2)',"
        f"crop={width}:{height}"
    )
    proc = subprocess.Popen(
        ["ffmpeg", "-v", "error", "-i", path, "-vf", vf,
         "-f", "rawvideo", "-pix_fmt", "rgb24", "-"],
        stdout=subprocess.PIPE,
    )
    frame_bytes = width * height * 3
    assert proc.stdout is not None
    try:
        while True:
            buf = proc.stdout.read(frame_bytes)
            if len(buf) < frame_bytes:
                break
            yield np.frombuffer(buf, np.uint8).reshape(height, width, 3)
    finally:
        proc.stdout.close()
        proc.wait()


def load_audio(path: str, sr: int = 22050) -> np.ndarray:
    """Decode to mono float32 waveform at the given rate (the reference's
    22.05 kHz pipeline rate, audio_feature_extractor.py:80,121)."""
    out = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-ac", "1", "-ar", str(sr),
         "-f", "f32le", "-"],
        capture_output=True, check=True,
    )
    return np.frombuffer(out.stdout, np.float32).copy()


def chunk_waveform(wave: np.ndarray, sr: int) -> np.ndarray:
    """Split into zero-padded 1-second chunks [T, sr] (reference chunking,
    audio_feature_extractor.py:127-136)."""
    n = int(np.ceil(len(wave) / sr)) if len(wave) else 0
    out = np.zeros((n, sr), np.float32)
    for i in range(n):
        c = wave[i * sr : (i + 1) * sr]
        out[i, : len(c)] = c
    return out
