"""Offline preprocessing: download -> visual/audio/text feature extraction.

Host-side orchestration around the batched JAX extractors
(repurpose_tpu.extractors). Mirrors the reference's preprocessing package
(SURVEY.md §2.5) with its fault-tolerance behaviors (retry taxonomy, JSON
progress/resume, chunked fan-out) — and unlike the reference's
``preprocessing/__init__.py:3`` (which imports a nonexistent module and
breaks package import), this package imports cleanly.

External tools (yt-dlp, ffmpeg, whisper) are optional and gated: each stage
reports clearly when its tool is missing instead of failing at import.
"""

from repurpose_tpu.preprocessing.progress import ErrorCategory, ProgressTracker  # noqa: F401
