"""Per-modality feature extraction drivers: video files -> per-second .npy.

TPU-first counterparts of the reference's three extractor classes
(SURVEY.md §2.5):

- visual: the reference encodes CLIP frame-at-a-time on GPU
  (visual_feature_extractor_clip.py:184-199 — unbatched H2D per frame!);
  here frames buffer into large batches for one jitted encoder call.
- audio: the reference rebuilds the PANNs model per video and loops 1-s
  chunks (audio_feature_extractor.py:125,131-142); here all chunks batch
  through CNN14 at once.
- text: the reference SBERT-encodes each second's bin individually and needs
  TWO passes per fresh video because embedding lives in the
  transcript-already-cached branch (text_feature_extractor.py:310-386);
  here transcribe->bin->embed is one pass (deliberate bug fix, documented)
  and bins encode as one padded batch.

Every driver: resumable via ProgressTracker, per-video .npy of shape
(T_seconds, dim), same file layout the training dataset consumes
(dataset paths: {dir}/{youtube_id}.npy, RepurposeClip.py:25-27).
"""

from __future__ import annotations

import logging
import os
import re
from typing import Callable, Sequence

import numpy as np

from repurpose_tpu.preprocessing.media import (
    chunk_waveform,
    find_video_file,
    frames_1fps,
    load_audio,
)
from repurpose_tpu.preprocessing.progress import ProgressTracker

logger = logging.getLogger(__name__)


def _resumable(kind: str):
    """Wrap a per-video extractor into a dataset-level resumable driver."""

    def run(
        extract_fn: Callable[[str], np.ndarray],
        video_ids: Sequence[str],
        video_dir: str,
        out_dir: str,
        tracker: ProgressTracker | None = None,
    ) -> dict:
        os.makedirs(out_dir, exist_ok=True)
        tracker = tracker or ProgressTracker(
            os.path.join(out_dir, f"{kind}_progress.json"), len(video_ids)
        )
        for vid in video_ids:
            out_path = os.path.join(out_dir, f"{vid}.npy")
            if tracker.is_done(vid) and os.path.exists(out_path):
                continue
            src = find_video_file(video_dir, vid)
            if not os.path.exists(src):
                tracker.mark_failed(vid, "video file missing")
                continue
            try:
                feats = extract_fn(src)
                if feats.ndim != 2 or feats.shape[0] == 0:
                    raise ValueError(f"bad feature shape {feats.shape}")
                np.save(out_path, feats)
                tracker.mark_completed(vid)
            except Exception as e:
                logger.warning("%s extraction failed for %s: %s", kind, vid, e)
                tracker.mark_failed(vid, str(e))
        return tracker.summary()

    return run


class VisualExtractor:
    """video -> (T, 512) CLIP ViT-B/32 embeddings, 1 frame/s, L2-normalized."""

    def __init__(self, params, batch_size: int = 128, compute_dtype: str = "bfloat16"):
        import jax

        from repurpose_tpu.extractors.clip_vit import (
            CLIP_IMAGE_MEAN,
            CLIP_IMAGE_STD,
            CLIPVisionEncoder,
        )

        import jax.numpy as jnp

        model = CLIPVisionEncoder(compute_dtype=compute_dtype)
        # device-resident params threaded as a jit ARGUMENT: a closed-over
        # host-numpy tree would inline ~350 MB of CLIP weights into the
        # lowered module as HLO literals — the remote-compile relay rejects
        # requests that large (CLAUDE.md: HTTP 413)
        self._vars = {"params": jax.tree.map(jnp.asarray, params)}
        self._encode_p = jax.jit(lambda v, imgs: model.apply(v, imgs))
        self._encode = lambda imgs: self._encode_p(self._vars, imgs)
        self.batch_size = batch_size
        self._mean, self._std = CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    def extract(self, video_path: str) -> np.ndarray:
        out, buf = [], []

        def flush():
            if not buf:
                return
            batch = (np.stack(buf).astype(np.float32) / 255.0 - self._mean) / self._std
            n = len(batch)
            if n < self.batch_size:  # pad to the static batch shape
                batch = np.concatenate(
                    [batch, np.zeros((self.batch_size - n, *batch.shape[1:]), np.float32)]
                )
            out.append(np.asarray(self._encode(batch))[:n])
            buf.clear()

        for frame in frames_1fps(video_path):
            buf.append(frame)
            if len(buf) == self.batch_size:
                flush()
        flush()
        if not out:
            return np.zeros((0, 512), np.float32)
        return np.concatenate(out).astype(np.float32)

    def run(self, video_ids, video_dir, out_dir, tracker=None) -> dict:
        return _resumable("visual")(self.extract, video_ids, video_dir, out_dir, tracker)


class AudioExtractor:
    """video -> (T, 2048) CNN14 embeddings, one 1-s chunk per second.

    With ``params=None`` falls back to classical DSP features (MFCC/chroma/
    contrast/tonnetz zero-padded to 2048 — the reference's librosa fallback,
    audio_feature_extractor.py:159-239, rebuilt in extractors.fallback_audio).
    """

    def __init__(self, params, batch_size: int = 512, sr: int = 22050,
                 compute_dtype: str = "bfloat16"):
        self.batch_size = batch_size
        self.sr = sr
        self._embed = None
        if params is not None:
            import jax

            from repurpose_tpu.extractors.cnn14 import CNN14
            from repurpose_tpu.extractors.audio_frontend import logmel

            import jax.numpy as jnp

            model = CNN14(compute_dtype=compute_dtype)
            # params as a jit argument, device-resident (see VisualExtractor)
            self._vars = {"params": jax.tree.map(jnp.asarray, params)}
            embed_p = jax.jit(lambda v, wave: model.apply(v, logmel(wave)))
            self._embed = lambda wave: embed_p(self._vars, wave)

    def extract(self, video_path: str) -> np.ndarray:
        if self._embed is None:
            from repurpose_tpu.extractors.fallback_audio import fallback_features

            return fallback_features(load_audio(video_path, self.sr), self.sr)
        chunks = chunk_waveform(load_audio(video_path, self.sr), self.sr)
        outs = []
        for i in range(0, len(chunks), self.batch_size):
            b = chunks[i : i + self.batch_size]
            n = len(b)
            if n < self.batch_size:
                b = np.concatenate(
                    [b, np.zeros((self.batch_size - n, b.shape[1]), np.float32)]
                )
            outs.append(np.asarray(self._embed(b))[:n])
        if not outs:
            return np.zeros((0, 2048), np.float32)
        return np.concatenate(outs).astype(np.float32)

    def run(self, video_ids, video_dir, out_dir, tracker=None) -> dict:
        return _resumable("audio")(self.extract, video_ids, video_dir, out_dir, tracker)


_WS_RE = re.compile(r"\s+")
_SPECIAL_RE = re.compile(r"[^\w\s\.\,\!\?\-\']")


def clean_text(text: str) -> str:
    """Reference text normalization (text_feature_extractor.py:185-196):
    collapse whitespace, drop everything but word chars / whitespace /
    ``. , ! ? - '``, then strip. Golden-tested bin-for-bin against the
    reference's own code (tests/golden/text_binning.json)."""
    if not text:
        return ""
    return _SPECIAL_RE.sub("", _WS_RE.sub(" ", text)).strip()


def bin_transcript_per_second(
    segments: Sequence[dict], duration_s: int, word_level: bool = False
) -> list[str]:
    """Per-second text bins, reference-exact (text_feature_extractor.py:341-357):
    a segment overlaps second ``s`` iff ``start <= s < end``; each overlapping
    segment's text is clean_text'd, joined with spaces in segment order, and
    the joined string clean_text'd again; '' marks silent (zero-vector)
    seconds. O(S + T) — integer second-ranges per segment instead of the
    reference's per-second scan over all segments.

    ``word_level=True`` (beyond reference; needs segments carrying ``words``
    from the cross-attention aligner, whisper_align.py) bins each WORD into
    the seconds its [start, end) span overlaps — a second gets exactly the
    words spoken during it instead of every segment that merely crosses it.
    Segments without words fall back to segment-level binning."""
    texts: list[list[str]] = [[] for _ in range(duration_s)]
    for seg in segments:
        if word_level and seg.get("words"):
            for w in seg["words"]:
                ws, we = float(w.get("start", 0)), float(w.get("end", 0))
                lo = max(int(np.floor(ws)), 0)
                hi = min(int(np.ceil(we)) if we > ws else lo + 1, duration_s)
                cleaned = clean_text(w.get("word", ""))
                for s in range(lo, hi):
                    texts[s].append(cleaned)
            continue
        start = float(seg.get("start", 0))
        end = float(seg.get("end", 0))
        lo = max(int(np.ceil(start)), 0)  # smallest integer s with s >= start
        hi = min(int(np.ceil(end)), duration_s)  # integers s < end are < ceil(end)
        cleaned = clean_text(seg.get("text", ""))
        for s in range(lo, hi):
            texts[s].append(cleaned)
    return [clean_text(" ".join(ts)) if ts else "" for ts in texts]


class TextExtractor:
    """transcript segments -> (T, 384) MiniLM embeddings (zero rows for
    silent seconds). ASR (whisper) runs host-side via ``transcribe``."""

    def __init__(self, params, tokenizer, batch_size: int = 256, max_tokens: int = 64):
        import jax

        from repurpose_tpu.extractors.minilm import MiniLMEncoder

        import jax.numpy as jnp

        model = MiniLMEncoder()
        # params as a jit argument, device-resident (see VisualExtractor)
        self._vars = {"params": jax.tree.map(jnp.asarray, params)}
        self._encode_p = jax.jit(
            lambda v, ids, mask: model.apply(v, ids, mask)
        )
        self._encode = lambda ids, mask: self._encode_p(self._vars, ids, mask)
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_tokens = max_tokens

    def embed_bins(self, bins: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(bins), 384), np.float32)
        nonempty = [(i, b) for i, b in enumerate(bins) if b]
        for j in range(0, len(nonempty), self.batch_size):
            chunk = nonempty[j : j + self.batch_size]
            enc = self.tokenizer(
                [b for _, b in chunk], padding="max_length", truncation=True,
                max_length=self.max_tokens, return_tensors="np",
            )
            ids = enc["input_ids"]
            mask = enc["attention_mask"]
            n = len(chunk)
            if n < self.batch_size:
                pad = self.batch_size - n
                ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), ids.dtype)])
                mask = np.concatenate(
                    [mask, np.zeros((pad, mask.shape[1]), mask.dtype)]
                )
                mask[n:, 0] = 1  # avoid all-masked rows
            emb = np.asarray(self._encode(ids, mask))[:n]
            for (i, _), e in zip(chunk, emb):
                out[i] = e
        return out

    @staticmethod
    def _transcribe_whisperx(audio_path: str) -> list[dict]:
        """WhisperX transcription with word-level alignment (the reference's
        primary ASR path, text_feature_extractor.py:129-160): base model,
        then the language-specific alignment model refines segment
        timestamps. Optional dependency — callers fall back to plain whisper."""
        import whisperx  # type: ignore

        device = "cpu"
        try:
            import torch

            if torch.cuda.is_available():
                device = "cuda"
        except ImportError:
            pass
        model = whisperx.load_model("base", device)
        audio = whisperx.load_audio(audio_path)
        result = model.transcribe(audio)
        model_a, metadata = whisperx.load_align_model(
            language_code=result["language"], device=device
        )
        aligned = whisperx.align(result["segments"], model_a, metadata, audio, device)
        return [
            {"start": s["start"], "end": s["end"], "text": s["text"]}
            for s in aligned["segments"]
        ]

    @staticmethod
    def transcribe(
        audio_path: str, cache_path: str | None = None, backend: str = "auto",
        asr=None, word_timestamps: bool = False,
    ) -> list[dict]:
        """ASR with transcript JSON caching (reference caches transcripts,
        text_feature_extractor.py:198-236). ``backend``: "auto" tries
        WhisperX (word-aligned timestamps) and falls back to plain whisper —
        the reference's try/except chain (text_feature_extractor.py:292-300);
        "whisperx" / "whisper" force one. Passing ``asr`` (a
        ``extractors.whisper_jax.WhisperASR``) transcribes on TPU instead —
        the all-JAX path, no torch/whisper install needed.
        ONE pass: a fresh video is transcribed AND embedded in the same call —
        the reference needed two runs (its embedding code sits in the
        transcript-already-exists branch, text_feature_extractor.py:310-386)."""
        import json

        if cache_path and os.path.exists(cache_path):
            with open(cache_path) as f:
                cached = json.load(f)
            if (
                word_timestamps
                and asr is not None
                and cached
                and not any("words" in s for s in cached)
            ):
                # cache predates word_timestamps=True: silently returning it
                # would no-op the requested word-level feature — re-transcribe
                logger.info(
                    "transcript cache %s lacks word timestamps; re-transcribing",
                    cache_path,
                )
            else:
                return cached
        segments = None
        if asr is not None:
            segments = asr.transcribe_file(audio_path, word_timestamps=word_timestamps)
        if segments is None and backend in ("auto", "whisperx"):
            try:
                segments = TextExtractor._transcribe_whisperx(audio_path)
            except Exception as e:
                if backend == "whisperx":
                    raise
                logger.info("whisperx unavailable/failed (%s); whisper fallback", e)
        if segments is None:
            try:
                import whisper  # type: ignore
            except ImportError as e:
                raise ImportError(
                    "neither whisperx nor openai-whisper installed; provide "
                    "cached transcripts instead"
                ) from e
            model = whisper.load_model("base")
            result = model.transcribe(audio_path)
            segments = [
                {"start": s["start"], "end": s["end"], "text": s["text"]}
                for s in result["segments"]
            ]
        if cache_path:
            with open(cache_path, "w") as f:
                json.dump(segments, f)
        return segments
