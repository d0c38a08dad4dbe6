"""Word-level timestamps from Whisper's own cross-attention — the TPU-native
replacement for the reference's WhisperX forced aligner.

The reference refines segment timestamps with a second model (wav2vec2 via
``whisperx.align``, preprocessing/text_feature_extractor.py:129-160). That
costs an extra model and a per-language checkpoint. Whisper's decoder already
attends to the audio frame it is transcribing, so word timing is recoverable
from the model itself (the approach of openai-whisper's ``timing`` module):

1. teacher-force the decoded text tokens and read the cross-attention weights
   of the alignment heads — ONE jitted TPU program per (batch, length) bucket
   that returns the finished [tokens, frames] similarity matrix
   (``WhisperDecoder.alignment_matrix``): softmax over content frames,
   per-head column standardization, median filter, head average;
2. DTW the negated matrix for the monotonic token/frame path — native C++
   (csrc/dtw.cc, ~7 ms per chunk vs ~270 ms numpy fallback);
3. group tokens into words and read each word's start/end from the path's
   jump times (20 ms per encoder position).

Alignment heads default to every head of the top half of decoder layers —
openai's fallback for checkpoints without a dumped head list; pass the
checkpoint's known ``alignment_heads`` [(layer, head), ...] for sharper
timings.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from repurpose_tpu.extractors.whisper_jax import (
    HOP,
    N_SAMPLES,
    WhisperDecoder,
    WhisperJaxConfig,
)
from repurpose_tpu.native import dtw_path

SAMPLES_PER_POSITION = HOP * 2  # one encoder position = 2 mel frames = 20 ms
TIME_PER_POSITION = 0.02


def default_alignment_heads(cfg: WhisperJaxConfig) -> list[tuple[int, int]]:
    """All heads of the top half of decoder layers (openai-whisper's fallback
    when a checkpoint ships no alignment-head dump)."""
    return [
        (layer, head)
        for layer in range(cfg.dec_layers // 2, cfg.dec_layers)
        for head in range(cfg.heads)
    ]


def split_words(
    tokens: Sequence[int], decode: Callable[[list[int]], str]
) -> list[tuple[str, int]]:
    """Group text tokens into words -> [(word, n_tokens)], preserving order.

    Uses incremental decoding (a new word starts when the decoded piece opens
    with whitespace), so it works with byte-level BPE vocabularies where a
    single token can be a partial UTF-8 sequence; a piece that decodes to the
    replacement character joins the current word. Space-delimited languages
    only — CJK tokens group into one word per whitespace run (documented
    limitation vs openai's per-script splitter)."""
    words: list[tuple[str, int]] = []
    cur_text, cur_n = "", 0
    pending = 0  # tokens of whitespace-only runs, folded into a neighbor
    prev = ""
    toks = list(tokens)

    def flush() -> None:
        # Token counts must sum to len(tokens) — the aligner indexes jump
        # times by cumulative token position, so a dropped whitespace-only
        # "word" would shift every later word's timing. Fold such runs into
        # the next word (or the previous one at end-of-sequence).
        nonlocal cur_text, cur_n, pending
        if cur_text.strip():
            words.append((cur_text.strip(), cur_n + pending))
            pending = 0
        else:
            pending += cur_n
        cur_text, cur_n = "", 0

    for i in range(len(toks)):
        text = decode(toks[: i + 1])
        piece = text[len(prev) :]
        prev = text
        starts_new = piece.startswith((" ", "\n", "\t")) and piece.strip() != ""
        if cur_n and starts_new:
            flush()
        cur_text += piece
        cur_n += 1
    flush()
    if pending and words:  # trailing whitespace tokens join the last word
        word, n = words[-1]
        words[-1] = (word, n + pending)
    return words


def words_from_matrix(
    matrix: np.ndarray,  # [n_text + 1, content_frames] (text rows + EOT row)
    text_tokens: Sequence[int],
    decode: Callable[[list[int]], str],
    offset_s: float = 0.0,
) -> list[dict]:
    """DTW the similarity matrix -> [{word, start, end}] with absolute times.
    The EOT row supplies the final word's end boundary."""
    n = len(text_tokens)
    if n == 0 or matrix.shape[0] != n + 1 or matrix.shape[1] == 0:
        return []
    ti, tj = dtw_path(-matrix.astype(np.float32))
    # first frame at which the path reaches each token row = that token's start
    jump_times = np.zeros(n + 1, np.float64)
    seen = np.zeros(n + 1, bool)
    for a, b in zip(ti.tolist(), tj.tolist()):
        if not seen[a]:
            seen[a] = True
            jump_times[a] = b * TIME_PER_POSITION
    words = []
    pos = 0
    for word, n_tok in split_words(text_tokens, decode):
        words.append(
            {
                "word": word,
                "start": round(offset_s + jump_times[pos], 2),
                "end": round(offset_s + jump_times[min(pos + n_tok, n)], 2),
                "_n_tokens": n_tok,  # consumed by attach_words
            }
        )
        pos += n_tok
    return words


def attach_words(segments: list[dict], words: list[dict]) -> None:
    """Distribute chunk-level words into their segments (in place) by token
    count: segments carry their text token ids (tokens_to_segments), and the
    words were aligned over the concatenation of exactly those ids."""
    it = iter(words)
    budgets = []
    for seg in segments:
        n = len(seg.get("tokens", ()))
        budgets.append(n)
        seg["words"] = []
    # words consume tokens in order; a word belongs to the segment in which
    # it STARTS (a word can never straddle segments: segment boundaries are
    # timestamp tokens, which never appear mid-word)
    consumed = 0
    boundaries = np.cumsum(budgets)
    for w in it:
        n_tok = w.pop("_n_tokens", 1)
        seg_idx = int(np.searchsorted(boundaries, consumed, side="right"))
        if seg_idx < len(segments):
            segments[seg_idx]["words"].append(w)
        consumed += n_tok


class WhisperAligner:
    """Batched chunk aligner. ``align_block`` pads each row's alignment
    sequence (prompt + <|notimestamps|> + text + EOT) to a shared length
    bucket so a handful of programs cover every chunk shape."""

    def __init__(
        self,
        decoder: WhisperDecoder,
        dec_vars,
        prompt: Sequence[int],
        alignment_heads: Sequence[tuple[int, int]] | None = None,
        token_bucket: int = 64,
    ):
        cfg = decoder.cfg
        self.cfg = cfg
        self.prompt = (*prompt, cfg.no_timestamps)
        self.token_bucket = token_bucket
        head_w = np.zeros((cfg.dec_layers, cfg.heads), np.float32)
        pairs = list(alignment_heads or default_alignment_heads(cfg))
        for layer, head in pairs:
            head_w[layer, head] = 1.0
        head_w /= max(head_w.sum(), 1.0)
        self._head_w = jnp.asarray(head_w)
        # device-resident params: a closed-over numpy tree would be re-baked
        # into every (B, L) specialization AND break tracer indexing
        dec_vars = jax.tree.map(jnp.asarray, dict(dec_vars))
        self._run = jax.jit(
            lambda toks, enc, tv, fv: decoder.apply(
                dec_vars, toks, enc, tv, fv, self._head_w,
                method=WhisperDecoder.alignment_matrix,
            )
        )

    @property
    def text_budget(self) -> int:
        """Max text tokens per aligned row (prompt + text + EOT must fit in
        max_target_positions); callers should clamp before align_block so the
        token list matches the matrix rows."""
        return self.cfg.max_target_positions - len(self.prompt) - 1

    def _bucket_len(self, n: int) -> int:
        b = self.token_bucket
        return min(((n + b - 1) // b) * b, self.cfg.max_target_positions)

    def align_block(
        self,
        rows_text_tokens: Sequence[Sequence[int]],
        enc,  # [B, S, d] encoder states for the same rows
        content_samples: Sequence[int],
        prompt: Sequence[int] | None = None,
    ) -> list[np.ndarray]:
        """-> per row, the [n_text + 1, content_positions] similarity matrix
        (text rows + EOT row), ready for ``words_from_matrix``. ``prompt``
        overrides the constructor's (e.g. a per-video detected language);
        prompt tokens sit in the DYNAMIC tokens array, so no recompile."""
        prompt_seq = tuple(prompt) if prompt is not None else self.prompt
        p = len(prompt_seq)
        b, s = len(rows_text_tokens), enc.shape[1]
        longest = max((len(r) for r in rows_text_tokens), default=0)
        l = self._bucket_len(min(p + longest + 1, self.cfg.max_target_positions))
        tokens = np.full((b, l), self.cfg.eot, np.int32)
        token_valid = np.zeros((b, l), bool)
        frame_valid = np.zeros((b, s), bool)
        n_text = []
        for i, row in enumerate(rows_text_tokens):
            row = list(row)[: l - p - 1]
            n_text.append(len(row))
            tokens[i, :p] = prompt_seq
            tokens[i, p : p + len(row)] = row
            token_valid[i, : p + len(row) + 1] = True  # prompt + text + eot
            pos = max(1, -(-min(int(content_samples[i]), N_SAMPLES) // SAMPLES_PER_POSITION))
            frame_valid[i, : min(pos, s)] = True
        matrix = np.asarray(
            self._run(
                jnp.asarray(tokens), enc, jnp.asarray(token_valid),
                jnp.asarray(frame_valid),
            ),
            np.float32,
        )
        out = []
        for i, n in enumerate(n_text):
            frames = int(frame_valid[i].sum())
            out.append(matrix[i, p : p + n + 1, :frames])
        return out
