"""Fixed-shape bucketed batching.

The reference pads every batch to its longest sample
(dataset/RepurposeClip.py:449-533), which under XLA would trigger one
compilation per distinct max-length. Here each batch is padded to the
smallest configured *bucket* >= its longest sample, so the whole run compiles
``len(buckets)`` programs and the MXU always sees static shapes.

``Batch`` is the device-facing structure (the reference's collate_fn output
dict, RepurposeClip.py:536-575, minus host-only metadata).
"""

from __future__ import annotations

import logging
from typing import NamedTuple, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class Batch(NamedTuple):
    visual: np.ndarray  # [B, T, vis_dim] float32
    audio: np.ndarray  # [B, T, aud_dim] float32
    text: np.ndarray  # [B, T, text_dim] float32
    mask: np.ndarray  # [B, T] bool
    labels: np.ndarray  # [B, T] float32
    segments: np.ndarray  # [B, T, 2] float32 — per-second GT (left, right)
    durations: np.ndarray  # [B] int32 — true lengths
    # sequence packing (pack_batch; None on ordinary batches): videos sharing
    # a row get block-diagonal attention (seg_ids) and per-video positional
    # encoding (positions) — see models/mmct.py
    seg_ids: np.ndarray | None = None  # [B, T] int32, -1 on padding
    positions: np.ndarray | None = None  # [B, T] int32, 0-based within video


def pick_bucket(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length; sequences longer than the largest bucket are
    truncated to it (the capacity limit the reference expressed via its
    PE max_len=5000, models/MMCTransformer.py:11) — with a warning, so the
    data loss is visible: raise TrainConfig.buckets to cover the corpus."""
    for b in buckets:
        if length <= b:
            return b
    if buckets[-1] not in _truncation_warned:  # once per bucket config, not per batch
        _truncation_warned.add(buckets[-1])
        logger.warning(
            "sequence of length %d exceeds the largest bucket %d and will be "
            "TRUNCATED — add a larger bucket to TrainConfig.buckets to keep the "
            "tail (labels beyond the bucket are dropped; warned once)",
            length, buckets[-1],
        )
    return buckets[-1]


_truncation_warned: set[int] = set()


def collate(
    samples: Sequence[dict], buckets: Sequence[int], batch_size: int | None = None
) -> Batch:
    """Pad a list of per-video sample dicts (keys: visual, audio, text, labels,
    segments — numpy, plus duration int) into one fixed-shape Batch.

    If ``batch_size`` is given the batch dimension is padded up to it with
    all-masked rows, so ragged final batches reuse the same compiled program.
    """
    n = len(samples)
    b = n if batch_size is None else batch_size
    if b < n:
        raise ValueError(
            f"batch_size={batch_size} smaller than the {n} samples given"
        )
    t = pick_bucket(max(s["duration"] for s in samples), buckets)

    def dim(key):
        return samples[0][key].shape[-1]

    visual = np.zeros((b, t, dim("visual")), np.float32)
    audio = np.zeros((b, t, dim("audio")), np.float32)
    text = np.zeros((b, t, dim("text")), np.float32)
    mask = np.zeros((b, t), bool)
    labels = np.zeros((b, t), np.float32)
    segments = np.zeros((b, t, 2), np.float32)
    durations = np.zeros((b,), np.int32)

    for i, s in enumerate(samples):
        ln = min(int(s["duration"]), t)
        # Streams may individually be SHORTER than the sample duration: the
        # duration min deliberately excludes text (reference quirk,
        # RepurposeClip.py:432-437), and the reference pads each stream
        # independently (preprocessing(), :466-485) — so clamp per stream
        # and zero-fill the tail instead of crashing on short text.
        for dst, src in (
            (visual[i], s["visual"]), (audio[i], s["audio"]), (text[i], s["text"]),
            (labels[i], s["labels"]), (segments[i], s["segments"]),
        ):
            n_rows = min(ln, len(src))
            dst[:n_rows] = src[:n_rows]
        mask[i, :ln] = True
        durations[i] = ln
    return Batch(visual, audio, text, mask, labels, segments, durations)


def plan_packing(
    durations: Sequence[int], bucket: int, batch_size: int
) -> list[list[list[int]]]:
    """First-fit-decreasing packing plan: sample indices -> batches of rows.

    Returns ``[batch][row] -> [sample indices]``; every row's total duration
    fits ``bucket`` (videos longer than the bucket truncate to it, as
    pick_bucket would). FFD is within 11/9 of optimal bin count — corpus
    batches at bucket 2048 (mean video ~1218 s) pack ~1.5 videos/row, which
    is the whole win: the reference pads every video to the batch max
    (dataset/RepurposeClip.py:449-533), burning FFN/projection/attention
    compute on ~35% padding."""
    order = sorted(range(len(durations)), key=lambda i: -min(durations[i], bucket))
    rows: list[tuple[int, list[int]]] = []  # (remaining, indices)
    for i in order:
        d = min(int(durations[i]), bucket)
        for slot, (rem, idxs) in enumerate(rows):
            if d <= rem:
                rows[slot] = (rem - d, idxs + [i])
                break
        else:
            rows.append((bucket - d, [i]))
    row_lists = [idxs for _, idxs in rows]
    return [
        row_lists[i : i + batch_size] for i in range(0, len(row_lists), batch_size)
    ]


def pack_batch(
    samples: Sequence[dict], rows: Sequence[Sequence[int]], bucket: int,
    batch_size: int | None = None,
) -> Batch:
    """Pack per-video sample dicts into one fixed-shape Batch of ``rows``
    (index lists from plan_packing). Videos in a row are laid head-to-tail;
    ``seg_ids`` marks each video's span (padding -1) and ``positions``
    restarts at 0 per video, so the model's block-diagonal attention + PE
    gather reproduce EXACTLY the unpacked computation for every video
    (tests/test_packing.py proves loss/grad equality)."""
    n = len(rows)
    b = n if batch_size is None else batch_size
    if b < n:
        raise ValueError(f"batch_size={batch_size} smaller than {n} packed rows")
    t = bucket

    def dim(key):
        return samples[0][key].shape[-1]

    visual = np.zeros((b, t, dim("visual")), np.float32)
    audio = np.zeros((b, t, dim("audio")), np.float32)
    text = np.zeros((b, t, dim("text")), np.float32)
    mask = np.zeros((b, t), bool)
    labels = np.zeros((b, t), np.float32)
    segments = np.zeros((b, t, 2), np.float32)
    durations = np.zeros((b,), np.int32)
    seg_ids = np.full((b, t), -1, np.int32)
    positions = np.zeros((b, t), np.int32)

    has_targets = "labels" in samples[0]  # inference samples carry features only
    for i, idxs in enumerate(rows):
        off = 0
        for seg, j in enumerate(idxs):
            s = samples[j]
            ln = min(int(s["duration"]), t)
            if off + ln > t:
                raise ValueError(
                    f"row {i} overflows bucket {t} (offset {off} + video {ln})"
                )
            streams = [
                (visual[i], s["visual"]), (audio[i], s["audio"]),
                (text[i], s["text"]),
            ]
            if has_targets:
                streams += [(labels[i], s["labels"]), (segments[i], s["segments"])]
            for dst, src in streams:
                n_rows = min(ln, len(src))
                dst[off : off + n_rows] = src[:n_rows]
            mask[i, off : off + ln] = True
            seg_ids[i, off : off + ln] = seg
            positions[i, off : off + ln] = np.arange(ln)
            off += ln
        durations[i] = off
    return Batch(
        visual, audio, text, mask, labels, segments, durations,
        seg_ids=seg_ids, positions=positions,
    )


def packing_layout(
    rows: Sequence[Sequence[int]], durations: Sequence[int], bucket: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-VIDEO (sample_idx, row, start, length) of a pack_batch layout, in
    row-major packed order. Feeds ops/decode.py:unpack_rows, which inverts
    packing on device so the per-video decode sees exactly the rows an
    unpacked batch would; ``sample_idx`` maps each packed position back to
    its index in ``samples``/``durations``."""
    sample_idx, row_of, start, length = [], [], [], []
    for r, idxs in enumerate(rows):
        off = 0
        for i in idxs:
            ln = min(int(durations[i]), bucket)
            sample_idx.append(i)
            row_of.append(r)
            start.append(off)
            length.append(ln)
            off += ln
    return (
        np.asarray(sample_idx, np.int32),
        np.asarray(row_of, np.int32),
        np.asarray(start, np.int32),
        np.asarray(length, np.int32),
    )


def iter_packed_batches(
    fetch, lengths: Sequence[int], buckets: Sequence[int], batch_size: int,
    indices: Sequence[int] | None = None, row_bucket: bool = False,
):
    """FFD sequence packing over a corpus, one packed batch at a time.

    The single source of the packed-batch recipe shared by
    InferencePipeline.score_packed_stream producers (infer.py,
    train/loop.py:Trainer.evaluate, bench.py): group samples by
    smallest-fit bucket, FFD-plan each bucket's rows (plan_packing), pad
    the per-video layout arrays to a STATIC per-bucket capacity (multiple
    of 8) so every batch of a bucket reuses one compiled program, and load
    each batch's samples LAZILY via ``fetch(i)`` — peak host memory is one
    batch, not the corpus.

    ``lengths`` are per-sample durations (index-aligned with ``fetch``;
    e.g. dataset.lengths()); ``indices`` restricts/orders the samples
    (default: all). Yields ``(batch, (row_of, start, length), gidx,
    samples)`` where ``gidx``/``samples`` list the batch's videos in packed
    (row-major) order — gidx are ``fetch`` indices.

    ``row_bucket=True`` pads each batch's ROW count to the smallest power
    of two >= the rows actually used (instead of always ``batch_size``):
    <= log2(batch_size)+1 program shapes per bucket, and a shallow serving
    drain ships 1-2 rows of H2D instead of batch_size (the padded transfer
    dominates per-request latency on network-attached devices). Keep False
    for training — scan/donation want one fixed shape.
    """
    idx = list(range(len(lengths))) if indices is None else list(indices)
    buckets = sorted(buckets)
    groups: dict[int, list[int]] = {}
    for i in idx:
        groups.setdefault(pick_bucket(int(lengths[i]), buckets), []).append(i)
    for bucket in sorted(groups):
        g = groups[bucket]
        durs = [min(int(lengths[i]), bucket) for i in g]
        row_batches = plan_packing(durs, bucket, batch_size)
        # static per-bucket video capacity -> one program per bucket
        cap = max(sum(len(r) for r in rows) for rows in row_batches)
        cap = -(-cap // 8) * 8
        for rows in row_batches:
            needed = sorted({j for row in rows for j in row})
            lmap = {j: k for k, j in enumerate(needed)}
            samples = [fetch(g[j]) for j in needed]
            rows_l = [[lmap[j] for j in row] for row in rows]
            # Placement and layout MUST share one duration source: pack_batch
            # lays videos head-to-tail by each fetched sample's own
            # ``duration``, which can be shorter than the planning ``lengths``
            # (dataset.lengths() is an upper bound — dataset.py:180). Deriving
            # the layout from the planned lengths would shift every later
            # video's unpacked span; use the actual durations for both.
            actual = [min(int(s["duration"]), bucket) for s in samples]
            b = batch_size
            if row_bucket:
                b = 1
                while b < len(rows_l):
                    b *= 2
                b = min(b, batch_size)
            batch = pack_batch(samples, rows_l, bucket, batch_size=b)
            sidx, row_of, start, length = packing_layout(rows_l, actual, bucket)
            pad = cap - len(sidx)
            row_of, start, length = (
                np.pad(a, (0, pad)) for a in (row_of, start, length)
            )
            yield (
                batch,
                (row_of, start, length),
                [g[needed[k]] for k in sidx],
                [samples[k] for k in sidx],
            )
