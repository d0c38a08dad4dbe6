"""Static-shape per-video decode: logits -> candidate segments -> Soft-NMS.

Re-derivation of the reference's dynamic-shape decode
(MMCTransformer.inference_single_video, models/MMCTransformer.py:181-229) and
per-video budget logic (inference_, :231-275) as fixed-shape XLA programs:

reference (dynamic)                       here (static, jit/vmap-able)
-----------------------------------      ---------------------------------
boolean filter prob > pre_nms_thresh      invalidate: score -> -1
sort desc + truncate to pre_nms_topk      lax.top_k(K) (K static)
boolean duration filter (compacting)      second top_k pass compacts valid
                                          candidates to the front, preserving
                                          descending-score order, so Soft-NMS
                                          sees the same candidate sequence
CPU numpy Soft-NMS per video              soft_nms_tpu (while_loop, on device)

Everything runs on device under one jit; the host only converts the final
fixed-size (segments, scores, labels, keep) arrays into per-video lists.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from repurpose_tpu.config import TestConfig
from repurpose_tpu.ops.softnms import soft_nms_tpu

Array = jax.Array


class DecodeResult(NamedTuple):
    """Fixed-size per-video results; only entries with keep=True are real."""

    segments: Array  # [K, 2] float32
    scores: Array  # [K] float32
    labels: Array  # [K] int32 — source timestep index (reference 'labels')
    keep: Array  # [K] bool


def max_segments_for_duration(duration: Array, max_seg_per_min: float) -> Array:
    """ceil((duration // 60) * rate) — MMCTransformer.py:255-257 semantics
    (integer floor-division into whole minutes first).

    The reference evaluates the product in float64; a float32 multiply on
    device inflates the budget by 1 for many ordinary durations (e.g.
    50 min * 0.3: f32 gives 15.000001 -> ceil 16, f64 gives 15). ``rate`` is
    a static config float, so it is expressed as an exact rational at trace
    time and the ceil becomes integer arithmetic on device — bit-exact with
    the reference for every practical (minutes, rate)."""
    from fractions import Fraction

    mins = jnp.asarray(duration, jnp.int32) // 60
    frac = Fraction(float(max_seg_per_min)).limit_denominator(10_000)
    p, q = frac.numerator, frac.denominator
    return (mins * p + (q - 1)) // q


def decode_candidates(
    cls_logits: Array,  # [T] float32
    offsets: Array,  # [T, 2] float32
    mask: Array,  # [T] bool
    test_cfg: TestConfig,
) -> tuple[Array, Array, Array, Array]:
    """Candidate generation: threshold, top-k, segment build, duration gates,
    then compaction. Returns (segments [K,2], scores [K], labels [K], valid [K])
    with valid candidates first in descending-score order."""
    t = cls_logits.shape[0]
    k = min(test_cfg.pre_nms_topk, t)

    prob = jax.nn.sigmoid(cls_logits) * mask.astype(jnp.float32)
    gated = jnp.where(prob > test_cfg.pre_nms_thresh, prob, -1.0)
    vals, idx = jax.lax.top_k(gated, k)

    off = offsets[idx]
    left = idx.astype(jnp.float32) - off[:, 0]
    right = idx.astype(jnp.float32) + off[:, 1]
    dur = right - left
    valid = (
        (vals > test_cfg.pre_nms_thresh)
        & (dur > test_cfg.duration_thresh)
        & (dur < test_cfg.duration_thresh_max)
    )

    # Compact: valid candidates to the front, preserving descending-score
    # order (parity with the reference's boolean-mask compaction at
    # MMCTransformer.py:218-220 — Soft-NMS's stale-length quirk is
    # position-dependent, so candidate positions must match).
    compact_key = jnp.where(valid, vals, -1.0)
    _, perm = jax.lax.top_k(compact_key, k)
    vals, idx, left, right, valid = (
        vals[perm], idx[perm], left[perm], right[perm], valid[perm]
    )

    segments = jnp.where(
        valid[:, None], jnp.stack([left, right], axis=-1), 0.0
    )
    scores = jnp.where(valid, vals, 0.0)
    labels = jnp.where(valid, idx, -1).astype(jnp.int32)
    return segments, scores, labels, valid


@functools.partial(jax.jit, static_argnames=("test_cfg",))
def decode_video(
    cls_logits: Array,  # [T] float32
    offsets: Array,  # [T, 2] float32
    mask: Array,  # [T] bool
    duration: Array,  # scalar int — true (unpadded) length in seconds
    test_cfg: TestConfig,
) -> DecodeResult:
    """Full single-video decode + Soft-NMS on device."""
    segments, scores, labels, _ = decode_candidates(cls_logits, offsets, mask, test_cfg)
    max_segs = max_segments_for_duration(duration, test_cfg.max_seg_per_min)
    nms = soft_nms_tpu(
        scores, segments, max_segs,
        sigma=test_cfg.nms_sigma, thresh=test_cfg.min_score,
    )
    # Kept entries carry their ORIGINAL scores: the reference indexes the
    # pre-NMS score tensor with the keep indices (MMCTransformer.py:267-269;
    # the device->CPU copy inside its Soft-NMS means decay never mutates the
    # originals), so decayed scores are internal to the NMS only.
    return DecodeResult(
        segments=segments[nms.orig_idx],
        scores=scores[nms.orig_idx],
        labels=labels[nms.orig_idx],
        keep=nms.keep,
    )


decode_batch = jax.jit(
    jax.vmap(decode_video, in_axes=(0, 0, 0, 0, None)),
    static_argnames=("test_cfg",),
)


def unpack_rows(
    packed: Array,  # [B, T, ...] — model output on a sequence-packed batch
    row_of: Array,  # [N] int32 — packed row holding video i
    start: Array,  # [N] int32 — video i's offset within its row
    length: Array,  # [N] int32 — video i's (truncated) duration
) -> tuple[Array, Array]:
    """Invert sequence packing on device: per-VIDEO rows from packed rows.

    Returns (out [N, T, ...], mask [N, T]) where out[i, p] =
    packed[row_of[i], start[i] + p] for p < length[i] (garbage beyond, masked
    False — downstream decode gates everything on the mask). Packing is
    output-exact per video (block-diagonal attention + per-video PE,
    models/mmct.py), so decode on the unpacked rows matches an unpacked
    batch bit-for-bit. Layout arrays come from data/batching.py:packing_layout;
    callers pad N to a static capacity with length-0 dummies to keep one
    compiled program per (B, T, N)."""
    t = packed.shape[1]
    pos = jnp.arange(t, dtype=jnp.int32)
    idx = jnp.minimum(start[:, None] + pos[None, :], t - 1)  # [N, T]
    rows = packed[row_of]  # [N, T, ...]
    idx = idx.reshape(idx.shape + (1,) * (packed.ndim - 2))
    out = jnp.take_along_axis(rows, idx, axis=1)
    mask = pos[None, :] < length[:, None]
    return out, mask


@functools.partial(jax.jit, static_argnames=("test_cfg",))
def decode_packed(
    cls_logits: Array,  # [B, T] — packed-batch logits (squeeze the head dim)
    offsets: Array,  # [B, T, 2]
    row_of: Array,  # [N] int32 — packing_layout
    start: Array,  # [N]
    length: Array,  # [N]
    test_cfg: TestConfig,
) -> DecodeResult:
    """Per-video decode + Soft-NMS for a sequence-packed batch: unpack the
    packed model outputs to [N, T] per-video rows on device, then run the
    ordinary decode_batch. Length-0 dummy entries (capacity padding) decode to
    keep=all-False. Reference equivalence: each video's result matches
    inference_single_video on that video alone (MMCTransformer.py:181-229);
    packing itself has no reference counterpart."""
    logits_v, mask_v = unpack_rows(cls_logits, row_of, start, length)
    offsets_v, _ = unpack_rows(offsets, row_of, start, length)
    return decode_batch(logits_v, offsets_v, mask_v, length, test_cfg)
