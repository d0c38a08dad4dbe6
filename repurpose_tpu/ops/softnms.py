"""Gaussian Soft-NMS over 1-D intervals.

Two implementations with identical selection semantics:

- ``soft_nms_cpu``: a numpy oracle matching the reference's CPU Soft-NMS
  (models/softnms.py:3-38) **including its behavioral quirks**, kept as the
  parity test oracle;
- ``soft_nms_tpu``: a static-shape JAX formulation that runs under ``jit`` on
  padded candidate arrays, with early exit via ``lax.while_loop`` — the loop
  terminates after ~``max_seg_num`` iterations instead of scanning all K
  candidates, so the on-device cost is O(max_seg_num * K) vector work.

Reference quirks reproduced by BOTH implementations (verified by the parity
test suite):
1. the selection counter tests the score at slot i *before* the swap-to-front
   (softnms.py:18-27: ``tscore = scores[i]`` is read before the conditional
   swap, so the threshold check uses the pre-swap value);
2. interval lengths are computed once up front and indexed by *position*, not
   swapped along with the intervals (softnms.py:13: ``lengths = end - begin``
   makes a copy while ``begin``/``end`` remain views), so after any swap the
   union denominator uses stale lengths;
3. the loop breaks as soon as ``max_seg_num`` candidates pass the threshold,
   *before* applying decay for that pivot (softnms.py:26-29);
4. the kept set is "score still > thresh" in post-swap array order, truncated
   to ``max_seg_num`` (softnms.py:37).

The stale-lengths quirk can also drive the union denominator to zero or
below. The reference's arithmetic there is reproduced faithfully: a NEGATIVE
denominator still yields a finite decay weight exp(-(overlap/total)^2/sigma)
(the candidate usually survives), and a zero denominator with positive
overlap yields ratio inf -> weight exactly 0. ONE documented deviation
(PARITY.md): the 0/0 case (zero overlap AND zero denominator), where the
reference NaN-poisons the score (permanently dropping the candidate, with
NaN then leaking into later argmax calls); all implementations here set the
weight to 0 instead — same terminal drop, no NaN propagation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def soft_nms_cpu(
    scores: np.ndarray,
    segments: np.ndarray,
    sigma: float = 0.5,
    thresh: float = 0.001,
    max_seg_num: int = 20,
) -> np.ndarray:
    """Numpy oracle. Returns original-candidate indices kept, in output order.

    Args:
      scores: (N,) float scores.
      segments: (N, 2) float (begin, end) intervals.
    """
    # float32 throughout: the reference's whole decay loop runs on float32
    # numpy arrays (torch .numpy() output), and near-threshold decays /
    # argmax orderings are precision-sensitive
    scores = np.asarray(scores, dtype=np.float32).copy()
    segments = np.asarray(segments, dtype=np.float32).copy()
    n = segments.shape[0]
    orig_idx = np.arange(n, dtype=np.int64)

    begin = segments[:, 0]
    end = segments[:, 1]
    lengths = (end - begin).copy()  # position-indexed; never swapped (quirk 2)

    max_segments = min(max_seg_num, n)
    selected = 0
    for i in range(n):
        tscore = scores[i]  # pre-swap (quirk 1)
        pos = i + 1
        if i != n - 1:
            maxpos = int(np.argmax(scores[pos:]))
            if tscore < scores[pos + maxpos]:
                j = pos + maxpos
                segments[[i, j]] = segments[[j, i]]
                scores[[i, j]] = scores[[j, i]]
                orig_idx[[i, j]] = orig_idx[[j, i]]
        if tscore > thresh:
            selected += 1
            if selected >= max_segments:
                break  # quirk 3: no decay for this pivot
        overlap = np.clip(np.minimum(end[i], end[pos:]) - np.maximum(begin[i], begin[pos:]), 0.0, None)
        total = lengths[i] + lengths[pos:] - overlap
        # The stale-lengths quirk makes total <= 0 reachable. The reference
        # computes exp(-(overlap/total)^2 / sigma) regardless: total < 0
        # gives a FINITE decay weight (negative ratio, positive square);
        # total == 0 with overlap > 0 gives ratio inf -> weight exactly 0.
        # Only 0/0 (both zero) NaN-poisons the reference's scores; weight 0
        # there reproduces the terminal drop NaN-free (documented deviation,
        # PARITY.md).
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = overlap / total
            weight = np.exp(-(ratio * ratio) / sigma)
        scores[pos:] *= np.where(np.isnan(weight), 0.0, weight)

    keep_positions = np.nonzero(scores > thresh)[0][:max_segments]
    return orig_idx[keep_positions]


class SoftNMSResult(NamedTuple):
    """Static-shape result: position-ordered candidates after the NMS pass."""

    orig_idx: Array  # [K] int32 — original candidate index at each position
    scores: Array  # [K] float32 — decayed scores, post-swap position order
    keep: Array  # [K] bool — kept (score > thresh, within max_seg_num budget)


@functools.partial(jax.jit, static_argnames=("sigma", "thresh"))
def soft_nms_tpu(
    scores: Array,
    segments: Array,
    max_seg_num: Array | int,
    sigma: float = 0.5,
    thresh: float = 0.001,
) -> SoftNMSResult:
    """Static-shape Soft-NMS for TPU. Padded candidates must carry score 0 and
    segment (0, 0); they never decay real candidates (zero overlap) and are
    never selected (0 < thresh). ``max_seg_num`` may be a traced scalar, so one
    compiled program serves every per-video budget (MMCTransformer.py:255-257
    derives it from video length at runtime).
    """
    k = scores.shape[0]
    scores = scores.astype(jnp.float32)
    begin0 = segments[:, 0].astype(jnp.float32)
    end0 = segments[:, 1].astype(jnp.float32)
    lengths = end0 - begin0  # position-indexed, never swapped (quirk 2)
    pos_ids = jnp.arange(k, dtype=jnp.int32)
    max_segments = jnp.minimum(jnp.asarray(max_seg_num, jnp.int32), k)

    def cond(state):
        i, _, _, _, _, selected, done = state
        return (i < k) & ~done

    def body(state):
        i, s, b, e, idx, selected, done = state
        tscore = s[i]  # pre-swap (quirk 1)
        tail = pos_ids > i
        tail_scores = jnp.where(tail, s, -jnp.inf)
        j = jnp.argmax(tail_scores).astype(jnp.int32)
        do_swap = (i < k - 1) & (tscore < tail_scores[j])

        def swap(a):
            ai, aj = a[i], a[j]
            a = a.at[i].set(jnp.where(do_swap, aj, ai))
            return a.at[j].set(jnp.where(do_swap, ai, aj))

        s, b, e, idx = swap(s), swap(b), swap(e), swap(idx)

        hit = tscore > thresh
        selected = selected + hit.astype(jnp.int32)
        done = hit & (selected >= max_segments)  # quirk 3

        overlap = jnp.clip(jnp.minimum(e[i], e) - jnp.maximum(b[i], b), 0.0, None)
        total = lengths[i] + lengths - overlap
        # Reference weight semantics incl. total < 0 (finite) and total == 0
        # with overlap > 0 (exactly 0); only 0/0 deviates (NaN -> 0, PARITY.md)
        ratio = overlap / total  # IEEE: x/0 = inf, 0/0 = nan
        weight = jnp.exp(-(ratio * ratio) / sigma)
        weight = jnp.where(jnp.isnan(weight), 0.0, weight)
        s = jnp.where(tail & ~done, s * weight, s)
        # Early exit once no tail candidate can still pass the threshold:
        # later pivots would be <= thresh (never counted) and decay only
        # shrinks scores further, so the keep set is already final. Saves
        # O(K) iterations when few candidates clear the threshold.
        no_tail_left = ~jnp.any(jnp.where(pos_ids > i, s, 0.0) > thresh)
        done = done | no_tail_left
        return i + 1, s, b, e, idx, selected, done

    init = (
        jnp.int32(0),
        scores,
        begin0,
        end0,
        pos_ids,
        jnp.int32(0),
        jnp.bool_(False),
    )
    _, s, _, _, idx, _, _ = jax.lax.while_loop(cond, body, init)

    passing = s > thresh
    rank = jnp.cumsum(passing.astype(jnp.int32))
    keep = passing & (rank <= max_segments)  # quirk 4
    return SoftNMSResult(orig_idx=idx, scores=s, keep=keep)
