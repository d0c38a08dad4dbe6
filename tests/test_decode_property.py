"""Property-based decode parity: the static-shape decode must reproduce a
dynamic-shape numpy transcription of the reference's decode semantics
(MMCTransformer.inference_single_video + per-video Soft-NMS, models/
MMCTransformer.py:181-275) across random inputs and random test configs."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from repurpose_tpu.config import TestConfig
from repurpose_tpu.ops.decode import decode_video, max_segments_for_duration
from repurpose_tpu.ops.softnms import soft_nms_cpu


def reference_decode_numpy(logits, offsets, mask, duration, tc: TestConfig):
    """Dynamic-shape transcription of the reference decode semantics."""
    prob = 1.0 / (1.0 + np.exp(-logits)) * mask
    keep = np.nonzero(prob > tc.pre_nms_thresh)[0]
    vals = prob[keep]
    order = np.argsort(-vals, kind="stable")[: tc.pre_nms_topk]
    idx = keep[order]
    vals = vals[order]
    left = idx - offsets[idx, 0]
    right = idx + offsets[idx, 1]
    dur = right - left
    g = (dur > tc.duration_thresh) & (dur < tc.duration_thresh_max)
    segs = np.stack([left[g], right[g]], axis=-1)
    vals = vals[g]
    idx = idx[g]
    max_segs = int(np.ceil((duration // 60) * tc.max_seg_per_min))
    kept = soft_nms_cpu(
        vals.astype(np.float32), segs.astype(np.float32),
        tc.nms_sigma, tc.min_score, max_segs,
    )
    return segs[kept], vals[kept], idx[kept]


@pytest.mark.parametrize("trial", range(8))
def test_decode_matches_dynamic_reference(rng, trial):
    t = int(rng.integers(80, 400))
    duration = int(rng.integers(60, t + 1))
    mask = np.zeros(t, bool)
    mask[:duration] = True
    logits = rng.normal(0, 2, t).astype(np.float32)
    offsets = np.abs(rng.normal(0, 25, (t, 2))).astype(np.float32)
    tc = TestConfig(
        pre_nms_topk=int(rng.integers(16, 256)),
        pre_nms_thresh=float(rng.uniform(0.2, 0.6)),
        duration_thresh=float(rng.uniform(1.0, 15.0)),
        duration_thresh_max=float(rng.uniform(40.0, 120.0)),
        max_seg_per_min=float(rng.uniform(0.2, 2.0)),
        nms_sigma=float(rng.uniform(0.2, 0.9)),
        min_score=0.01,
    )
    want_segs, want_scores, want_idx = reference_decode_numpy(
        logits, offsets, mask, duration, tc
    )
    res = decode_video(
        jnp.asarray(logits), jnp.asarray(offsets), jnp.asarray(mask),
        jnp.asarray(duration), tc,
    )
    keep = np.asarray(res.keep)
    got_segs = np.asarray(res.segments)[keep]
    got_scores = np.asarray(res.scores)[keep]
    got_idx = np.asarray(res.labels)[keep]
    assert got_segs.shape == want_segs.shape, (trial, got_segs.shape, want_segs.shape)
    np.testing.assert_allclose(got_segs, want_segs, atol=1e-4)
    np.testing.assert_allclose(got_scores, want_scores, atol=1e-5)
    np.testing.assert_array_equal(got_idx, want_idx)


def test_budget_formula_sweep():
    for d in (0, 59, 60, 61, 119, 120, 3599, 7200):
        for rate in (0.3, 0.5, 1.0):
            want = int(np.ceil((d // 60) * rate))
            got = int(max_segments_for_duration(jnp.asarray(d), rate))
            assert got == want, (d, rate)


# ---- hypothesis edge-geometry sweep -----------------------------------------
# Beyond the random-config trials above: tie-dense logits (top-k ordering must
# match torch.topk's), scores exactly AT pre_nms_thresh (strict >,
# MMCTransformer.py:192), durations exactly AT the gates (strict > and <,
# MMCTransformer.py:213-217), empty decodes, and zero segment budgets
# (duration < 60 s -> ceil(0 * rate) = 0, MMCTransformer.py:255-257).

from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def edge_video(draw):
    t = draw(st.integers(4, 96))
    duration = draw(st.sampled_from([t, max(1, t - 3), 59, 60, 61]))
    duration = min(duration, t)
    # quantized logits force score ties; level 0.0 sits exactly at a
    # pre_nms_thresh of sigmoid(0)=0.5
    levels = draw(
        st.lists(st.sampled_from([-4.0, -1.0, 0.0, 0.5, 2.0]), min_size=1, max_size=3)
    )
    logits = np.asarray(
        [draw(st.sampled_from(levels)) for _ in range(t)], np.float32
    )
    # offsets from a tiny set so segment durations land exactly on the gates
    off_levels = [0.0, 1.0, 5.0, 20.0, 45.0]
    offsets = np.asarray(
        [[draw(st.sampled_from(off_levels)), draw(st.sampled_from(off_levels))]
         for _ in range(t)],
        np.float32,
    )
    return t, duration, logits, offsets


@given(
    vid=edge_video(),
    thresh=st.sampled_from([0.5, 0.62]),
    dmin=st.sampled_from([10.0, 0.0]),
    dmax=st.sampled_from([40.0, 90.0]),
)
@settings(max_examples=60, deadline=None)
def test_decode_edge_geometry_matches_dynamic_reference(vid, thresh, dmin, dmax):
    t, duration, logits, offsets = vid
    mask = np.zeros(t, bool)
    mask[:duration] = True
    tc = TestConfig(
        pre_nms_topk=32, pre_nms_thresh=thresh,
        duration_thresh=dmin, duration_thresh_max=dmax,
        max_seg_per_min=0.3, nms_sigma=0.5, min_score=0.01,
    )
    want_segs, want_scores, want_idx = reference_decode_numpy(
        logits, offsets, mask, duration, tc
    )
    res = decode_video(
        jnp.asarray(logits), jnp.asarray(offsets), jnp.asarray(mask),
        jnp.asarray(duration), tc,
    )
    keep = np.asarray(res.keep)
    got_segs = np.asarray(res.segments)[keep]
    got_scores = np.asarray(res.scores)[keep]
    got_idx = np.asarray(res.labels)[keep]
    assert got_segs.shape == want_segs.shape
    np.testing.assert_allclose(got_segs, want_segs, atol=1e-4)
    np.testing.assert_allclose(got_scores, want_scores, atol=1e-5)
    np.testing.assert_array_equal(got_idx, want_idx)
