"""Property-based Soft-NMS edge-geometry tests (hypothesis).

All three implementations — numpy oracle (the reference-parity anchor,
golden-tested against /root/reference's own code), on-device while_loop, and
native C++ — must agree on ARBITRARY candidate geometry, including the cases
random benchmarks rarely hit: inverted segments (end < begin -> negative
lengths through the stale-lengths quirk), negative coordinates, duplicate
intervals, ties, and tiny/huge scales. The TPU version additionally runs on
PADDED arrays exactly as production decode calls it (ops/decode.py), so the
padding-neutrality invariant is exercised at the same time.

Exactly-zero-length segments are excluded: a (0, 0) padding pivot 0/0-decays
a real zero-length candidate (weight 0, the documented NaN deviation), which
is a padding artifact production can't hit (decode's min-duration gate) —
see PARITY.md.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from repurpose_tpu import native
from repurpose_tpu.ops.softnms import soft_nms_cpu, soft_nms_tpu

PAD_K = 32


def _finite(lo, hi):
    return st.floats(
        min_value=lo, max_value=hi, allow_nan=False, allow_infinity=False
    )


@st.composite
def candidates(draw):
    n = draw(st.integers(1, 24))
    scores = np.asarray(
        [draw(_finite(0.0, 1.0)) for _ in range(n)], np.float32
    )
    begins = np.asarray(
        [draw(_finite(-50.0, 150.0)) for _ in range(n)], np.float32
    )
    lengths = np.asarray(
        [draw(_finite(-20.0, 120.0)) for _ in range(n)], np.float32
    )
    # exclude exactly/near-zero lengths (module docstring): clamp to +-1e-3
    lengths = np.where(
        np.abs(lengths) < 1e-3,
        np.where(lengths >= np.float32(-0.5e-3), np.float32(1e-3), np.float32(-1e-3)),
        lengths,
    ).astype(np.float32)
    segs = np.stack([begins, begins + lengths], axis=1)
    return scores, segs


@given(
    cand=candidates(),
    sigma=st.sampled_from([0.2, 0.5]),
    thresh=st.sampled_from([0.001, 0.05]),
    max_seg=st.integers(1, 12),
)
@settings(max_examples=120, deadline=None)
def test_oracle_tpu_native_agree_on_arbitrary_geometry(
    cand, sigma, thresh, max_seg
):
    scores, segs = cand
    n = len(scores)
    keep_cpu = soft_nms_cpu(scores, segs, sigma, thresh, max_seg)

    # TPU path on production-style padded arrays (fixed K -> few compiles)
    pscores = np.zeros(PAD_K, np.float32)
    psegs = np.zeros((PAD_K, 2), np.float32)
    pscores[:n] = scores
    psegs[:n] = segs
    res = soft_nms_tpu(
        jnp.asarray(pscores), jnp.asarray(psegs), max_seg,
        sigma=sigma, thresh=thresh,
    )
    keep_tpu = np.asarray(res.orig_idx)[np.asarray(res.keep)]
    keep_tpu = keep_tpu[keep_tpu < n]  # padding never kept, but be explicit
    np.testing.assert_array_equal(keep_cpu, keep_tpu)

    if native.available():
        keep_native = native.soft_nms_native(scores, segs, sigma, thresh, max_seg)
        np.testing.assert_array_equal(keep_cpu, keep_native)

    # structural invariants regardless of geometry
    assert len(keep_cpu) <= min(max_seg, n)
    assert len(set(keep_cpu.tolist())) == len(keep_cpu)
    assert ((keep_cpu >= 0) & (keep_cpu < n)).all()


@given(cand=candidates())
@settings(max_examples=40, deadline=None)
def test_padding_is_neutral(cand):
    """Extra all-zero padding rows must never change the kept set."""
    scores, segs = cand
    n = len(scores)
    outs = []
    for pad_k in (n, PAD_K, PAD_K * 2):
        pscores = np.zeros(pad_k, np.float32)
        psegs = np.zeros((pad_k, 2), np.float32)
        pscores[:n] = scores
        psegs[:n] = segs
        res = soft_nms_tpu(
            jnp.asarray(pscores), jnp.asarray(psegs), 10, sigma=0.5, thresh=0.01
        )
        kept = np.asarray(res.orig_idx)[np.asarray(res.keep)]
        outs.append(kept[kept < n])
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[1], outs[2])


@pytest.mark.parametrize("n", [1, 2])
def test_duplicate_identical_candidates(n):
    """All-identical intervals: the first (post-swap) survives, the rest
    decay by exp(-1/sigma) each round — agreement incl. the native path."""
    scores = np.full(8, 0.9, np.float32)
    segs = np.tile(np.asarray([[10.0, 20.0]], np.float32), (8, 1))
    keep_cpu = soft_nms_cpu(scores, segs, 0.5, 0.01, 8)
    if native.available():
        keep_native = native.soft_nms_native(scores, segs, 0.5, 0.01, 8)
        np.testing.assert_array_equal(keep_cpu, keep_native)
    res = soft_nms_tpu(jnp.asarray(scores), jnp.asarray(segs), 8, sigma=0.5, thresh=0.01)
    keep_tpu = np.asarray(res.orig_idx)[np.asarray(res.keep)]
    np.testing.assert_array_equal(keep_cpu, keep_tpu)
