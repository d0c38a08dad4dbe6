"""End-to-end inference parity: MMCT forward -> decode -> Soft-NMS vs the
reference's inference_ outputs (tests/golden/tiny_inference.json)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repurpose_tpu.config import ModelConfig, TestConfig
from repurpose_tpu.infer import InferencePipeline
from repurpose_tpu.models import convert_reference_state_dict
from repurpose_tpu.ops.decode import max_segments_for_duration

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

TINY_CFG = ModelConfig(
    vis_dim=32, aud_dim=64, text_dim=16, d_model=64,
    self_num_layers=2, num_heads=4, d_ff=128,
    compute_dtype="float32", attention_impl="xla", matmul_precision="highest",
)


def test_inference_pipeline_matches_reference():
    data = np.load(os.path.join(GOLDEN_DIR, "tiny_model.npz"))
    golden = json.load(open(os.path.join(GOLDEN_DIR, "tiny_inference.json")))
    params = convert_reference_state_dict(
        {k[3:]: data[k] for k in data.files if k.startswith("sd/")}, TINY_CFG
    )
    test_cfg = TestConfig(**golden["test_cfg"])
    pipe = InferencePipeline(TINY_CFG, params, test_cfg)
    durations = [r["duration"] for r in golden["results"]]
    results = pipe.score_batch(
        data["visual"], data["audio"], data["text"], data["mask"],
        durations, [r["video_id"] for r in golden["results"]],
    )
    assert len(results) == len(golden["results"])
    for got, want in zip(results, golden["results"]):
        assert got["video_id"] == want["video_id"]
        want_segs = np.asarray(want["segments"], np.float32)
        assert got["segments"].shape == want_segs.shape, (
            f"{got['video_id']}: kept {got['segments'].shape[0]} segments, "
            f"reference kept {want_segs.shape[0]}"
        )
        np.testing.assert_allclose(got["segments"], want_segs, atol=2e-3)
        np.testing.assert_allclose(
            got["scores"], np.asarray(want["scores"], np.float32), atol=1e-4
        )
        np.testing.assert_array_equal(got["labels"], np.asarray(want["labels"]))


@pytest.mark.parametrize(
    "duration,want",
    [(0, 0), (59, 0), (60, 1), (119, 1), (600, 3), (1800, 9)],
)
def test_max_segments_budget(duration, want):
    # ceil((duration // 60) * 0.3) — MMCTransformer.py:255-257.
    got = int(max_segments_for_duration(jnp.asarray(duration), 0.3))
    assert got == want


@pytest.mark.parametrize("rate", [0.3, 0.1, 0.5, 0.7, 1.5])
def test_max_segments_budget_float64_exact(rate):
    """The reference evaluates ceil(mins * rate) in float64; a float32
    multiply inflates the budget by 1 for many common durations (50 min *
    0.3 -> f32 15.000001 -> 16). Sweep every video length up to ~33 h."""
    import math

    mins = np.arange(0, 2001, dtype=np.int64)
    got = np.asarray(max_segments_for_duration(jnp.asarray(mins * 60), rate))
    want = np.asarray([math.ceil(m * np.float64(rate)) for m in mins])
    np.testing.assert_array_equal(got, want)


def test_score_stream_matches_score_batch():
    import numpy as np

    from repurpose_tpu.config import ModelConfig
    from repurpose_tpu.infer import InferencePipeline
    from repurpose_tpu.models import MMCT

    cfg = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
        num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
        attention_impl="xla",
    )
    params = MMCT(cfg).init_params(jax.random.key(0))
    test_cfg = TestConfig(
        pre_nms_topk=64, pre_nms_thresh=0.2, duration_thresh=0.001,
        duration_thresh_max=90, max_seg_per_min=1.0,
    )
    pipe = InferencePipeline(cfg, params, test_cfg)
    rng = np.random.default_rng(0)

    def make(i):
        b, t = 2, 128
        mask = np.zeros((b, t), bool)
        mask[0, :100] = True
        mask[1, :120] = True
        return (
            rng.normal(0, 1, (b, t, 8)).astype(np.float32),
            rng.normal(0, 1, (b, t, 12)).astype(np.float32),
            rng.normal(0, 1, (b, t, 4)).astype(np.float32),
            mask, [100, 120], [f"v{i}a", f"v{i}b"],
        )

    batches = [make(i) for i in range(4)]
    streamed = [r for out in pipe.score_stream(iter(batches)) for r in out]
    direct = [r for bt in batches for r in pipe.score_batch(*bt)]
    assert len(streamed) == len(direct) == 8
    for s, d in zip(streamed, direct):
        assert s["video_id"] == d["video_id"]
        np.testing.assert_array_equal(s["segments"], d["segments"])
        np.testing.assert_array_equal(s["scores"], d["scores"])


def test_score_videos_routes_buckets_and_preserves_order():
    """Serving auto-routing: ragged videos route to the smallest fitting
    bucket, pack into batches, and come back in input order with the same
    values as a direct score_batch at that bucket."""
    from repurpose_tpu.models import MMCT

    cfg = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
        num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
        attention_impl="xla",
    )
    params = MMCT(cfg).init_params(jax.random.key(0))
    test_cfg = TestConfig(
        pre_nms_topk=64, pre_nms_thresh=0.2, duration_thresh=0.001,
        duration_thresh_max=90, max_seg_per_min=1.0,
    )
    pipe = InferencePipeline(cfg, params, test_cfg)
    rng = np.random.default_rng(1)

    lengths = [30, 200, 64, 70, 130, 500]  # 500 > max bucket: truncates
    buckets = (64, 256)
    videos = [
        {
            "visual": rng.normal(0, 1, (t, 8)).astype(np.float32),
            "audio": rng.normal(0, 1, (t, 12)).astype(np.float32),
            "text": rng.normal(0, 1, (t, 4)).astype(np.float32),
            "video_id": f"vid{i}",
        }
        for i, t in enumerate(lengths)
    ]
    results = pipe.score_videos(videos, buckets=buckets, batch_size=2)

    assert [r["video_id"] for r in results] == [f"vid{i}" for i in range(6)]
    assert [r["duration"] for r in results] == [30, 200, 64, 70, 130, 256]

    # values match a direct single-video score_batch at the routed bucket
    for i in (0, 1, 5):
        t = min(lengths[i], 256)
        bucket = 64 if t <= 64 else 256
        vis = np.zeros((1, bucket, 8), np.float32)
        aud = np.zeros((1, bucket, 12), np.float32)
        txt = np.zeros((1, bucket, 4), np.float32)
        mask = np.zeros((1, bucket), bool)
        vis[0, :t] = videos[i]["visual"][:t]
        aud[0, :t] = videos[i]["audio"][:t]
        txt[0, :t] = videos[i]["text"][:t]
        mask[0, :t] = True
        direct = pipe.score_batch(vis, aud, txt, mask, [t], [f"vid{i}"])[0]
        np.testing.assert_array_equal(results[i]["segments"], direct["segments"])
        np.testing.assert_array_equal(results[i]["scores"], direct["scores"])


def test_pipeline_raw_outputs_match_forward():
    """InferencePipeline(raw_outputs=True) must attach the SAME per-second
    logits/offsets a direct forward produces (duration-sliced) — the contract
    that lets Trainer.evaluate's debug figures reuse the decode program's
    forward instead of running a second one."""
    import jax

    from repurpose_tpu.config import ModelConfig
    from repurpose_tpu.infer import InferencePipeline
    from repurpose_tpu.models import build_model, init_model_params

    cfg = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=6, d_model=16, self_num_layers=1,
        num_heads=2, d_ff=32, hidden_dim=8, dropout=0.0,
        compute_dtype="float32", attention_impl="xla",
    )
    model = build_model(cfg)
    params = init_model_params(model, cfg, jax.random.key(0))
    rng = np.random.default_rng(5)
    b, t = 2, 64
    vis = rng.normal(0, 1, (b, t, cfg.vis_dim)).astype(np.float32)
    aud = rng.normal(0, 1, (b, t, cfg.aud_dim)).astype(np.float32)
    txt = rng.normal(0, 1, (b, t, cfg.text_dim)).astype(np.float32)
    mask = np.zeros((b, t), bool)
    durs = np.asarray([64, 40], np.int32)
    for i, d in enumerate(durs):
        mask[i, :d] = True

    tc = TestConfig(pre_nms_topk=16, pre_nms_thresh=0.1, duration_thresh=0.0,
                    duration_thresh_max=90.0, max_seg_per_min=2.0)
    pipe = InferencePipeline(cfg, params, tc, raw_outputs=True)
    results = pipe.score_batch(vis, aud, txt, mask, durs, ["a", "b"])
    fwd = model.apply({"params": params}, vis, aud, txt, mask, True)
    for i, r in enumerate(results):
        d = int(durs[i])
        assert r["raw_logits"].shape == (d,)
        assert r["raw_offsets"].shape == (d, 2)
        # jit vs op-by-op op-order drift ~1e-7; atol also covers exact zeros
        np.testing.assert_allclose(
            r["raw_logits"], np.asarray(fwd.cls_logits)[i, :d, 0],
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            r["raw_offsets"], np.asarray(fwd.offsets)[i, :d],
            rtol=1e-5, atol=1e-5,
        )
    # score_stream carries the same raw fields
    streamed = list(pipe.score_stream(iter([(vis, aud, txt, mask, durs, ["a", "b"])])))
    np.testing.assert_allclose(
        streamed[0][0]["raw_logits"], results[0]["raw_logits"]
    )


def test_score_videos_row_bucketing_value_identical():
    """Row-count bucketing (serving fast path: a drain pads to the smallest
    power-of-two rows, not batch_size — infer.py score_videos) must be
    invisible in the values: scoring 1 or 3 videos at batch_size=4 equals
    scoring them inside a full 4-video drain, unpacked and packed."""
    from repurpose_tpu.models import MMCT

    cfg = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
        num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
        attention_impl="xla",
    )
    params = MMCT(cfg).init_params(jax.random.key(0))
    test_cfg = TestConfig(
        pre_nms_topk=64, pre_nms_thresh=0.2, duration_thresh=0.001,
        duration_thresh_max=90, max_seg_per_min=1.0,
    )
    pipe = InferencePipeline(cfg, params, test_cfg)
    rng = np.random.default_rng(7)
    videos = [
        {
            "visual": rng.normal(0, 1, (t, 8)).astype(np.float32),
            "audio": rng.normal(0, 1, (t, 12)).astype(np.float32),
            "text": rng.normal(0, 1, (t, 4)).astype(np.float32),
            "video_id": f"vid{i}",
        }
        for i, t in enumerate([30, 55, 40, 62])
    ]
    for pack in (False, True):
        full = pipe.score_videos(videos, buckets=(64,), batch_size=4, pack=pack)
        for n in (1, 3):
            sub = pipe.score_videos(
                videos[:n], buckets=(64,), batch_size=4, pack=pack
            )
            assert [r["video_id"] for r in sub] == [f"vid{i}" for i in range(n)]
            for got, ref in zip(sub, full[:n]):
                np.testing.assert_allclose(
                    got["scores"], ref["scores"], rtol=1e-5, atol=1e-6
                )
                np.testing.assert_allclose(
                    got["segments"], ref["segments"], rtol=1e-5, atol=1e-5
                )
