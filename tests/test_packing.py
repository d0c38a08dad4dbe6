"""Sequence packing: several videos share one row (block-diagonal attention
+ per-video positional encoding), recovering the ~35% bucket padding the
reference burns on every batch (dataset/RepurposeClip.py:449-533 pads all
videos to the batch max; it has no packing).

The load-bearing claim is EXACTNESS: a packed batch must produce the same
loss and the same parameter gradients as the equivalent unpacked batch —
packing is a layout change, not a model change. Proven here at fp32/highest
for both attention implementations (XLA einsum and the Pallas kernels in
interpret mode — the same code the TPU compiles)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repurpose_tpu.config import ModelConfig, TrainConfig
from repurpose_tpu.data.batching import Batch, collate, pack_batch, plan_packing
from repurpose_tpu.models import build_model, init_model_params
from repurpose_tpu.train.step import _loss_fn


def _samples(rng, lengths, vis=8, aud=12, text=6):
    out = []
    for ln in lengths:
        out.append({
            "visual": rng.normal(0, 1, (ln, vis)).astype(np.float32),
            "audio": rng.normal(0, 1, (ln, aud)).astype(np.float32),
            "text": rng.normal(0, 1, (ln, text)).astype(np.float32),
            "labels": (rng.uniform(size=ln) < 0.3).astype(np.float32),
            "segments": np.abs(rng.normal(0, 5, (ln, 2))).astype(np.float32),
            "duration": ln,
        })
    return out


def test_plan_packing_partitions_and_fits():
    durations = [700, 400, 900, 300, 1200, 100, 600, 2048, 2500]
    plan = plan_packing(durations, bucket=2048, batch_size=2)
    seen = sorted(i for batch in plan for row in batch for i in row)
    assert seen == list(range(len(durations)))  # every video exactly once
    for batch in plan:
        assert len(batch) <= 2
        for row in batch:
            assert sum(min(durations[i], 2048) for i in row) <= 2048


def test_pack_batch_layout():
    rng = np.random.default_rng(0)
    samples = _samples(rng, [60, 40, 50])
    batch = pack_batch(samples, rows=[[0, 1], [2]], bucket=128, batch_size=2)
    # row 0: video 0 at [0, 60), video 1 at [60, 100)
    assert batch.seg_ids[0, 0] == 0 and batch.seg_ids[0, 59] == 0
    assert batch.seg_ids[0, 60] == 1 and batch.seg_ids[0, 99] == 1
    assert batch.seg_ids[0, 100] == -1
    assert batch.positions[0, 60] == 0 and batch.positions[0, 99] == 39
    np.testing.assert_array_equal(batch.visual[0, 60:100], samples[1]["visual"])
    np.testing.assert_array_equal(batch.labels[0, :60], samples[0]["labels"])
    assert batch.mask[0, :100].all() and not batch.mask[0, 100:].any()
    assert batch.durations[0] == 100 and batch.durations[1] == 50
    # row overflow is an error, not silent truncation
    with pytest.raises(ValueError):
        pack_batch(samples, rows=[[0, 1, 2]], bucket=128)


@pytest.mark.parametrize("impl", ["xla", "pallas_full"])
def test_packed_equals_unpacked_loss_and_grads(impl):
    """The exactness proof: same videos, packed [2 rows] vs unpacked
    [3 rows], identical loss and parameter grads (fp32, dropout 0, same
    config batch size so the loss normalization matches)."""
    cfg = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=6, d_model=32,
        self_num_layers=2, num_heads=2, d_ff=64, hidden_dim=16, dropout=0.0,
        compute_dtype="float32", attention_impl=impl,
        matmul_precision="highest", attn_softmax_dtype="float32",
    )
    tc = TrainConfig(batch_size=3, buckets=(128,))
    rng = np.random.default_rng(1)
    samples = _samples(rng, [60, 40, 50])

    unpacked = collate(samples, buckets=(128,), batch_size=3)
    packed = pack_batch(
        samples, plan_packing([60, 40, 50], 128, 3)[0], bucket=128, batch_size=3
    )
    assert packed.seg_ids is not None and (packed.seg_ids >= 1).any()

    model = build_model(cfg)
    params = init_model_params(model, cfg, jax.random.key(0), bucket=128)
    key = jax.random.key(1)

    @jax.jit
    def loss_and_grads(p, batch):
        return jax.value_and_grad(
            lambda pp: _loss_fn(model, tc, pp, batch, key, True)[0]
        )(p)

    lu, gu = loss_and_grads(params, unpacked)
    lp, gp = loss_and_grads(params, packed)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-6)
    flat_u = jax.tree_util.tree_leaves(gu)
    flat_p = jax.tree_util.tree_leaves(gp)
    for a, b in zip(flat_p, flat_u):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


class _ListDataset:
    def __init__(self, samples):
        self.samples = samples

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]

    def lengths(self):
        return [s["duration"] for s in self.samples]


def test_loader_pack_covers_every_video_once():
    from repurpose_tpu.data.loader import BatchLoader

    rng = np.random.default_rng(3)
    lengths = [60, 40, 50, 100, 128, 30, 90, 70, 20, 110]
    ds = _ListDataset(_samples(rng, lengths))
    loader = BatchLoader(ds, batch_size=2, buckets=(64, 128), seed=7, pack=True)
    seen = 0
    for batch in loader.epoch(0):
        assert batch.seg_ids is not None
        assert batch.visual.shape[:2] == (2, 128)  # rows pad to batch_size
        # every valid position belongs to a segment and vice versa
        np.testing.assert_array_equal(batch.seg_ids >= 0, batch.mask)
        seen += int((np.diff(batch.seg_ids, axis=1) > 0).sum()) + int(
            (batch.seg_ids[:, 0] >= 0).sum()
        )
    assert seen == len(lengths)


def test_loader_pack_multiprocess_shards_agree():
    """Two simulated processes see the same global plan, disjoint rows."""
    from repurpose_tpu.data.loader import BatchLoader

    rng = np.random.default_rng(4)
    lengths = [60, 40, 50, 100, 128, 30, 90, 70]
    ds = _ListDataset(_samples(rng, lengths))
    loaders = [
        BatchLoader(ds, batch_size=1, buckets=(128,), seed=5, pack=True,
                    process_index=p, process_count=2)
        for p in range(2)
    ]
    counts = [len(list(l.epoch(0))) for l in loaders]
    assert counts[0] == counts[1]  # same global batch count on both hosts


def test_trainer_fits_packed(tmp_path):
    """End-to-end: Trainer with pack_sequences=True trains an epoch, loss
    finite, n steps match the packed plan (fewer steps than unpacked)."""
    from repurpose_tpu.config import Config, MeshConfig, TestConfig
    from repurpose_tpu.data.synthetic import SyntheticDataset
    from repurpose_tpu.train.loop import Trainer

    model = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
        num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
        attention_impl="xla",
    )
    cfg = Config(
        model=model,
        train=TrainConfig(
            batch_size=2, buckets=(128,), epochs=1, save_epochs=5,
            eval_freq=0, intra_epoch_eval_freq=0, lr=1e-3,
            pack_sequences=True, loss_norm="batch_size",
        ),
        mesh=MeshConfig(data=1),
        test_cfg=TestConfig(),
    )
    ds = SyntheticDataset([100, 90, 60, 40, 30, 20], model, seed=1)
    trainer = Trainer(cfg, str(tmp_path), ds)
    # 6 videos / FFD into 128-length rows -> fewer rows than videos
    assert trainer.steps_per_epoch < (len(ds) + 1) // 2
    trainer.fit()
    assert int(trainer.state.step) == trainer.steps_per_epoch
    assert int(trainer.state.nonfinite_count) == 0


def test_unpack_rows_inverts_packing():
    from repurpose_tpu.data.batching import packing_layout
    from repurpose_tpu.ops.decode import unpack_rows

    rng = np.random.default_rng(5)
    durs = [60, 40, 50]
    rows = plan_packing(durs, bucket=128, batch_size=2)[0]
    sidx, row_of, start, length = packing_layout(rows, durs, 128)
    # fabricate a packed [B, T, 2] output and check per-video recovery
    packed = rng.normal(0, 1, (len(rows), 128, 2)).astype(np.float32)
    out, mask = jax.jit(unpack_rows)(
        jnp.asarray(packed), jnp.asarray(row_of), jnp.asarray(start),
        jnp.asarray(length),
    )
    out, mask = np.asarray(out), np.asarray(mask)
    for n in range(len(sidx)):
        ln = length[n]
        np.testing.assert_array_equal(
            out[n, :ln], packed[row_of[n], start[n] : start[n] + ln]
        )
        assert mask[n, :ln].all() and not mask[n, ln:].any()


def test_decode_packed_matches_per_video_decode():
    """decode_packed on a packed layout == decode_batch on the equivalent
    unpacked per-video rows, bit-for-bit — incl. length-0 capacity dummies
    (keep all-False)."""
    from repurpose_tpu.config import TestConfig
    from repurpose_tpu.data.batching import packing_layout
    from repurpose_tpu.ops.decode import decode_batch, decode_packed

    rng = np.random.default_rng(6)
    durs = [60, 40, 50, 110]
    bucket = 128
    rows = plan_packing(durs, bucket, batch_size=3)[0]
    sidx, row_of, start, length = packing_layout(rows, durs, bucket)
    tcfg = TestConfig(pre_nms_thresh=0.3, pre_nms_topk=16, min_score=0.01)

    b = len(rows)
    logits = rng.normal(0, 2, (b, bucket)).astype(np.float32)
    offsets = np.abs(rng.normal(0, 5, (b, bucket, 2))).astype(np.float32)

    # capacity padding: two length-0 dummies beyond the real videos
    pad = 2
    res = decode_packed(
        jnp.asarray(logits), jnp.asarray(offsets),
        jnp.asarray(np.pad(row_of, (0, pad))),
        jnp.asarray(np.pad(start, (0, pad))),
        jnp.asarray(np.pad(length, (0, pad))),
        tcfg,
    )
    assert not np.asarray(res.keep)[len(sidx):].any()

    # equivalent unpacked rows, decoded per video
    n = len(sidx)
    logits_v = np.zeros((n, bucket), np.float32)
    offsets_v = np.zeros((n, bucket, 2), np.float32)
    mask_v = np.zeros((n, bucket), bool)
    for i in range(n):
        r, s, ln = row_of[i], start[i], length[i]
        logits_v[i, :ln] = logits[r, s : s + ln]
        offsets_v[i, :ln] = offsets[r, s : s + ln]
        mask_v[i, :ln] = True
    ref = decode_batch(
        jnp.asarray(logits_v), jnp.asarray(offsets_v), jnp.asarray(mask_v),
        jnp.asarray(length), tcfg,
    )
    for a, b_ in zip(res[:4], ref[:4]):
        np.testing.assert_array_equal(np.asarray(a)[:n], np.asarray(b_))


def test_score_videos_packed_matches_unpacked():
    """End-to-end pipeline parity: score_videos(pack=True) returns the same
    per-video segments/scores/labels as pack=False (fp32, xla attention)."""
    from repurpose_tpu.config import TestConfig
    from repurpose_tpu.infer import InferencePipeline
    from repurpose_tpu.models import init_model_params

    cfg = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=6, d_model=32,
        self_num_layers=2, num_heads=2, d_ff=64, hidden_dim=16, dropout=0.0,
        compute_dtype="float32", attention_impl="xla",
        matmul_precision="highest",
    )
    tcfg = TestConfig(pre_nms_thresh=0.3, pre_nms_topk=16, min_score=0.01)
    model = build_model(cfg)
    params = init_model_params(model, cfg, jax.random.key(0), bucket=64)
    rng = np.random.default_rng(7)
    videos = []
    for i, ln in enumerate([60, 40, 50, 110, 25, 90, 30]):
        videos.append({
            "visual": rng.normal(0, 1, (ln, 8)).astype(np.float32) * 2,
            "audio": rng.normal(0, 1, (ln, 12)).astype(np.float32),
            "text": rng.normal(0, 1, (ln, 6)).astype(np.float32),
            "video_id": f"v{i}",
        })
    pipe = InferencePipeline(cfg, params, tcfg)
    ref = pipe.score_videos(videos, buckets=(64, 128), batch_size=2)
    got = pipe.score_videos(videos, buckets=(64, 128), batch_size=2, pack=True)
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert g["video_id"] == r["video_id"]
        assert g["duration"] == r["duration"]
        np.testing.assert_allclose(g["segments"], r["segments"], atol=1e-5)
        np.testing.assert_allclose(g["scores"], r["scores"], atol=1e-5)
        np.testing.assert_array_equal(g["labels"], r["labels"])


def test_score_videos_packed_long_bucket(monkeypatch):
    """Videos routing to buckets past STREAM_MAX_T pack too (the packed
    streaming/HBM kernels take over there — ops/flash_attention.py), and
    every video's packed result is identical to its unpacked one."""
    import repurpose_tpu.ops.flash_attention as fa
    from repurpose_tpu.config import TestConfig
    from repurpose_tpu.infer import InferencePipeline
    from repurpose_tpu.models import init_model_params

    monkeypatch.setattr(fa, "STREAM_MAX_T", 64)  # bucket 128 is now "long"
    cfg = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=6, d_model=32,
        self_num_layers=1, num_heads=2, d_ff=64, hidden_dim=16, dropout=0.0,
        compute_dtype="float32", attention_impl="xla",
        matmul_precision="highest",
    )
    tcfg = TestConfig(pre_nms_thresh=0.3, pre_nms_topk=16, min_score=0.01)
    model = build_model(cfg)
    params = init_model_params(model, cfg, jax.random.key(0), bucket=64)
    rng = np.random.default_rng(7)
    videos = []
    for i, ln in enumerate([30, 20, 110, 25, 90]):  # 110/90 -> bucket 128
        videos.append({
            "visual": rng.normal(0, 1, (ln, 8)).astype(np.float32) * 2,
            "audio": rng.normal(0, 1, (ln, 12)).astype(np.float32),
            "text": rng.normal(0, 1, (ln, 6)).astype(np.float32),
            "video_id": f"v{i}",
        })
    pipe = InferencePipeline(cfg, params, tcfg)
    ref = pipe.score_videos(videos, buckets=(64, 128), batch_size=2)
    got = pipe.score_videos(videos, buckets=(64, 128), batch_size=2, pack=True)
    assert [g["video_id"] for g in got] == [r["video_id"] for r in ref]
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g["segments"], r["segments"], atol=1e-5)
        np.testing.assert_allclose(g["scores"], r["scores"], atol=1e-5)


def test_packed_metrics_count_videos():
    """n_real counts packed SEGMENTS (videos), not rows."""
    cfg = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=6, d_model=32,
        self_num_layers=1, num_heads=2, d_ff=64, hidden_dim=16, dropout=0.0,
        compute_dtype="float32", attention_impl="xla",
    )
    tc = TrainConfig(batch_size=3, buckets=(128,))
    rng = np.random.default_rng(2)
    samples = _samples(rng, [60, 40, 50])
    packed = pack_batch(
        samples, plan_packing([60, 40, 50], 128, 3)[0], bucket=128, batch_size=3
    )
    model = build_model(cfg)
    params = init_model_params(model, cfg, jax.random.key(0), bucket=128)
    _, aux = _loss_fn(model, tc, params, packed, None, False)
    assert int(aux["n_real"]) == 3


def test_packed_matches_unpacked_with_overreported_lengths():
    """Packed scoring when the planning lengths() OVER-REPORT the true
    feature length (RepurposeDataset.lengths() is a labels-derived upper
    bound, dataset.py:180): placement and unpack layout must both follow the
    features' actual durations, or every later video in a row decodes a
    shifted span of the wrong video's logits (review finding r3)."""
    from repurpose_tpu.config import TestConfig
    from repurpose_tpu.infer import InferencePipeline
    from repurpose_tpu.models import init_model_params

    cfg = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=6, d_model=32,
        self_num_layers=2, num_heads=2, d_ff=64, hidden_dim=16, dropout=0.0,
        compute_dtype="float32", attention_impl="xla",
        matmul_precision="highest",
    )
    tcfg = TestConfig(pre_nms_thresh=0.3, pre_nms_topk=16, min_score=0.01)
    model = build_model(cfg)
    params = init_model_params(model, cfg, jax.random.key(0), bucket=64)
    rng = np.random.default_rng(11)

    class OverreportingVideos:
        """Feature files shorter than the label-derived lengths()."""

        def __init__(self):
            self.true_lens = [50, 30, 45, 20, 55, 35]
            self.over = [ln + 10 for ln in self.true_lens]  # labels longer
            self.items = []
            for i, ln in enumerate(self.true_lens):
                self.items.append({
                    "visual": rng.normal(0, 1, (ln, 8)).astype(np.float32) * 2,
                    "audio": rng.normal(0, 1, (ln, 12)).astype(np.float32),
                    "text": rng.normal(0, 1, (ln, 6)).astype(np.float32),
                    "video_id": f"v{i}",
                })

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

        def lengths(self):
            return self.over

    videos = OverreportingVideos()
    pipe = InferencePipeline(cfg, params, tcfg)
    ref = pipe.score_videos(list(videos.items), buckets=(64, 128), batch_size=2)
    got = pipe.score_videos(videos, buckets=(64, 128), batch_size=2, pack=True)
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert g["video_id"] == r["video_id"]
        assert g["duration"] == r["duration"]
        np.testing.assert_allclose(g["segments"], r["segments"], atol=1e-5)
        np.testing.assert_allclose(g["scores"], r["scores"], atol=1e-5)
        np.testing.assert_array_equal(g["labels"], r["labels"])


@pytest.mark.slow
def test_packed_equals_unpacked_long_t_4096():
    """Long-T composition (VERDICT r3 item 3): the same exactness proof at
    T=4096 — past STREAM_MAX_T the packed STREAMING kernels (bounded-sweep
    forward/dq, overlap-gated dkv; ops/flash_attention.py) carry both the
    loss and the parameter grads, value-identical to the unpacked batch."""
    from repurpose_tpu.ops.flash_attention import STREAM_MAX_T

    bucket = 4096
    assert bucket > STREAM_MAX_T  # the routing actually exercises streaming
    cfg = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=6, d_model=32,
        self_num_layers=1, num_heads=2, d_ff=64, hidden_dim=16, dropout=0.0,
        compute_dtype="float32", attention_impl="auto",  # pallas interpret
        matmul_precision="highest", attn_softmax_dtype="float32",
    )
    rng = np.random.default_rng(4)
    lengths = [1800, 2100, 3500]  # rows: [1800+2100], [3500] (FFD)
    samples = _samples(rng, lengths)

    unpacked = collate(samples, buckets=(bucket,), batch_size=3)
    packed = pack_batch(
        samples, plan_packing(lengths, bucket, 2)[0], bucket=bucket,
        batch_size=2,
    )
    assert packed.seg_ids is not None and (packed.seg_ids >= 1).any()

    model = build_model(cfg)
    params = init_model_params(model, cfg, jax.random.key(0), bucket=bucket)
    key = jax.random.key(1)
    tc3 = TrainConfig(batch_size=3, buckets=(bucket,))  # same loss norm

    @jax.jit
    def loss_and_grads(p, batch):
        return jax.value_and_grad(
            lambda pp: _loss_fn(model, tc3, pp, batch, key, True)[0]
        )(p)

    lu, gu = loss_and_grads(params, unpacked)
    lp, gp = loss_and_grads(params, packed)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_trainer_accepts_packed_long_buckets(tmp_path):
    """pack_sequences composes with buckets past STREAM_MAX_T (the r3 guard
    that rejected such configs is gone — packed streaming/HBM kernels cover
    them); the packed batch plan builds at the long bucket."""
    from repurpose_tpu.config import Config, MeshConfig, TestConfig
    from repurpose_tpu.data.synthetic import SyntheticDataset
    from repurpose_tpu.train.loop import Trainer

    model = ModelConfig(
        vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
        num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
        attention_impl="auto",
    )
    cfg = Config(
        model=model,
        train=TrainConfig(
            batch_size=1, buckets=(4096,), epochs=1, save_epochs=5,
            eval_freq=0, intra_epoch_eval_freq=0,
            pack_sequences=True, loss_norm="batch_size",
        ),
        mesh=MeshConfig(data=1),
        test_cfg=TestConfig(),
    )
    ds = SyntheticDataset([1800, 2100, 1500], model, seed=1)
    trainer = Trainer(cfg, str(tmp_path), ds)  # r3: raised ValueError here
    # FFD at 4096: [1800+2100], [1500] -> 2 rows / batch_size 1 -> 2 steps
    assert trainer.steps_per_epoch == 2
