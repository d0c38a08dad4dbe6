#!/usr/bin/env python
"""Standalone evaluation CLI (the reference's ``python inference.py
--config_path ... --resume ckpt``, inference.py:23-55).

Scores the test split and prints precision@tIoU {0.5..0.9} + the mean.
Accepts either an Orbax checkpoint directory produced by train.py or a
*reference PyTorch .pth checkpoint* (converted on the fly), so models trained
with the original framework evaluate here directly.

    python inference.py --config_path configs/repurpose.yaml --resume runs/x/ckpt
    python inference.py --config_path configs/repurpose.yaml --torch_ckpt best.pth
    python inference.py --synthetic 16        # smoke-run without data/weights
"""

from __future__ import annotations

import argparse
import dataclasses
import logging

import jax
import numpy as np

from repurpose_tpu.config import load_config
from repurpose_tpu.data.batching import collate
from repurpose_tpu.infer import InferencePipeline
from repurpose_tpu.models import build_model, init_model_params
from repurpose_tpu.train.loop import TIOU_THRESHOLDS
from repurpose_tpu.utils.metrics import calculate_tiou


def load_params(args, cfg):
    if args.torch_ckpt:
        from repurpose_tpu.models.torch_convert import load_reference_checkpoint

        return load_reference_checkpoint(args.torch_ckpt, cfg.model)
    if args.resume:
        from repurpose_tpu.train.checkpoint import Checkpointer
        from repurpose_tpu.train.state import create_train_state

        state, _, _ = create_train_state(cfg.model, cfg.train, 1, jax.random.key(0))
        ckpt = Checkpointer(args.resume)
        restored, _ = ckpt.restore(state)
        return restored.params
    logging.warning("no checkpoint given — using random init (smoke mode)")
    model = build_model(cfg.model)
    return init_model_params(model, cfg.model, jax.random.key(cfg.train.seed))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", default="configs/repurpose.yaml")
    p.add_argument("--resume", default=None, help="Orbax checkpoint dir")
    p.add_argument("--torch_ckpt", default=None, help="reference .pth checkpoint")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--export", default=None,
                   help="write a ranked clips JSON manifest to this path")
    p.add_argument("--export_torch", default=None, metavar="PATH",
                   help="convert the loaded checkpoint (--resume Orbax dir "
                        "or --torch_ckpt .pth) to a reference-schema .pth "
                        "and exit without scoring — deploy an already-"
                        "trained model through the reference's torch stack "
                        "(its inference.py:33-34 load path)")
    p.add_argument("--pack", action="store_true",
                   help="sequence-pack each bucket's videos (several per row, "
                        "block-diagonal attention) — same results, less padding "
                        "compute; features load one packed batch at a time")
    p.add_argument("--log-level", default="INFO")
    args = p.parse_args()
    logging.basicConfig(level=args.log_level.upper())

    from repurpose_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    cfg = load_config(args.config_path)
    if args.export_torch:
        # converter mode: no dataset, no scoring — load, write, exit
        from repurpose_tpu.models.torch_convert import save_reference_checkpoint

        save_reference_checkpoint(
            args.export_torch, jax.device_get(load_params(args, cfg)), cfg.model
        )
        print("exported reference-schema checkpoint:", args.export_torch)
        return

    if args.synthetic:
        from repurpose_tpu.data.synthetic import SyntheticDataset

        ds = SyntheticDataset(
            np.random.default_rng(0).integers(60, cfg.train.buckets[-1], args.synthetic).tolist(),
            cfg.model, seed=3,
        )
    else:
        from repurpose_tpu.data.dataset import RepurposeDataset

        ds = RepurposeDataset(cfg.test_dataset, validate=False, keep_gt_segments=True)

    params = load_params(args, cfg)
    all_results, time_offsets, per_thr = evaluate_dataset(
        ds, cfg, params, batch_size=args.batch_size, pack=args.pack
    )
    _finish(args, all_results, time_offsets, per_thr)


def evaluate_dataset(ds, cfg, params, batch_size=None, pack=False):
    """Score a dataset under the published protocol (the reference's
    inference.py:37-55 loop: per-video decode + Soft-NMS + tIoU against the
    ground-truth segments). Returns ``(results, time_offsets, per_thr)``
    where ``per_thr`` maps each tIoU threshold to the per-video precision
    list. Shared by the CLI below and campaign.py (the one-command
    published-protocol accuracy campaign)."""
    pipe = InferencePipeline(
        dataclasses.replace(cfg.model, dropout=0.0), params, cfg.test_cfg
    )
    bs = batch_size or cfg.train.batch_size
    per_thr = {t: [] for t in TIOU_THRESHOLDS}
    all_results = []
    time_offsets = {}
    sample_blocks = []

    if pack:
        class _LazyVideos:
            """Dataset-backed lazy sequence for score_videos(pack=True):
            features load one packed batch at a time
            (data/batching.py:iter_packed_batches) instead of the whole
            split at once; small per-video metadata is cached as items
            stream through (every video is fetched exactly once)."""

            def __init__(self, ds):
                self._ds = ds
                self.meta: dict[int, dict] = {}

            def __len__(self):
                return len(self._ds)

            def lengths(self):
                return self._ds.lengths()

            def __getitem__(self, i):
                s = self._ds[i]
                self.meta[i] = {
                    "gt_segments": s.get("gt_segments") or [],
                    "time_offset": s.get("time_offset", 0.0),
                    "video_id": s["video_id"],
                }
                return s

        lazy = _LazyVideos(ds)
        results = pipe.score_videos(
            lazy, buckets=cfg.train.buckets, batch_size=bs, pack=True
        )
        all_results = list(results)
        for i, r in enumerate(results):
            m = lazy.meta[i]
            # per-result offset: several label entries may share one
            # youtube_id with different timeRange slices — a video_id-keyed
            # dict would let the last entry's offset clobber the others'
            r["time_offset"] = m["time_offset"]
            time_offsets[m["video_id"]] = m["time_offset"]
            tiou = calculate_tiou(
                m["gt_segments"], r["segments"].tolist(), TIOU_THRESHOLDS
            )
            for t in TIOU_THRESHOLDS:
                per_thr[t].append(tiou[t])
        return all_results, time_offsets, per_thr

    # group by bucket first (stable sort): index-order chunks would pad
    # nearly every batch to its longest member's bucket on a mixed-length
    # split (same shape as Trainer.evaluate's staging)
    if hasattr(ds, "lengths"):
        from repurpose_tpu.data.batching import pick_bucket

        _lens = ds.lengths()
        order = sorted(
            range(len(ds)),
            key=lambda i: pick_bucket(int(_lens[i]), cfg.train.buckets),
        )
    else:
        order = list(range(len(ds)))

    def staged_batches():
        # host staging (dataset reads + collate) for batch i+1 overlaps
        # device compute for batch i via score_stream's in-flight window —
        # the synchronous loop paid this box's per-dispatch RPC floor
        # serially per batch
        for i0 in range(0, len(order), bs):
            samples = [ds[i] for i in order[i0 : i0 + bs]]
            for smp in samples:
                time_offsets[smp["video_id"]] = smp.get("time_offset", 0.0)
            sample_blocks.append(samples)
            batch = collate(samples, cfg.train.buckets, bs)
            yield (
                batch.visual, batch.audio, batch.text, batch.mask,
                batch.durations, [s["video_id"] for s in samples],
            )

    for results in pipe.score_stream(staged_batches()):
        # FIFO consume: score_stream yields in dispatch order; holding every
        # batch's feature arrays for the whole run would grow without bound
        samples = sample_blocks.pop(0)
        for s, r in zip(samples, results):
            # per-result offset (several entries may share a youtube_id)
            r["time_offset"] = s.get("time_offset", 0.0)
            tiou = calculate_tiou(
                s.get("gt_segments") or [], r["segments"].tolist(), TIOU_THRESHOLDS
            )
            for t in TIOU_THRESHOLDS:
                per_thr[t].append(tiou[t])
        all_results.extend(results[: len(samples)])

    return all_results, time_offsets, per_thr


def _finish(args, all_results, time_offsets, per_thr) -> None:
    if args.export:
        from repurpose_tpu.utils.export import write_manifest

        clips = write_manifest(all_results, args.export, time_offsets=time_offsets)
        print(f"wrote {len(clips)} clips to {args.export}")

    means = {t: float(np.mean(v)) if v else 0.0 for t, v in per_thr.items()}
    for t, v in means.items():
        print(f"precision@tIoU={t}: {v:.4f}")
    print(f"mean precision@tIoU: {float(np.mean(list(means.values()))):.4f}")


if __name__ == "__main__":
    main()
