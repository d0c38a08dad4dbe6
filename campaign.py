#!/usr/bin/env python
"""One-command published-protocol accuracy campaign.

Runs the reference's published evaluation protocol (its ``inference.py:37-55``:
test-split scoring -> per-video decode + Soft-NMS -> precision@tIoU over
{0.5, 0.6, 0.7, 0.8, 0.9} + the mean) end to end against the real
Repurpose-10K corpus, and writes a self-contained JSON report:

    python campaign.py --config_path configs/repurpose.yaml --torch_ckpt best.pth
    python campaign.py --config_path configs/repurpose.yaml --resume runs/x/ckpt

Stages (each recorded in the report):

1. **Feature scan** — per modality, which test-split videos have a loadable
   2-D non-empty ``.npy`` (the reference's ``--verify``,
   main_preprocessing.py:268-314). Missing/corrupt features fail the
   campaign up front instead of mid-eval.
2. **Protocol eval** — the exact published protocol via
   ``inference.evaluate_dataset`` (bucketed batches, on-device decode+NMS,
   per-video tIoU precision).
3. **Packed cross-check** (default on) — re-scores the split with sequence
   packing and asserts the mean precision matches the protocol number
   (packing is value-identical by design, tests/test_packing.py; this
   re-proves it on the real corpus + real checkpoint).

The development environment for this repo has NO corpus and NO egress, so
the campaign cannot run here — it exists so that the first machine with the
preprocessed features (docs/MIGRATION.md maps the reference's preprocessing
outputs onto the expected layout) can produce the published-protocol number
with one command. ``--smoke N`` proves the command end-to-end without the
corpus by materializing an on-disk synthetic split first.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np


def scan_features(dataset_cfg) -> dict:
    """Per-modality completeness scan over the split's label entries.

    Same acceptance rule as PreprocessingPipeline.verify_features
    (preprocessing/pipeline.py:198): a feature is OK iff its .npy loads as a
    2-D array with at least one row.
    """
    with open(dataset_cfg.label_path) as f:
        entries = json.load(f)
    video_ids = sorted({e["youtube_id"] for e in entries})
    dirs = {
        "visual": dataset_cfg.video_path,
        "audio": dataset_cfg.audio_path,
        "text": dataset_cfg.text_path,
    }
    report: dict = {"label_entries": len(entries), "videos": len(video_ids)}
    complete = set(video_ids)
    for mod, d in dirs.items():
        ok, missing, corrupt = [], [], []
        for vid in video_ids:
            p = os.path.join(d, f"{vid}.npy")
            if not os.path.exists(p):
                missing.append(vid)
                continue
            try:
                arr = np.load(p, mmap_mode="r", allow_pickle=True)
                if arr.ndim != 2 or arr.shape[0] == 0:
                    corrupt.append(vid)
                else:
                    ok.append(vid)
            except Exception:
                corrupt.append(vid)
        report[mod] = {
            "ok": len(ok),
            "missing": len(missing),
            "corrupt": len(corrupt),
            # cap the listings: a half-fetched corpus should not produce a
            # multi-megabyte report
            "missing_ids": missing[:20],
            "corrupt_ids": corrupt[:20],
        }
        complete &= set(ok)
    report["complete_all_modalities"] = len(complete)
    return report


def run_campaign(
    cfg,
    params,
    report_path: str,
    *,
    batch_size: int | None = None,
    crosscheck: bool = True,
    checkpoint: str = "",
) -> dict:
    """Execute the campaign against ``cfg.test_dataset`` and write the report.

    Returns the report dict. Raises if features are incomplete or the packed
    cross-check diverges from the protocol number.
    """
    import jax

    from inference import evaluate_dataset
    from repurpose_tpu.data.dataset import RepurposeDataset
    from repurpose_tpu.train.loop import TIOU_THRESHOLDS

    t0 = time.time()
    report: dict = {
        "protocol": "precision@tIoU {0.5..0.9} + mean, per-video decode + "
        "Soft-NMS (reference inference.py:37-55)",
        "checkpoint": checkpoint,
        "label_path": cfg.test_dataset.label_path,
        "devices": [str(d) for d in jax.devices()],
        "jax_version": jax.__version__,
    }

    logging.info("campaign stage 1/3: feature completeness scan")
    scan = scan_features(cfg.test_dataset)
    report["feature_scan"] = scan
    bad = scan["videos"] - scan["complete_all_modalities"]
    if bad:
        _write(report_path, report)
        raise SystemExit(
            f"feature scan failed: {bad}/{scan['videos']} videos lack a "
            f"complete modality set — see {report_path} for the id lists "
            "(rerun preprocess.py on the missing ids, or "
            "`preprocess.py --verify` for the full picture)"
        )

    logging.info("campaign stage 2/3: published-protocol eval")
    ds = RepurposeDataset(cfg.test_dataset, validate=False, keep_gt_segments=True)
    report["eval_entries"] = len(ds)
    t1 = time.time()
    _, _, per_thr = evaluate_dataset(ds, cfg, params, batch_size=batch_size)
    means = {str(t): float(np.mean(v)) if v else 0.0 for t, v in per_thr.items()}
    mean = float(np.mean(list(means.values())))
    report["precision_at_tiou"] = means
    report["mean_precision_at_tiou"] = mean
    report["eval_wall_s"] = round(time.time() - t1, 2)

    if crosscheck:
        logging.info("campaign stage 3/3: packed cross-check")
        t2 = time.time()
        _, _, per_thr_p = evaluate_dataset(
            ds, cfg, params, batch_size=batch_size, pack=True
        )
        means_p = {
            str(t): float(np.mean(v)) if v else 0.0 for t, v in per_thr_p.items()
        }
        mean_p = float(np.mean(list(means_p.values())))
        report["packed_crosscheck"] = {
            "precision_at_tiou": means_p,
            "mean_precision_at_tiou": mean_p,
            "abs_delta": abs(mean_p - mean),
            "wall_s": round(time.time() - t2, 2),
        }
        # packing is value-identical per video (block-diagonal attention +
        # per-video PE restart); any drift beyond float noise is a bug
        if abs(mean_p - mean) > 1e-6:
            _write(report_path, report)
            raise SystemExit(
                f"packed cross-check diverged: {mean_p:.6f} vs {mean:.6f} "
                f"(report at {report_path})"
            )

    report["total_wall_s"] = round(time.time() - t0, 2)
    _write(report_path, report)
    for t in TIOU_THRESHOLDS:
        print(f"precision@tIoU={t}: {means[str(t)]:.4f}")
    print(f"mean precision@tIoU: {mean:.4f}")
    print(f"report: {report_path}")
    return report


def _write(path: str, report: dict) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=1)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--config_path", default="configs/repurpose.yaml")
    p.add_argument("--resume", default=None, help="Orbax checkpoint dir")
    p.add_argument("--torch_ckpt", default=None, help="reference .pth checkpoint")
    p.add_argument("--report", default="campaign_report.json")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--no-crosscheck", action="store_true",
                   help="skip the packed re-score (halves the wall-clock)")
    p.add_argument("--smoke", type=int, default=0, metavar="N",
                   help="materialize an N-video synthetic on-disk split and "
                        "run the whole campaign against it (no corpus / "
                        "checkpoint needed; proves the command end to end)")
    p.add_argument("--log-level", default="INFO")
    args = p.parse_args()
    logging.basicConfig(level=args.log_level.upper())

    from repurpose_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    import dataclasses

    import jax

    from inference import load_params
    from repurpose_tpu.config import load_config

    cfg = load_config(args.config_path)
    if args.smoke:
        import tempfile

        from repurpose_tpu.data.synthetic import write_synthetic_dataset

        root = tempfile.mkdtemp(prefix="campaign_smoke_")
        durations = (
            np.random.default_rng(0)
            .integers(60, cfg.train.buckets[-1], args.smoke)
            .tolist()
        )
        split = write_synthetic_dataset(root, durations, cfg.model, seed=3)
        cfg = dataclasses.replace(cfg, test_dataset=split)
        logging.info("smoke split at %s (%d videos)", root, args.smoke)

    if not (args.resume or args.torch_ckpt or args.smoke):
        raise SystemExit(
            "a checkpoint is required for a real campaign: pass --resume "
            "(Orbax dir from train.py) or --torch_ckpt (reference .pth); "
            "--smoke N runs without one"
        )

    ns = argparse.Namespace(resume=args.resume, torch_ckpt=args.torch_ckpt)
    params = load_params(ns, cfg)
    if args.smoke:
        params = jax.device_get(params)  # keep the smoke path platform-clean

    run_campaign(
        cfg,
        params,
        args.report,
        batch_size=args.batch_size,
        crosscheck=not args.no_crosscheck,
        checkpoint=args.torch_ckpt or args.resume or "(random init — smoke)",
    )


if __name__ == "__main__":
    main()
