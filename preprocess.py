#!/usr/bin/env python
"""Preprocessing CLI (the reference's ``python preprocessing/
main_preprocessing.py --dataset ... [--steps ...] [--verify]``).

    python preprocess.py --dataset data/train.json --steps download visual
    python preprocess.py --dataset data/val.json --verify
    python preprocess.py --split data/train.json --chunk-size 100 --out chunks/
    python preprocess.py --fanout 4 --splits-dir chunks/ --dataset-type train
    python preprocess.py --fanout 4 --splits-dir chunks/ --dry-run --limit 10

``--fanout`` is the host-local counterpart of the reference's SLURM fan-out
(``preprocessing/submit_parallel_jobs.sh`` + ``slurm_preprocessing_job.sh``):
N worker processes drain the chunk files, each dropping a per-chunk
``_SUCCESS``/``_FAILED`` marker; reruns skip succeeded chunks.
"""

from __future__ import annotations

import argparse
import json
import logging

import yaml


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", help="split JSON to process")
    p.add_argument("--steps", nargs="+", default=["download", "visual", "audio", "text"])
    p.add_argument("--config", default=None, help="preprocessing YAML config")
    p.add_argument("--verify", action="store_true", help="completeness scan only")
    p.add_argument("--split", help="shard a split JSON into chunks instead")
    p.add_argument("--chunk-size", type=int, default=100)
    p.add_argument("--out", default="chunks")
    p.add_argument("--fanout", type=int, metavar="N",
                   help="drain split chunks through N parallel worker "
                        "processes with per-chunk _SUCCESS/_FAILED markers")
    p.add_argument("--splits-dir", default="chunks",
                   help="directory holding *_chunk_*.json files (--fanout)")
    p.add_argument("--dataset-type", default="all",
                   help="chunk prefix filter: train/val/test/all (--fanout)")
    p.add_argument("--limit", type=int, help="process at most N chunks")
    p.add_argument("--dry-run", action="store_true",
                   help="print the worker commands without running them")
    p.add_argument("--retry-failed", action="store_true",
                   help="rerun chunks with a _FAILED marker")
    p.add_argument("--markers-dir", default=None,
                   help="marker/log directory (default: the splits dir)")
    p.add_argument("--log-level", default="INFO")
    args = p.parse_args()
    logging.basicConfig(level=args.log_level.upper())
    # every CLI honors JAX_PLATFORMS (the ambient sitecustomize overrides the
    # env var via config — CLAUDE.md); the extractors are jax programs
    from repurpose_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    if args.split:
        from repurpose_tpu.preprocessing.tools import split_dataset

        paths = split_dataset(args.split, args.out, args.chunk_size)
        print(f"wrote {len(paths)} chunks to {args.out}")
        return

    if args.fanout:
        from repurpose_tpu.preprocessing.fanout import find_chunks, run_fanout

        chunks = find_chunks(args.splits_dir, args.dataset_type)
        if not chunks:
            p.error(f"no {args.dataset_type} chunk files in {args.splits_dir} "
                    "(run --split first)")
        summary = run_fanout(
            chunks, args.steps, workers=args.fanout, limit=args.limit,
            dry_run=args.dry_run, retry_failed=args.retry_failed,
            markers_dir=args.markers_dir, config=args.config,
        )
        print(json.dumps(summary, indent=2))
        raise SystemExit(1 if summary["failed"] else 0)

    from repurpose_tpu.preprocessing.pipeline import (
        PreprocessConfig,
        PreprocessingPipeline,
    )

    if not args.dataset:
        p.error("--dataset is required (unless using --split)")

    raw = {}
    if args.config:
        with open(args.config) as f:
            raw = yaml.safe_load(f) or {}
    pipeline = PreprocessingPipeline(PreprocessConfig(**raw))

    if args.verify:
        print(json.dumps(pipeline.verify_features(args.dataset), indent=2))
        return
    results = pipeline.process_dataset(args.dataset, args.steps)
    print(json.dumps(results, indent=2, default=str))


if __name__ == "__main__":
    main()
