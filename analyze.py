#!/usr/bin/env python
"""Feature analysis CLI — the reference's visualize_features.py (514 LoC) and
modality_correlation_analysis.py (838 LoC) as one entry point over the
repurpose_tpu analysis toolkit (utils/analysis.py).

Per video: temporal offset sweep of per-dimension cross-modal correlation,
highlight-vs-background correlation, logistic-probe label cross-correlation,
and a projection (PCA / t-SNE / UMAP) of text features colored by label.
Artifacts: correlation_analysis_report.txt, temporal_correlation.png,
projection_<method>.png in --output-dir; a JSON summary on stdout.

Usage:
    python analyze.py --synthetic 4 --output-dir /tmp/analysis
    python analyze.py --config_path configs/Repurpose.yaml --split val \
        --videos 5 --method tsne --output-dir analysis_out
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", default=None)
    p.add_argument("--split", default="val", choices=("train", "val", "test"))
    p.add_argument("--videos", type=int, default=5, help="videos to analyze")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic videos instead of real features")
    p.add_argument("--method", default="pca", choices=("pca", "tsne", "umap"))
    p.add_argument("--max-offset", type=int, default=10)
    p.add_argument("--corr", default="pearson", choices=("pearson", "spearman"))
    p.add_argument("--output-dir", default="analysis_out")
    args = p.parse_args()

    from repurpose_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import numpy as np

    from repurpose_tpu.utils.analysis import (
        feature_label_analysis,
        highlight_background_correlation,
        label_cross_correlation,
        render_projection,
        render_temporal_correlation,
        temporal_correlation,
        write_report,
    )

    if args.synthetic:
        from repurpose_tpu.config import ModelConfig
        from repurpose_tpu.data.synthetic import SyntheticDataset

        rng = np.random.default_rng(0)
        ds = SyntheticDataset(
            rng.integers(120, 400, args.synthetic).tolist(),
            ModelConfig(vis_dim=32, aud_dim=48, text_dim=16),
            seed=1, signal=1.0,
        )
    else:
        if not args.config_path:
            p.error("--config_path or --synthetic required")
        from repurpose_tpu.config import load_config
        from repurpose_tpu.data.dataset import RepurposeDataset

        cfg = load_config(args.config_path)
        ds = RepurposeDataset(
            getattr(cfg, f"{args.split}_dataset"), validate=False,
            keep_gt_segments=True,
        )

    os.makedirs(args.output_dir, exist_ok=True)
    if min(args.videos, len(ds)) <= 0:
        raise SystemExit(
            f"no videos to analyze (dataset has {len(ds)}, --videos {args.videos})"
        )
    all_results: dict = {}
    first_sample = None
    for i in range(min(args.videos, len(ds))):
        s = ds[i]
        first_sample = first_sample or s
        streams = {m: s[m] for m in ("visual", "audio", "text")}
        all_results[s["video_id"]] = {
            "temporal": temporal_correlation(
                streams, max_offset=args.max_offset, method=args.corr
            ),
            "highlight_background": highlight_background_correlation(
                streams, s["labels"], method=args.corr
            ),
            "label_regression": label_cross_correlation(streams, s["labels"]),
        }

    artifacts = [write_report(
        all_results, os.path.join(args.output_dir, "correlation_analysis_report.txt")
    )]
    # cross-video mean ± std curve (the reference's averaged figure) — a
    # single video's curve would silently ignore --videos N-1 of the sample
    from repurpose_tpu.utils.analysis import aggregate_temporal

    agg = aggregate_temporal([r["temporal"] for r in all_results.values()])
    artifacts.append(render_temporal_correlation(
        agg, os.path.join(args.output_dir, "temporal_correlation.png")
    ))
    fla = feature_label_analysis(
        first_sample["text"], first_sample["labels"], method=args.method
    )
    artifacts.append(render_projection(
        fla, first_sample["labels"],
        os.path.join(args.output_dir, f"projection_{args.method}.png"),
    ))

    print(json.dumps({
        "videos": len(all_results),
        "peak_at_zero": agg["peak_at_zero"],
        "separability_acc": fla["separability_acc"],
        "artifacts": artifacts,
    }))


if __name__ == "__main__":
    main()
