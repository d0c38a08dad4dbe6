#!/usr/bin/env python
"""Training CLI (the reference's ``python main.py --config_path ...``).

Examples:
    python train.py --config_path configs/repurpose.yaml --workdir runs/full
    python train.py --config_path configs/repurpose.yaml --resume
    python train.py --synthetic 64 --epochs 2          # no real data needed

The SLURM/torchrun launcher zoo of the reference (run_ddp.sh, slurm_*.sh,
launch_training.py) is unnecessary on TPU: one process per host, and
``jax.distributed.initialize()`` (called automatically) wires multi-host.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

from repurpose_tpu.config import Config, load_config
from repurpose_tpu.parallel.mesh import maybe_initialize_distributed


def build_datasets(cfg: Config, synthetic: int):
    if synthetic:
        from repurpose_tpu.data.synthetic import SyntheticDataset
        import numpy as np

        rng = np.random.default_rng(cfg.train.seed)
        durations = rng.integers(60, cfg.train.buckets[-1], synthetic).tolist()
        mk = lambda n, s: SyntheticDataset(durations[:n], cfg.model, seed=s)
        return mk(synthetic, 1), mk(max(synthetic // 8, 1), 2), mk(max(synthetic // 8, 1), 3)
    from repurpose_tpu.data.dataset import RepurposeDataset

    train_ds = RepurposeDataset(cfg.train_dataset, validate=True)
    val_ds = RepurposeDataset(cfg.val_dataset, validate=True)
    test_ds = RepurposeDataset(cfg.test_dataset, validate=False, keep_gt_segments=True)
    return train_ds, val_ds, test_ds


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", default="configs/repurpose.yaml")
    p.add_argument("--workdir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic videos instead of real features")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the first epoch")
    p.add_argument("--debug-viz", action="store_true",
                   help="render prediction figures at each eval")
    p.add_argument("--auto-resume", type=int, default=0, metavar="N",
                   help="elastic supervision: on a crash, rebuild the trainer "
                        "from the latest checkpoint up to N times")
    p.add_argument("--async-ckpt", action="store_true",
                   help="overlap Orbax checkpoint writes with training")
    p.add_argument("--export_torch", default=None, metavar="PATH",
                   help="after training, write the final weights as a "
                        "reference-schema .pth (loads directly into the "
                        "reference's torch inference stack)")
    p.add_argument("--torch_ckpt", default=None, metavar="PATH",
                   help="warm-start: initialize the model weights from a "
                        "reference .pth (converted on load; fresh optimizer "
                        "and schedule) — continue training a reference-"
                        "trained model here")
    p.add_argument("--log-level", default="INFO")
    args = p.parse_args()

    if args.export_torch or args.torch_ckpt:
        # fail in seconds, not after the training run: both flags need torch
        import importlib.util

        if importlib.util.find_spec("torch") is None:
            p.error("--export_torch/--torch_ckpt require torch, which is "
                    "not installed in this environment")

    logging.basicConfig(level=args.log_level.upper(),
                        format="%(asctime)s %(levelname)s %(name)s: %(message)s")

    # Platform pin must precede ANY jax backend touch (incl. distributed init).
    from repurpose_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    maybe_initialize_distributed()

    cfg = load_config(args.config_path)
    if args.epochs:
        # the override must reach the CONFIG, not just fit(): the warmup/
        # cosine schedule is built from cfg.train.epochs (train/state.py),
        # so a fit-only override would anneal against the wrong horizon —
        # extra epochs would train at lr exactly 0
        import dataclasses

        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=args.epochs)
        )
    workdir = args.workdir or os.path.join(
        "runs", time.strftime("ckpt_%Y%m%d_%H%M%S")
    )
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    train_ds, val_ds, test_ds = build_datasets(cfg, args.synthetic)
    from repurpose_tpu.train.loop import Trainer, fit_with_auto_resume

    init_params = None
    if args.torch_ckpt:
        from repurpose_tpu.models.torch_convert import load_reference_checkpoint

        init_params = load_reference_checkpoint(args.torch_ckpt, cfg.model)
        logging.info("warm-starting from reference checkpoint %s", args.torch_ckpt)

    def make_trainer():
        t = Trainer(
            cfg, workdir, train_ds, val_ds, test_ds,
            use_wandb=args.wandb, self_check=True,
            async_checkpoints=args.async_ckpt,
            init_params=init_params,
        )
        t.debug_viz = args.debug_viz
        return t

    def export_torch(trainer, summary):
        """--export_torch: write the final weights as a reference-schema
        .pth (loads strictly into the reference's inference.py:34).
        Multi-host safe: _host_local_params' all-gather is a collective, so
        EVERY process enters it; only process 0 writes the file."""
        if not args.export_torch:
            return
        if summary.get("preempted"):
            logging.warning("preempted before completion; skipping --export_torch")
            return
        import jax

        from repurpose_tpu.models import save_reference_checkpoint

        params = trainer._host_local_params()
        if jax.process_index() == 0:
            save_reference_checkpoint(
                args.export_torch,
                jax.device_get(params),
                cfg.model,
                epoch=int(summary.get("best_epoch", -1)),
                loss=float(summary.get("final_loss", 0.0) or 0.0),
            )
            print("exported reference-schema checkpoint:", args.export_torch)

    if args.auto_resume:
        summary = fit_with_auto_resume(
            make_trainer, epochs=args.epochs,
            max_restarts=args.auto_resume, resume_first=args.resume,
            on_complete=export_torch,
        )
        print("training done:", summary)
        return

    trainer = make_trainer()
    if args.resume:
        trainer.resume()
    if args.profile:
        from repurpose_tpu.utils.profiling import trace

        with trace(os.path.join(workdir, "profile")):
            summary = trainer.fit(epochs=trainer.start_epoch + 1)  # one epoch
        if not summary.get("preempted") and (
            (args.epochs or cfg.train.epochs) > trainer.start_epoch
        ):
            summary = trainer.fit(epochs=args.epochs)
    else:
        summary = trainer.fit(epochs=args.epochs)
    try:
        export_torch(trainer, summary)
    finally:
        trainer.close()
    print("training done:", summary)


if __name__ == "__main__":
    main()
