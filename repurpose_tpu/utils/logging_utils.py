"""Metric logging: wandb when available/enabled, always JSONL + stdout.

The reference logs batch/epoch/eval metrics and grad norms to wandb from rank
0 (main.py:238-265, 345-367, 391-397, 746-759). Here the same stream goes to
a JSONL file (machine-readable without external services) and optionally to
wandb; only process 0 writes.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Mapping

import jax

logger = logging.getLogger(__name__)


class MetricLogger:
    def __init__(self, workdir: str, use_wandb: bool = False, config: Mapping | None = None):
        self.is_main = jax.process_index() == 0
        self._file = None
        self._wandb = None
        if not self.is_main:
            return
        os.makedirs(workdir, exist_ok=True)
        self._file = open(os.path.join(workdir, "metrics.jsonl"), "a")
        if use_wandb:
            try:
                import wandb

                wandb.init(
                    project=os.environ.get("WANDB_PROJECT", "repurpose-tpu"),
                    name=f"mmct_{time.strftime('%Y%m%d_%H%M%S')}",
                    config=dict(config or {}),
                    dir=workdir,
                )
                # only AFTER init succeeds — a set-then-failed-init would
                # make every later log() call crash on the run-less module
                self._wandb = wandb
            except Exception as e:
                logger.warning("wandb unavailable (%s); JSONL logging only", e)

    def log(self, metrics: Mapping[str, Any], step: int) -> None:
        if not self.is_main:
            return
        record = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            record[k] = float(v) if hasattr(v, "__float__") else v
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items() if k != "time"}, step=step)

    def log_histograms(
        self, names: list[str], counts, edges, step: int, prefix: str = "grads"
    ) -> None:
        """Per-layer histogram summaries — the wandb.watch(model) equivalent
        (reference main.py:264 logs gradient histograms every 1000 steps).
        ``counts`` [L, B] / ``edges`` [L, B+1] label rows by ``names``. JSONL
        gets the raw arrays; wandb gets native Histogram objects."""
        if not self.is_main:
            return
        import numpy as np

        counts = np.asarray(counts)
        edges = np.asarray(edges)
        record: dict[str, Any] = {"step": step, "time": time.time()}
        for i, name in enumerate(names):
            record[f"hist/{prefix}/{name}"] = {
                "counts": counts[i].tolist(),
                "edges": edges[i].tolist(),
            }
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            try:
                self._wandb.log(
                    {
                        f"hist/{prefix}/{n}": self._wandb.Histogram(
                            np_histogram=(counts[i], edges[i])
                        )
                        for i, n in enumerate(names)
                    },
                    step=step,
                )
            except Exception as e:
                logger.warning("wandb histogram upload failed: %s", e)

    def log_images(self, paths: list[str], step: int, key: str = "debug") -> None:
        """Upload debug figures (reference: wandb.Image uploads of the
        ValidationDebugger renders, main.py:776-784)."""
        if self._wandb is None:
            return
        try:
            self._wandb.log(
                {key: [self._wandb.Image(p) for p in paths]}, step=step
            )
        except Exception as e:
            logger.warning("wandb image upload failed: %s", e)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None
