"""End-to-end learning validation: on a LEARNABLE synthetic corpus
(label-correlated features), training with cls + reg losses must drive
precision@tIoU well above the untrained baseline — exercising the full stack:
bucketed loading -> jitted train step -> decode -> Soft-NMS -> metrics.
"""

import dataclasses

import numpy as np
import pytest

from repurpose_tpu.config import (
    Config,
    MeshConfig,
    ModelConfig,
    TestConfig,
    TrainConfig,
)
from repurpose_tpu.data.synthetic import SyntheticDataset
from repurpose_tpu.train.loop import Trainer

CFG = Config(
    model=ModelConfig(
        vis_dim=16, aud_dim=24, text_dim=8, d_model=32, self_num_layers=2,
        num_heads=4, d_ff=64, hidden_dim=16, dropout=0.0,
        compute_dtype="float32", attention_impl="xla", reg_activation="softplus",
    ),
    train=TrainConfig(
        batch_size=4, buckets=(256,), epochs=80, save_epochs=1000,
        eval_freq=1000, intra_epoch_eval_freq=0, lr=2e-3,
        reg_loss_weight=0.3,  # boundary training ON (capability the
        # reference removed, main.py:664) so decoded segments can be tight
    ),
    mesh=MeshConfig(data=1),
    test_cfg=TestConfig(
        pre_nms_topk=256, pre_nms_thresh=0.5, duration_thresh=5.0,
        duration_thresh_max=95.0, max_seg_per_min=0.5,
    ),
)


@pytest.mark.slow
def test_training_improves_tiou(tmp_path):
    durations = [200, 180, 220, 240, 210, 190, 230, 250]
    train_ds = SyntheticDataset(durations, CFG.model, seed=1, signal=2.0)
    test_ds = SyntheticDataset(durations[:4], CFG.model, seed=9, signal=2.0)
    trainer = Trainer(CFG, str(tmp_path), train_ds, test_ds=test_ds)

    before = trainer.evaluate()
    trainer.fit()
    after = trainer.evaluate()

    # Untrained: no candidate clears decode (precision 0). Trained: a solid
    # fraction of kept clips overlap GT at IoU 0.5. The per-video budget
    # (max_seg_per_min) keeps ~2 clips/video while most videos have 1 GT
    # clip, so precision ~0.5 is the practical ceiling here.
    assert before["tiou/0.5"] == 0.0, before
    assert after["tiou/0.5"] >= 0.3, (before, after)
    assert after["tiou/mean"] > before["tiou/mean"]
