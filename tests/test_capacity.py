"""HBM capacity model (preflight's memory-requirement analog of
detect_gpu_setup.py:192-205): analytic param count must be exact, the
fit model must rank configs sensibly, and the compiled cross-check must
agree with the analytic estimate within a small factor on a tiny config."""

import dataclasses

import jax
import numpy as np
import pytest

from repurpose_tpu.config import ModelConfig, TrainConfig
from repurpose_tpu.utils.capacity import (
    capacity_table,
    compiled_memory,
    estimate_train_bytes,
    max_safe_bucket,
    param_count,
)

TINY = ModelConfig(
    vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=2,
    num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
    attention_impl="xla",
)


def test_param_count_exact():
    from repurpose_tpu.models import build_model, init_model_params

    for cfg in (TINY, dataclasses.replace(TINY, self_num_layers=1, d_model=32,
                                          num_heads=4, d_ff=64)):
        params = init_model_params(build_model(cfg), cfg, jax.random.key(0))
        real = sum(int(np.asarray(p).size) for p in jax.tree.leaves(params))
        assert param_count(cfg) == real, cfg


def test_param_count_flagship_scale():
    # flagship ~85M params (SURVEY.md §6 order-of-magnitude check)
    n = param_count(ModelConfig())
    assert 5e7 < n < 1.2e8, n


def test_estimates_rank_sensibly():
    flag = ModelConfig()  # flash/auto on TPU: no quadratic term
    xla = dataclasses.replace(flag, attention_impl="xla")
    remat = dataclasses.replace(flag, remat=True)
    e_flag = estimate_train_bytes(flag, 6, 2048)["total_bytes"]
    e_xla = estimate_train_bytes(xla, 6, 2048)["total_bytes"]
    e_remat = estimate_train_bytes(remat, 6, 2048)["total_bytes"]
    assert e_remat < e_flag < e_xla
    # longer buckets and bigger batches cost more
    assert (
        estimate_train_bytes(flag, 6, 4096)["total_bytes"]
        > e_flag
        > estimate_train_bytes(flag, 2, 2048)["total_bytes"]
    )


def test_capacity_table_and_max_bucket():
    flag = ModelConfig()
    rows = capacity_table(flag, 6, (256, 1024, 2048), hbm=16e9)
    assert [r["bucket"] for r in rows] == [256, 1024, 2048]
    assert rows[0]["fits"]  # bucket 256 must fit a 16 GB chip
    best = max_safe_bucket(flag, 6, hbm=16e9)
    assert best >= 2048  # flash attention: the flagship trains at 2048 on v5e
    # remat never shrinks the max bucket
    assert max_safe_bucket(
        dataclasses.replace(flag, remat=True), 6, hbm=16e9
    ) >= best
    # a tiny HBM bound forces a smaller bucket
    assert max_safe_bucket(flag, 6, hbm=2e9) < best


@pytest.mark.slow
def test_compiled_cross_check():
    """XLA's real buffer assignment for a tiny train step should land within
    a small factor of the analytic estimate (CPU fusion differs from TPU;
    this guards against order-of-magnitude modeling errors)."""
    tc = TrainConfig(batch_size=2, buckets=(128,))
    mem = compiled_memory(TINY, tc, 128)
    est = estimate_train_bytes(TINY, 2, 128)["total_bytes"]
    assert mem["total_bytes"] > 0
    ratio = est / mem["total_bytes"]
    assert 0.2 < ratio < 8.0, (est, mem)
