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


def test_grad_accum_and_zero1_shrink_the_estimate():
    """The round-4 memory levers must move the fit model the right way:
    accumulation chunks activations (train/step.py:_accum_grads scans
    batch/accum rows), bf16 accumulators halve the grad tree, and ZeRO-1
    shards the Adam moments 1/dp (parallel/sharding.py:zero1_opt_specs)."""
    flag = ModelConfig()
    base = estimate_train_bytes(flag, 8, 2048)
    accum = estimate_train_bytes(flag, 8, 2048, grad_accum_steps=4)
    assert accum["activation_bytes"] < base["activation_bytes"] / 3
    assert accum["total_bytes"] < base["total_bytes"]
    bf16 = estimate_train_bytes(
        flag, 8, 2048, grad_accum_steps=4, grad_accum_dtype="bfloat16"
    )
    assert bf16["state_bytes"] < accum["state_bytes"]
    # bf16 accumulators only exist on the accumulation path
    no_accum_bf16 = estimate_train_bytes(
        flag, 8, 2048, grad_accum_dtype="bfloat16"
    )
    assert no_accum_bf16["state_bytes"] == base["state_bytes"]
    z = estimate_train_bytes(flag, 8, 2048, zero1_dp=4)
    n = z["params"]
    assert base["state_bytes"] - z["state_bytes"] == 2 * 4 * n - 2 * 4 * n // 4
    # inputs stay whole-batch resident regardless of chunking
    assert accum["input_bytes"] == base["input_bytes"]
    # the knobs thread through the table and the max-bucket search
    t_base = max_safe_bucket(flag, 8, hbm=16e9)
    t_accum = max_safe_bucket(
        flag, 8, hbm=16e9, grad_accum_steps=8, grad_accum_dtype="bfloat16"
    )
    assert t_accum >= t_base
    rows = capacity_table(flag, 8, (2048,), hbm=16e9, grad_accum_steps=4)
    assert rows[0]["est_gb"] < capacity_table(flag, 8, (2048,), hbm=16e9)[0]["est_gb"]
