"""HBM capacity modeling: does (bucket, batch) fit, and what's the max?

The TPU analog of the reference's memory-requirement model in
detect_gpu_setup.py:192-205 (which analytically estimated ~5.5 GB/GPU for the
paper setup and recommended a strategy). Here the model is per-(bucket,
batch) and attention/remat aware, so `preflight.py --capacity` can print a
fit table and the max safe bucket BEFORE the first multi-minute flagship
compile. Estimates are analytic (documented per-term below) and deliberately
conservative by a fudge factor; `compiled_memory(...)` cross-checks any cell
against XLA's real buffer assignment when you can afford a compile.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable

import jax
import numpy as np

from repurpose_tpu.config import ModelConfig, TrainConfig

# Leave headroom for XLA's workspace, fragmentation, and the infeed buffers.
FUDGE = 1.15
DEFAULT_HBM = 16e9  # v5e: 16 GB/chip


def hbm_bytes_per_device() -> float:
    """Device-reported HBM limit, falling back to the v5e default."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return float(stats["bytes_limit"])
    except Exception:
        pass
    return DEFAULT_HBM


def param_count(cfg: ModelConfig) -> int:
    """Analytic parameter count of the concat-fusion MMCT."""
    d, dff, h = cfg.d_model, cfg.d_ff, cfg.hidden_dim
    per_layer = (
        (d * 3 * d + 3 * d)  # qkv
        + (d * d + d)  # out
        + (d * dff + dff) + (dff * d + d)  # ffn
        + 4 * d  # 2 LayerNorms
    )
    head = 2 * d + d * h + h + h * h + h  # norm + dense_0 + dense_1
    heads = (head + h * 1 + 1) + (head + h * 2 + 2)  # cls(->1) + reg(->2)
    stem = (cfg.concat_dim * d + d) + 2 * d + (d * d + d) + 2 * d  # proj+norms+fmap
    return cfg.self_num_layers * per_layer + stem + heads + 2 * d  # encoder_norm


def estimate_train_bytes(
    cfg: ModelConfig,
    batch: int,
    bucket: int,
    grad_accum_steps: int = 1,
    grad_accum_dtype: str = "float32",
    zero1_dp: int = 1,
) -> dict:
    """Per-device byte estimate for ONE jitted train step (single chip; under
    dp/tp sharding divide activations by the data axis and params by the
    model axis accordingly).

    The two round-4 memory levers are modeled so the fit table reflects the
    config that will actually run:
    - ``grad_accum_steps`` (TrainConfig.grad_accum_steps): the lax.scan over
      chunks keeps only batch/accum rows of activations live at once, while
      the grad tree becomes a persistent accumulator in ``grad_accum_dtype``
      (bfloat16 halves it — train/step.py:_accum_grads);
    - ``zero1_dp`` (TrainConfig.shard_opt_state over a data axis of that
      size): the Adam m,v trees shard 1/dp per device
      (parallel/sharding.py:zero1_opt_specs).

    Terms:
    - params (fp32) + Adam m,v (fp32, /zero1_dp) + one grad tree
      (fp32, or the accumulator dtype when grad_accum_steps > 1);
    - per-layer activations saved for the backward: ~(6*d + 2*d_ff) values
      per token (pre-LN x2, qkv, attn out, proj, ffn hidden x2) in the
      compute dtype; with remat=True only the layer input [B,T,d] is saved;
    - attention_impl="xla" additionally saves the [B,H,T,T] softmax probs;
      flash/ring recompute them (nothing quadratic is saved);
    - model inputs (three feature streams, fp32) and the 2944-d concat.
    """
    n = param_count(cfg)
    act = 2 if cfg.compute_dtype == "bfloat16" else 4
    accum = max(int(grad_accum_steps), 1)
    b, t, d, dff = batch, bucket, cfg.d_model, cfg.d_ff
    grad_bytes = n * (
        2 if accum > 1 and grad_accum_dtype == "bfloat16" else 4
    )
    state_bytes = (
        4 * n  # params
        + 2 * 4 * n // max(int(zero1_dp), 1)  # Adam m + v, ZeRO-1 sharded
        + grad_bytes
    )
    # the scan body sees one chunk's rows; its activations are what's live
    # (the full-batch INPUTS below stay resident either way)
    bc = -(-b // accum)  # ceil: step.py requires divisibility, be safe here
    if cfg.remat:
        per_layer = bc * t * d * act
        transient = bc * t * (6 * d + 2 * dff) * act  # one layer recomputed
    else:
        per_layer = bc * t * (6 * d + 2 * dff) * act
        transient = 0
    attn_quad = 0
    # "auto" resolves to flash on TPU — model the deployment target, not the
    # host this estimate happens to run on.
    if cfg.attention_impl == "xla":
        attn_quad = bc * cfg.num_heads * t * t * act * cfg.self_num_layers
        if cfg.remat:
            attn_quad = bc * cfg.num_heads * t * t * act  # one layer at a time
    acts = cfg.self_num_layers * per_layer + transient + attn_quad
    inputs = b * t * (cfg.concat_dim * 4 + cfg.concat_dim * act + 2 * d * act)
    total = (state_bytes + acts + inputs) * FUDGE
    return {
        "params": n,
        "state_bytes": state_bytes,
        "activation_bytes": acts,
        "input_bytes": inputs,
        "total_bytes": total,
    }


def capacity_table(
    cfg: ModelConfig,
    batch: int,
    buckets: Iterable[int],
    hbm: float | None = None,
    **train_knobs,
) -> list[dict]:
    """One row per bucket: estimate + fits-in-HBM verdict. ``train_knobs``
    pass through to ``estimate_train_bytes`` (grad_accum_steps,
    grad_accum_dtype, zero1_dp)."""
    hbm = hbm if hbm is not None else hbm_bytes_per_device()
    rows = []
    for t in buckets:
        est = estimate_train_bytes(cfg, batch, t, **train_knobs)
        rows.append(
            {
                "bucket": int(t),
                "batch": batch,
                "est_gb": round(est["total_bytes"] / 1e9, 2),
                "hbm_gb": round(hbm / 1e9, 1),
                "fits": bool(est["total_bytes"] < hbm),
            }
        )
    return rows


def max_safe_bucket(
    cfg: ModelConfig, batch: int, hbm: float | None = None, cap: int = 1 << 17,
    **train_knobs,
) -> int:
    """Largest power-of-two bucket whose train step fits the estimate."""
    hbm = hbm if hbm is not None else hbm_bytes_per_device()
    best = 0
    t = 256
    while t <= cap:
        if estimate_train_bytes(cfg, batch, t, **train_knobs)["total_bytes"] < hbm:
            best = t
        t *= 2
    return best


def compiled_memory(cfg: ModelConfig, train_cfg: TrainConfig, bucket: int) -> dict:
    """Ground truth: AOT-compile one train step at (bucket, batch) and read
    XLA's buffer assignment (argument/output/temp bytes). Costs a real
    compile — minutes for the flagship on this box's remote-compile relay."""
    import jax.numpy as jnp

    from repurpose_tpu.data.batching import Batch
    from repurpose_tpu.train.state import create_train_state
    from repurpose_tpu.train.step import make_train_step

    b = train_cfg.batch_size
    state, tx, sched = create_train_state(cfg, train_cfg, 100, jax.random.key(0))
    step = make_train_step(cfg, train_cfg, tx, sched, donate=False)
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    batch = Batch(
        sds((b, bucket, cfg.vis_dim), jnp.float32),
        sds((b, bucket, cfg.aud_dim), jnp.float32),
        sds((b, bucket, cfg.text_dim), jnp.float32),
        sds((b, bucket), jnp.bool_),
        sds((b, bucket), jnp.float32),
        sds((b, bucket, 2), jnp.float32),
        sds((b,), jnp.int32),
    )
    abstract_state = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    compiled = step.lower(abstract_state, batch, jax.random.key(0)).compile()
    ma = compiled.memory_analysis()
    return {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "total_bytes": int(
            ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes
        ),
    }
