"""Jitted train / eval steps.

Replaces the reference's per-iteration Python (main.py:294-412): forward,
masked focal loss, backward, Adam update, and metric reduction run as ONE
compiled XLA program per bucket shape. Under a multi-device mesh the same
program is data/tensor-parallel — sharding constraints on params and batch
make XLA insert the gradient all-reduces the reference got from DDP/NCCL.

Loss normalization parity: the reference divides the summed focal loss by the
*configured* batch size, not the actual one (main.py:331) — controlled by
TrainConfig.loss_norm. Gradient-norm telemetry (reference main.py:345-367
loops Linear modules on host) is computed on device in the same program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from repurpose_tpu.config import ModelConfig, TrainConfig
from repurpose_tpu.data.batching import Batch
from repurpose_tpu.models import build_model
from repurpose_tpu.ops.losses import masked_cls_loss, masked_reg_loss
from repurpose_tpu.train.state import TrainState


def loss_denominator(train_cfg: TrainConfig, batch: Batch):
    """(n_real, norm): the global count of real (non-padding) samples and the
    loss denominator under ``train_cfg.loss_norm``. Packed rows hold several
    videos — count segments, not rows. Multi-host: batch_size is per-process
    (DistributedSampler semantics), so config_batch_size scales by
    process_count. ONE home for this rule — _loss_fn, gradient accumulation,
    and the 1F1B pipeline step all divide by the same denominator so their
    partial losses sum to the full-batch loss exactly."""
    if batch.seg_ids is not None:
        n_real = jnp.sum(jnp.maximum(jnp.max(batch.seg_ids, axis=1) + 1, 0))
    else:
        n_real = jnp.sum(batch.durations > 0)
    if train_cfg.loss_norm == "config_batch_size":
        norm = jnp.float32(float(train_cfg.batch_size) * jax.process_count())
    else:
        norm = jnp.maximum(n_real, 1).astype(jnp.float32)
    return n_real, norm


def _loss_fn(
    model, train_cfg: TrainConfig, params, batch: Batch, rng, train: bool,
    norm_override=None,
):
    # sequence-packed batches (data/batching.py:pack_batch) carry seg_ids /
    # positions; passed as kwargs so the non-packing model variants
    # (cross/bottleneck fusion) keep their narrower signatures
    packed_kw = (
        {"seg_ids": batch.seg_ids, "positions": batch.positions}
        if batch.seg_ids is not None
        else {}
    )
    out = model.apply(
        {"params": params},
        batch.visual, batch.audio, batch.text, batch.mask,
        not train,
        rngs={"dropout": rng} if train else None,
        **packed_kw,
    )
    cls_loss = masked_cls_loss(out.cls_logits, batch.labels, batch.mask)
    # norm_override: gradient accumulation passes the GLOBAL denominator so
    # per-chunk partial losses sum to the full-batch loss exactly.
    n_real, norm = loss_denominator(train_cfg, batch)
    if norm_override is not None:
        norm = norm_override
    total = cls_loss / norm
    aux = {
        "cls_loss": cls_loss,
        "loss": total,
        "n_real": n_real,
    }
    if train_cfg.reg_loss_weight > 0.0:
        reg_loss = masked_reg_loss(out.offsets, batch.segments, batch.labels, batch.mask)
        total = total + train_cfg.reg_loss_weight * reg_loss / norm
        aux["reg_loss"] = reg_loss
        aux["loss"] = total
    return total, aux


def kernel_layer_names(params) -> list[str]:
    """Path names of every ``kernel`` leaf, in tree-flatten order — the label
    list matching the stacked per-layer grad-norm / histogram outputs of the
    train step (grads share the params pytree structure, so the orders agree).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = []
    for path, _ in flat:
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        if name.endswith("kernel"):
            names.append(name)
    return names


def _kernel_leaves(grads):
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    return [
        g
        for path, g in flat
        if "/".join(getattr(p, "key", str(p)) for p in path).endswith("kernel")
    ]


HIST_BINS = 64


def make_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    schedule: Callable | None = None,
    donate: bool = True,
    per_layer_grad_norms: bool = False,
    grad_histograms: bool = False,
    mesh=None,
    model=None,
    zero1_mesh=None,
) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    ``per_layer_grad_norms`` adds a single stacked vector
    ``metrics["grad_norms/stacked"]`` of per-kernel gradient norms (one host
    fetch for all layers — the reference loops Linear modules on host every 10
    iters, main.py:345-367). ``grad_histograms`` adds
    ``metrics["hist/grads/counts"]`` [L, HIST_BINS] and
    ``.../edges`` [L, HIST_BINS+1] — the wandb.watch(model) gradient-histogram
    equivalent (reference main.py:264). Label both with
    ``kernel_layer_names(params)``. Device-side cost of either is O(n_params),
    negligible next to the model pass; outputs stay on device until fetched.
    ``model`` overrides the forward implementation (same ``.apply`` signature)
    — parallel/pipeline.py:PipelinedMMCT uses it to run the pipelined encoder
    with the rest of the step (loss, Adam, telemetry) unchanged.
    ``zero1_mesh`` enables ZeRO-1 optimizer-state sharding over that mesh's
    data axis (parallel/sharding.py:zero1_opt_specs): the step pins the Adam
    moments data-sharded and the params to their TP/replicated layout, so
    XLA compiles the update as reduce-scatter(grads) -> sharded moment
    update -> all-gather(params) — moment HBM drops ~dp x.
    """
    if model is None:
        model = build_model(model_cfg, mesh=mesh)

    accum = max(int(train_cfg.grad_accum_steps), 1)
    accum_dtype = (
        jnp.bfloat16 if train_cfg.grad_accum_dtype == "bfloat16" else jnp.float32
    )

    def _accum_grads(params, batch: Batch, rng):
        """Gradient accumulation: split the batch into ``accum`` chunks along
        the batch dim and lax.scan the per-chunk backward, summing grads in
        ``grad_accum_dtype``. Peak activation memory drops to one chunk's;
        the loss denominator is computed GLOBALLY first so the summed chunk
        losses (and their grads) equal the full-batch computation exactly
        (reduction order aside). bf16 accumulators halve the accumulator
        HBM traffic — the optimizer update stays fp32."""
        b = batch.visual.shape[0]
        if b % accum:
            raise ValueError(f"batch {b} not divisible by grad_accum_steps {accum}")
        n_real, norm = loss_denominator(train_cfg, batch)
        # STRIDED chunking (chunk c = rows c, c+A, 2A+c, ...): under a
        # data-sharded batch (contiguous blocks per shard) contiguous chunks
        # would each land on 1/dp of the chips; strided chunks stay balanced
        # across every data shard with purely local slicing. The loss is
        # partition-invariant (global denominator), so values are identical.
        chunked = type(batch)(*[
            None if x is None
            else x.reshape(b // accum, accum, *x.shape[1:]).swapaxes(0, 1)
            for x in batch
        ])

        def one_chunk(carry, inp):
            g_acc, aux_acc = carry
            chunk, idx = inp
            (_, aux), g = jax.value_and_grad(
                lambda p: _loss_fn(
                    model, train_cfg, p, chunk,
                    jax.random.fold_in(rng, idx), True, norm_override=norm,
                ),
                has_aux=True,
            )(params)
            g_acc = jax.tree.map(
                lambda a, gi: a + gi.astype(accum_dtype), g_acc, g
            )
            aux_acc = {
                k: aux_acc[k] + v for k, v in aux.items() if k != "n_real"
            } | {"n_real": aux_acc["n_real"]}
            return (g_acc, aux_acc), None

        g0 = jax.tree.map(
            lambda p: jnp.zeros(p.shape, accum_dtype), params
        )
        aux_keys = ["cls_loss", "loss", "n_real"] + (
            ["reg_loss"] if train_cfg.reg_loss_weight > 0.0 else []
        )
        aux0 = {k: jnp.float32(0.0) for k in aux_keys}
        aux0["n_real"] = n_real
        (g_acc, aux), _ = jax.lax.scan(
            one_chunk, (g0, aux0), (chunked, jnp.arange(accum))
        )
        return aux, jax.tree.map(lambda g, p: g.astype(p.dtype), g_acc, params)

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        if accum > 1:
            aux, grads = _accum_grads(state.params, batch, rng)
        else:
            (_, aux), grads = jax.value_and_grad(
                lambda p: _loss_fn(model, train_cfg, p, batch, rng, True),
                has_aux=True,
            )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if zero1_mesh is not None:
            from repurpose_tpu.parallel.sharding import apply_zero1_constraints

            opt_state, params = apply_zero1_constraints(
                opt_state, params, zero1_mesh
            )
        metrics = dict(aux)
        metrics["grad_norm"] = optax.global_norm(grads)
        if per_layer_grad_norms:
            metrics["grad_norms/stacked"] = jnp.stack(
                [jnp.linalg.norm(g) for g in _kernel_leaves(grads)]
            )
        if grad_histograms:
            counts, edges = [], []
            for g in _kernel_leaves(grads):
                c, e = jnp.histogram(g.ravel(), bins=HIST_BINS)
                counts.append(c)
                edges.append(e)
            metrics["hist/grads/counts"] = jnp.stack(counts)
            metrics["hist/grads/edges"] = jnp.stack(edges)
        if schedule is not None:
            metrics["learning_rate"] = schedule(state.step)
        bad = ~(jnp.isfinite(aux["loss"]) & jnp.isfinite(metrics["grad_norm"]))
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            nonfinite_count=state.nonfinite_count + bad.astype(jnp.int32),
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


@jax.jit
def param_histograms(params) -> dict:
    """Per-kernel parameter histograms {counts [L,B], edges [L,B+1]} — the
    parameter half of the wandb.watch equivalent (reference main.py:264);
    label rows with ``kernel_layer_names(params)``."""
    counts, edges = [], []
    for p in _kernel_leaves(params):
        c, e = jnp.histogram(p.ravel(), bins=HIST_BINS)
        counts.append(c)
        edges.append(e)
    return {"counts": jnp.stack(counts), "edges": jnp.stack(edges)}


def make_eval_step(
    model_cfg: ModelConfig, train_cfg: TrainConfig, mesh=None, model=None
) -> Callable:
    """Loss-only evaluation step (the reference's intra-epoch val probe,
    main.py:414-490): (params, batch) -> metrics."""
    if model is None:
        model = build_model(model_cfg, mesh=mesh)

    def eval_step(params, batch: Batch):
        _, aux = _loss_fn(model, train_cfg, params, batch, None, False)
        return aux

    return jax.jit(eval_step)
