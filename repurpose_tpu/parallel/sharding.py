"""Sharding rules: map parameter paths and batch tensors to PartitionSpecs.

Tensor-parallel layout (Megatron-style column/row split over the ``model``
axis; see jax-ml.github.io/scaling-book for the collective-placement recipe):

- attention ``qkv`` kernel [d, 3d]: column-parallel — P(None, "model");
  bias [3d]: P("model"). Heads (8) divide the model axis, so the [B,T,H,Dh]
  reshape keeps the head dimension sharded with no resharding.
- attention ``out`` kernel [d, d]: row-parallel — P("model", None); the
  psum XLA inserts after it closes the TP region.
- FFN ``linear1`` [d, d_ff]: column-parallel; ``linear2`` [d_ff, d]:
  row-parallel (one psum per FFN).
- everything else (LayerNorms, input projection, heads): replicated.

Batch layout: batch dim over ``data`` (the reference's DDP), time dim over
``seq`` (sequence sharding the reference lacks; XLA all-gathers K/V around
attention as needed).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_sharding_rules(path: tuple[str, ...], value: Any) -> P:
    """PartitionSpec for one parameter, keyed by its pytree path."""
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    if "attn/qkv" in joined:
        return P(None, "model") if names[-1] == "kernel" else P("model")
    if "attn/out" in joined:
        return P("model", None) if names[-1] == "kernel" else P()
    if "linear1" in joined:
        return P(None, "model") if names[-1] == "kernel" else P("model")
    if "linear2" in joined:
        return P("model", None) if names[-1] == "kernel" else P()
    return P()


def param_specs(params) -> Any:
    """Pytree of PartitionSpecs matching ``params``."""
    return jax.tree_util.tree_map_with_path(param_sharding_rules, params)


def param_shardings(params, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, param_sharding_rules(path, v)), params
    )


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree onto the mesh per the TP rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def zero1_opt_specs(opt_state, mesh: Mesh) -> Any:
    """ZeRO-1 PartitionSpecs for an optimizer-state pytree: each Adam-moment
    leaf shards over the ``data`` axis on its first TP-free dim that the
    axis size divides (scalars and indivisible leaves stay replicated).

    Moments mirror the param tree inside the optax state, so their pytree
    paths CONTAIN the param paths — ``param_sharding_rules`` keys on path
    substrings ("attn/qkv", "linear1", ...) and therefore applies unchanged,
    which keeps the TP placement of TP-sharded params' moments and layers
    the data axis on top (ZeRO composes with Megatron TP). The reference has
    no optimizer-state sharding at all — its DDP replicates Adam moments on
    every rank (utils/distributed.py) — so on dp=N meshes this cuts the
    moment HBM by ~N x for the cost of the update-time all-gather XLA
    inserts (the jax-ml scaling-book ZeRO-1 recipe)."""
    dp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)

    def rule(path, v):
        ndim = getattr(v, "ndim", 0)
        if ndim == 0 or dp == 1:
            return P()
        base = list(param_sharding_rules(path, v)) if ndim else []
        base += [None] * (ndim - len(base))
        for i in range(ndim):
            if base[i] is None and v.shape[i] % dp == 0 and v.shape[i] >= dp:
                base[i] = "data"
                break
        return P(*base)

    return jax.tree_util.tree_map_with_path(rule, opt_state)


def zero1_opt_shardings(opt_state, mesh: Mesh) -> Any:
    specs = zero1_opt_specs(opt_state, mesh)
    return jax.tree.map(lambda _, s: NamedSharding(mesh, s), opt_state, specs)


def apply_zero1_constraints(opt_state, params, mesh: Mesh):
    """Pin the ZeRO-1 layout inside a jitted train step: moments data-sharded
    (``zero1_opt_specs``), params back to their TP/replicated layout — the
    constraints make XLA compile reduce-scatter(grads) -> sharded moment
    update -> all-gather(params). Shared by train/step.py and
    parallel/pipeline_1f1b.py. Returns (opt_state, params)."""
    opt_state = jax.tree.map(
        lambda v, s: jax.lax.with_sharding_constraint(v, NamedSharding(mesh, s)),
        opt_state,
        zero1_opt_specs(opt_state, mesh),
    )
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: jax.lax.with_sharding_constraint(
            p, NamedSharding(mesh, param_sharding_rules(path, p))
        ),
        params,
    )
    return opt_state, params


def batch_spec(seq_sharded: bool = True) -> P:
    """[B, T, ...] activation spec: batch over data, optionally time over seq."""
    return P("data", "seq" if seq_sharded else None)


def batch_sharding(mesh: Mesh, seq_sharded: bool = True) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(seq_sharded))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_global_batch(batch, mesh: Mesh, seq_sharded: bool = False):
    """Assemble a device-resident (and, multi-host, globally-sharded) Batch.

    Single-process: plain device_put with the data-axis sharding. Multi-host:
    each process contributes its LOCAL batch as one shard of a global array
    whose batch dimension is local_batch * process_count — the jax-native
    replacement for the reference's DistributedSampler+DDP input flow
    (each rank feeding its own loader shard)."""
    sh = batch_sharding(mesh, seq_sharded)
    rep = replicated(mesh)
    n_proc = jax.process_count()

    def put(x, sharding):
        if n_proc == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * n_proc, *x.shape[1:])
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    vec = NamedSharding(mesh, P("data"))  # 1-D per-sample fields (durations)
    fields = {}
    for name, x in zip(batch._fields, batch):
        if x is None:  # optional fields (seg_ids/positions on unpacked batches)
            fields[name] = None
        elif getattr(x, "ndim", 0) >= 2:
            fields[name] = put(x, sh)
        elif n_proc > 1:
            fields[name] = put(x, vec)
        else:
            fields[name] = jax.device_put(x, rep)
    return type(batch)(**fields)
