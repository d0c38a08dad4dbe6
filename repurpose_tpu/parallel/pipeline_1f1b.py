"""1F1B (one-forward-one-backward) pipeline schedule over the ``pipe`` axis.

The reference has no pipeline parallelism at all (its distributed story is
DP/DDP replication, reference utils/distributed.py:242-625); GPipe
(parallel/pipeline.py) was this framework's v1. This module adds the
schedule production pipelines actually run, because GPipe's memory profile
is its known weakness:

- **GPipe** leans on autodiff to reverse the whole schedule: the forward
  banks residuals for every (microbatch, layer) before any backward starts,
  so a stage's activation memory grows **O(M)** in the microbatch count —
  per device it ends up holding the whole batch's activations through its
  own layers, same as unpipelined remat.
- **1F1B** interleaves: each tick every stage runs one forward AND one
  backward on *different* microbatches; a microbatch's backward starts the
  moment its forward clears the last stage. In-flight activations per stage
  are bounded by a ring buffer of ``W = 2S-1`` stage inputs — **O(S)**,
  independent of M, so microbatch count buys smaller bubbles for free.

Autodiff cannot express this interleaving (it reverses program order), so
gradients are computed EXPLICITLY inside one ``shard_map``:

- Schedule (SPMD, tick-based): forward of microbatch ``m`` at stage ``s``
  on tick ``m + s``; backward on tick ``m + 2(S-1) - s``. Total ticks
  ``M + 2S - 2`` each doing fwd+bwd, vs GPipe's ``2(M + S - 1)`` each doing
  one pass — same compute, same bubble fraction ``(S-1)/(M+S-1)``; what
  changes is peak memory.
- Each stage stores only the INPUT of each in-flight microbatch (slot
  ``m mod W``; the window ``2(S-1-s)+1 <= W`` never collides) and
  re-runs its layer block under ``jax.vjp`` at backward time — activation
  recomputation, the same 2x-forward cost profile as the remat'd GPipe
  backward.
- The last stage seeds the chain: head + loss ``jax.vjp`` on the microbatch
  whose forward it just finished (its backward tick equals its forward
  tick there), stage 0 closes it with the embed ``jax.vjp``. Gradient hops
  ride the reverse ``ppermute`` ring; parameter gradients accumulate
  per-stage and ``psum`` over data (and over pipe for the replicated
  embed/head tree) at the end.
- Dropout keys derive from (data index, global layer index, microbatch) —
  identical folds as parallel/pipeline.py — so the backward's recomputed
  forward regenerates bit-identical masks.

Loss decomposition is exact because both losses are masked SUMS
(ops/losses.py:75,87: reference MMCTransformer.losses:159-179 semantics):
per-microbatch partial sums over the same global denominator add up to the
full-batch loss; tests pin trajectory equality with the plain and GPipe
steps at dropout 0.

Composition: pipe x data always; pipe x TENSOR PARALLELISM like the GPipe
path (partial-manual shard_map with ``axis_names={"data", "pipe"}``): the
``model`` axis stays an AUTO compiler axis, so GSPMD partitions the layer
dots over heads and places the Megatron psums with NO explicit wrapper —
including inside the vjp pullbacks, where the model-axis psum IS the
correct TP gradient reduction (partial products of a sharded contraction),
unlike the pipe/data axes where contributions belong to different
microbatches and must stay local until the schedule's predicates mask them.
The layer gradients' TP layout follows from the sharding constraint pinned
on the stacked tree before the shard_map call.

Restrictions (``validate_1f1b``): identical to ``validate_pipeline`` —
seq == 1, ``attention_impl="xla"`` when model > 1, concat fusion,
``L % S == 0``, ``B % (dp * M) == 0``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from repurpose_tpu.config import ModelConfig, TrainConfig
from repurpose_tpu.data.batching import Batch
from repurpose_tpu.models.encoder import EncoderLayer
from repurpose_tpu.ops.losses import masked_cls_loss, masked_reg_loss
from repurpose_tpu.parallel.pipeline import (
    _compute_dtype,
    _embed,
    _head,
    mesh_axis_sizes,
    split_pipeline_params,
    unstack_layer_params,
    validate_pipeline,
)
from repurpose_tpu.train.state import TrainState

Array = jax.Array


def validate_1f1b(
    cfg: ModelConfig, mesh: Mesh, n_microbatches: int, batch: int
) -> tuple[int, int]:
    """Same restrictions as the GPipe schedule (validate_pipeline): 1F1B
    composes with data always and with the model axis via partial-manual
    shard_map + auto_axes (attention_impl='xla' required there); seq needs
    the ring ppermute hand-placed and stays unsupported."""
    return validate_pipeline(cfg, mesh, n_microbatches, batch)


def _loss_and_grads(
    cfg: ModelConfig,
    tc: TrainConfig,
    mesh: Mesh,
    m_micro: int,
    stacked,
    rest,
    batch: Batch,
    rng,
):
    """Run the 1F1B schedule; returns ((total, cls, reg) losses, stacked-layer
    grads [L, ...] pipe-sharded, rest grads replicated). All three are global
    (psum'd over data and pipe)."""
    ax = mesh_axis_sizes(mesh)
    s_stages = ax.get("pipe", 1)
    tp = ax.get("model", 1)
    lps = cfg.self_num_layers // s_stages
    w_slots = 2 * s_stages - 1
    has_seg = batch.seg_ids is not None
    has_pos = batch.positions is not None
    layer_mod = EncoderLayer(cfg)
    reg_w = float(tc.reg_loss_weight)
    dtype = _compute_dtype(cfg)
    d_model = cfg.d_model

    # Global loss denominator — the ONE shared rule (train/step.py:
    # loss_denominator); every microbatch contribution divides by it, so the
    # partial sums add up to the full-batch loss exactly.
    from repurpose_tpu.train.step import loss_denominator

    n_real, norm = loss_denominator(tc, batch)

    key_impl = jax.random.key_impl(rng)
    raw_key = jax.random.key_data(rng)

    def apply_layer(lp, x_, mask_, seg_, key):
        rngs = {"dropout": key}
        if has_seg:
            return layer_mod.apply({"params": lp}, x_, mask_, False, seg_, rngs=rngs)
        return layer_mod.apply({"params": lp}, x_, mask_, False, rngs=rngs)

    if cfg.remat:
        apply_layer = jax.checkpoint(apply_layer)

    dix = lambda z, i: jax.lax.dynamic_index_in_dim(z, i, 0, keepdims=False)

    def body(layers_loc, rest_, v, a, tmod, mask, labels, segments, norm_, raw, seg, pos):
        stage = jax.lax.axis_index("pipe")
        rng_loc = jax.random.fold_in(
            jax.random.wrap_key_data(raw, impl=key_impl),
            jax.lax.axis_index("data"),
        )
        # CRITICAL: jax.vjp w.r.t. an INVARYING (replicated) input inside
        # shard_map auto-psums the cotangent over the varying axes — each
        # pullback would silently mix every stage's (and data shard's)
        # contribution before the schedule's predicates could mask them.
        # pcast the param trees to per-device varying so pullbacks return
        # LOCAL grads; the schedule then masks and psums them explicitly.
        layers_loc = jax.tree.map(
            lambda p: jax.lax.pcast(p, ("data",), to="varying"), layers_loc
        )
        rest_ = jax.tree.map(
            lambda p: jax.lax.pcast(p, ("data", "pipe"), to="varying"), rest_
        )
        bl, t, _ = v.shape
        mb = bl // m_micro
        rs = lambda z: z.reshape(m_micro, mb, *z.shape[1:])
        v_mb, a_mb, t_mb = rs(v), rs(a), rs(tmod)
        mask_mb, labels_mb, gtseg_mb = rs(mask), rs(labels), rs(segments)
        segid_mb = rs(seg) if has_seg else None
        pos_mb = rs(pos) if has_pos else None

        raw_loc = jax.random.key_data(rng_loc)

        def stage_fwd_raw(lp_stack, x_, mask_, seg_, raw_, mb_idx, stage_):
            # Dropout keys fold (data idx, global layer, microbatch) —
            # identical to parallel/pipeline.py — so the bwd-time recompute
            # regenerates the same masks. Everything from the manual context
            # arrives as an ARGUMENT so the function can cross the
            # ``auto_axes`` boundary under pipe x tp.
            rloc = jax.random.wrap_key_data(raw_, impl=key_impl)

            def bstep(carry, inp):
                lpi, li = inp
                key = jax.random.fold_in(
                    jax.random.fold_in(rloc, stage_ * lps + li), mb_idx
                )
                return apply_layer(lpi, carry, mask_, seg_, key), None

            out, _ = jax.lax.scan(bstep, x_, (lp_stack, jnp.arange(lps)))
            return out

        def stage_vjp_raw(lp_stack, xi, mask_, seg_, raw_, mb_idx, stage_, g_in):
            _, pb = jax.vjp(
                lambda l_, x_: stage_fwd_raw(l_, x_, mask_, seg_, raw_, mb_idx, stage_),
                lp_stack, xi,
            )
            return pb(g_in)

        # pipe x tensor parallelism needs no special-casing here: under the
        # partial-manual shard_map (axis_names={"data","pipe"}) the model
        # axis stays an AUTO compiler axis, so GSPMD partitions the layer
        # dots over heads and places the Megatron psums — including inside
        # the vjp pullbacks, where the model-axis psum IS the correct TP
        # gradient reduction (partial products of a sharded contraction),
        # unlike the pipe/data axes where contributions belong to different
        # microbatches and must stay local (pcast above). The TP layout of
        # the layer gradients follows from the stacked tree's sharding
        # constraint placed before the shard_map call.
        def stage_fwd(lp_stack, x_, mask_, seg_, mb_idx):
            return stage_fwd_raw(lp_stack, x_, mask_, seg_, raw_loc, mb_idx, stage)

        def stage_vjp(lp_stack, xi, mask_, seg_, mb_idx, g_in):
            return stage_vjp_raw(lp_stack, xi, mask_, seg_, raw_loc, mb_idx, stage, g_in)

        def embed_fn(rest__, mi):
            p_ = dix(pos_mb, mi) if has_pos else None
            return _embed(cfg, rest__, dix(v_mb, mi), dix(a_mb, mi), dix(t_mb, mi), p_)

        def head_loss(rest__, y, mi):
            rng_mb = jax.random.fold_in(rng_loc, (1 << 20) + mi)
            out = _head(cfg, rest__, y, False, rng_mb)
            mask_i, labels_i = dix(mask_mb, mi), dix(labels_mb, mi)
            cls = masked_cls_loss(out.cls_logits, labels_i, mask_i)
            total = cls / norm_
            reg = jnp.float32(0.0)
            if reg_w > 0.0:
                reg = masked_reg_loss(out.offsets, dix(gtseg_mb, mi), labels_i, mask_i)
                total = total + reg_w * reg / norm_
            return total, (cls, reg)

        def tick(carry, tstep):
            act_prev, grad_prev, xbuf, g_lay, g_rest, l_acc = carry
            # ---- forward slot: microbatch tstep - stage
            mf = tstep - stage
            fwd_valid = (mf >= 0) & (mf < m_micro)
            mfc = jnp.clip(mf, 0, m_micro - 1)
            x_emb = embed_fn(rest_, mfc)
            x_in = x_emb if s_stages == 1 else jnp.where(stage == 0, x_emb, act_prev)
            m_f = dix(mask_mb, mfc)
            s_f = dix(segid_mb, mfc) if has_seg else None
            y = stage_fwd(layers_loc, x_in, m_f, s_f, mfc)
            slot_f = jax.lax.rem(mfc, w_slots)
            old = dix(xbuf, slot_f)
            xbuf = jax.lax.dynamic_update_index_in_dim(
                xbuf, jnp.where(fwd_valid, x_in, old), slot_f, 0
            )
            # ---- head + loss vjp: seeds the last stage's backward of the
            # microbatch it just finished (bwd tick == fwd tick there). All
            # stages compute it (SPMD); the head is O(one layer), cheap.
            tot, pb_head, (cls, reg) = jax.vjp(
                lambda r_, y_: head_loss(r_, y_, mfc), rest_, y, has_aux=True
            )
            last = stage == (s_stages - 1)
            keep_h = last & fwd_valid
            # jnp.where, not multiplication-by-0: bubble ticks run the head
            # on mis-scheduled garbage, and 0 * inf would poison the psum'd
            # loss metric even though the (where-masked) grads stay correct
            l_acc = l_acc + jnp.where(keep_h, jnp.stack([tot, cls, reg]), 0.0)
            one = jax.lax.pcast(jnp.float32(1.0), ("data", "pipe"), to="varying")
            g_rest_head, g_y = pb_head(one)
            g_rest = jax.tree.map(
                lambda acc, g: acc + jnp.where(keep_h, g, 0), g_rest, g_rest_head
            )
            # ---- backward slot: microbatch tstep - (2(S-1) - stage)
            mbi = tstep - (2 * (s_stages - 1) - stage)
            bwd_valid = (mbi >= 0) & (mbi < m_micro)
            mbc = jnp.clip(mbi, 0, m_micro - 1)
            g_in = g_y if s_stages == 1 else jnp.where(last, g_y, grad_prev)
            xin_b = dix(xbuf, jax.lax.rem(mbc, w_slots))
            m_b = dix(mask_mb, mbc)
            s_b = dix(segid_mb, mbc) if has_seg else None
            g_lay_inc, g_xin = stage_vjp(layers_loc, xin_b, m_b, s_b, mbc, g_in)
            g_lay = jax.tree.map(
                lambda acc, g: acc + jnp.where(bwd_valid, g, 0), g_lay, g_lay_inc
            )
            # ---- embed backward closes the chain at stage 0
            _, pb_emb = jax.vjp(lambda r_: embed_fn(r_, mbc), rest_)
            (g_rest_emb,) = pb_emb(g_xin)
            keep_e = (stage == 0) & bwd_valid
            g_rest = jax.tree.map(
                lambda acc, g: acc + jnp.where(keep_e, g, 0), g_rest, g_rest_emb
            )
            # ---- stage hops: activations up, gradients down
            if s_stages > 1:
                y = jax.lax.ppermute(
                    y, "pipe", [(i, i + 1) for i in range(s_stages - 1)]
                )
                g_xin = jax.lax.ppermute(
                    g_xin, "pipe", [(i + 1, i) for i in range(s_stages - 1)]
                )
            return (y, g_xin, xbuf, g_lay, g_rest, l_acc), None

        varying = lambda z: jax.lax.pcast(z, ("data", "pipe"), to="varying")
        carry0 = (
            varying(jnp.zeros((mb, t, d_model), dtype)),
            varying(jnp.zeros((mb, t, d_model), dtype)),
            varying(jnp.zeros((w_slots, mb, t, d_model), dtype)),
            # both param trees were pcast to (data, pipe)-varying above, so
            # zeros_like inherits the right VMA state directly.
            jax.tree.map(jnp.zeros_like, layers_loc),
            jax.tree.map(jnp.zeros_like, rest_),
            varying(jnp.zeros((3,), jnp.float32)),
        )
        (_, _, _, g_lay, g_rest, l_acc), _ = jax.lax.scan(
            tick, carry0, jnp.arange(m_micro + 2 * s_stages - 2)
        )
        g_lay = jax.lax.psum(g_lay, "data")
        g_rest = jax.lax.psum(g_rest, ("data", "pipe"))
        l_acc = jax.lax.psum(l_acc, ("data", "pipe"))
        return l_acc, g_lay, g_rest

    sm_kw: dict = {}
    if tp > 1:
        # Partial-manual: data/pipe manual, model left to the compiler. Pin
        # the Megatron layout on the stacked tree so the auto-axis
        # collectives land as TP psums, not resharding (same as
        # parallel/pipeline.py's GPipe path).
        from jax.sharding import NamedSharding

        from repurpose_tpu.parallel.pipeline import stacked_param_specs

        sm_kw["axis_names"] = {"data", "pipe"}
        stacked = jax.tree.map(
            lambda v, s: jax.lax.with_sharding_constraint(v, NamedSharding(mesh, s)),
            stacked,
            stacked_param_specs(stacked),
        )
    args = [
        stacked, rest, batch.visual, batch.audio, batch.text,
        batch.mask, batch.labels, batch.segments, norm, raw_key,
        batch.seg_ids if has_seg else (), batch.positions if has_pos else (),
    ]
    specs = (
        P("pipe"), P(), P("data"), P("data"), P("data"),
        P("data"), P("data"), P("data"), P(), P(),
        P("data") if has_seg else P(), P("data") if has_pos else P(),
    )
    fn = jax.shard_map(
        body, mesh=mesh, in_specs=specs, out_specs=(P(), P("pipe"), P()), **sm_kw
    )
    losses, g_lay, g_rest = fn(*args)
    return losses, g_lay, g_rest, n_real


def make_1f1b_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    schedule: Callable | None = None,
    mesh: Mesh | None = None,
    n_microbatches: int = 2,
    donate: bool = True,
    per_layer_grad_norms: bool = False,
    grad_histograms: bool = False,
    split_layout: bool = False,
    zero1: bool = False,
) -> Callable:
    """Build the jitted 1F1B train step: (state, batch, rng) -> (state,
    metrics) — a drop-in for train/step.py:make_train_step when the mesh has
    a pipe axis. ``split_layout=False`` takes the STANDARD per-layer tree
    (Trainer/checkpoints unchanged; grads are unstacked back before the
    optimizer); ``split_layout=True`` pairs with
    ``create_pipeline_train_state``'s memory-honest split tree."""
    from repurpose_tpu.train.step import HIST_BINS, _kernel_leaves

    if mesh is None:
        raise ValueError("the 1F1B step needs the mesh with the pipe axis")
    if zero1 and split_layout:
        raise ValueError(
            "zero1 supports the standard param layout only (the split "
            "layout's stacked moments are already pipe/TP-sharded; "
            "zero1_opt_specs keys on per-layer param paths)"
        )
    n_layers = model_cfg.self_num_layers

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        if split_layout:
            stacked, rest = state.params["layers"], state.params["rest"]
        else:
            split = split_pipeline_params(state.params, n_layers)
            stacked, rest = split["layers"], split["rest"]
        losses, g_lay, g_rest, n_real = _loss_and_grads(
            model_cfg, train_cfg, mesh, n_microbatches, stacked, rest, batch, rng
        )
        if split_layout:
            grads = {"layers": g_lay, "rest": g_rest}
        else:
            grads = dict(g_rest)
            grads["encoder"] = unstack_layer_params(g_lay, n_layers)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if zero1:
            # ZeRO-1 over the data axis (see train/step.py zero1_mesh)
            from repurpose_tpu.parallel.sharding import apply_zero1_constraints

            opt_state, params = apply_zero1_constraints(opt_state, params, mesh)
        metrics = {
            "loss": losses[0],
            "cls_loss": losses[1],
            "n_real": n_real,
            "grad_norm": optax.global_norm(grads),
        }
        if train_cfg.reg_loss_weight > 0.0:
            metrics["reg_loss"] = losses[2]
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
        bad = ~(jnp.isfinite(metrics["loss"]) & jnp.isfinite(metrics["grad_norm"]))
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            nonfinite_count=state.nonfinite_count + bad.astype(jnp.int32),
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


__all__ = ["make_1f1b_train_step", "validate_1f1b"]
