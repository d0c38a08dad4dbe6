"""Trainer: the full training/eval driver.

Capability-equivalent to the reference's 900-line main.py train():
- epoch loop with per-epoch reshuffling (DistributedSampler.set_epoch ->
  seeded per-epoch permutation in BatchLoader);
- jitted train step per bucket shape (forward + focal loss + Adam, one XLA
  program — vs the reference's eager forward/backward at main.py:294-412);
- intra-epoch validation-loss probe every ``intra_epoch_eval_freq`` iters on
  <=10 val batches (main.py:414-490);
- periodic Orbax checkpoints every ``save_epochs`` + resume (main.py:513-531,
  213-228);
- full test-set evaluation every ``eval_freq`` epochs computing precision@tIoU
  {0.5..0.9} through the on-device inference pipeline (main.py:571-705), with
  best-checkpoint tracking on the mean tIoU (main.py:718-743);
- metric logging via MetricLogger (wandb optional).

Distribution: params are sharded over the mesh by the TP rules, batches over
the data axis; the reference's DDP/strategy machinery has no counterpart
because jit + shardings subsume it.
"""

from __future__ import annotations

import dataclasses
import collections
import itertools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from repurpose_tpu.config import Config
from repurpose_tpu.data.batching import Batch, collate
from repurpose_tpu.data.loader import BatchLoader
from repurpose_tpu.infer import InferencePipeline
from repurpose_tpu.parallel.mesh import create_mesh, describe_mesh, mesh_self_check
from repurpose_tpu.parallel.sharding import shard_params
from repurpose_tpu.train.checkpoint import Checkpointer
from repurpose_tpu.train.state import TrainState, create_train_state
from repurpose_tpu.train.step import make_eval_step, make_train_step
from repurpose_tpu.utils.logging_utils import MetricLogger
from repurpose_tpu.utils.metrics import calculate_tiou

logger = logging.getLogger(__name__)

TIOU_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        workdir: str,
        train_ds,
        val_ds=None,
        test_ds=None,
        mesh=None,
        use_wandb: bool = False,
        self_check: bool = False,
        async_checkpoints: bool = False,
        init_params=None,
    ):
        self.cfg = cfg
        self.workdir = workdir
        self.mesh = mesh if mesh is not None else create_mesh(cfg.mesh)
        logger.info(describe_mesh(self.mesh))
        if self_check:
            mesh_self_check(self.mesh)

        tc = cfg.train
        if tc.pack_sequences and tc.loss_norm == "config_batch_size":
            logger.warning(
                "pack_sequences with loss_norm='config_batch_size' divides the "
                "loss by ROWS, not videos (packed rows hold several videos); "
                "use loss_norm='batch_size' for per-video normalization"
            )
        if tc.pack_sequences and cfg.model.attention_impl == "ring":
            raise ValueError("pack_sequences is not supported with ring attention")
        # pack_sequences composes with ANY bucket length: past STREAM_MAX_T
        # the packed streaming/HBM attention kernels take over
        # (ops/flash_attention.py), so long-video configs pack too.
        self.train_loader = BatchLoader(
            train_ds,
            batch_size=tc.batch_size,
            buckets=tc.buckets,
            shuffle=True,
            seed=tc.seed,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            pack=tc.pack_sequences,
        )
        self.val_ds = val_ds
        self.test_ds = test_ds

        steps_per_epoch = max(self.train_loader.batches_per_epoch(0), 1)
        self.steps_per_epoch = steps_per_epoch
        rng = jax.random.key(tc.seed)
        mesh_axes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        self._seq_sharded = (
            cfg.model.attention_impl == "ring" and mesh_axes.get("seq", 1) > 1
        )
        model_mesh = self.mesh if cfg.model.attention_impl == "ring" else None
        state, tx, schedule = create_train_state(
            cfg.model, tc, steps_per_epoch, rng, mesh=model_mesh
        )
        if init_params is not None:
            # warm start (e.g. train.py --torch_ckpt: a converted reference
            # .pth): same tree/shapes as the random init, so the freshly
            # zero-initialized Adam moments stay valid; optimizer/schedule
            # start from step 0 like the reference's own fine-tune path
            state = state.replace(
                params=jax.tree.map(
                    lambda ref, p: jnp.asarray(p, dtype=ref.dtype),
                    state.params, init_params,
                )
            )
        self.state = self._place(state)
        # Pipe axis > 1: swap the forward for the pipelined one. GPipe
        # (parallel/pipeline.py) rides make_train_step unchanged; the 1F1B
        # schedule (parallel/pipeline_1f1b.py, the default — O(stages)
        # activation memory) replaces the whole grad computation, keeping
        # the same (state, batch, rng) -> (state, metrics) contract.
        pp_model = None
        pp_schedule = None
        if mesh_axes.get("pipe", 1) > 1:
            from repurpose_tpu.parallel.pipeline import PipelinedMMCT, validate_pipeline

            if tc.grad_accum_steps > 1:
                raise ValueError(
                    "grad_accum_steps > 1 does not compose with pipeline "
                    "parallelism — pipeline microbatches already serve that "
                    "role; raise pipeline_microbatches instead"
                )

            # The jitted step sees the GLOBAL batch (batch_size is
            # per-process, DistributedSampler semantics) — validate that.
            validate_pipeline(
                cfg.model, self.mesh, tc.pipeline_microbatches,
                tc.batch_size * jax.process_count(),
            )
            pp_schedule = tc.pipeline_schedule
            # eval is forward-only; it always rides the GPipe forward.
            pp_model = PipelinedMMCT(cfg.model, self.mesh, tc.pipeline_microbatches)
            logger.info(
                "pipeline parallelism: %d stages x %d microbatches (%s)",
                mesh_axes["pipe"], tc.pipeline_microbatches, pp_schedule,
            )
        # Three compiled steps, matching the observability cadences: per-layer
        # grad norms are logged 1/10 steps (reference main.py:345-367) and
        # histograms 1/1000 (wandb.watch cadence). Device-side the telemetry
        # is measured FREE (84.8 ms/step for plain/norms/hist alike at
        # T=2048 on v5e — the reductions hide under the model pass), so the
        # split's real effect is skipping the off-cadence host FETCHES of
        # unconsumed telemetry buffers, which ride this box's tunnel RPC.
        # ZeRO-1 (TrainConfig.shard_opt_state): Adam moments shard over the
        # data axis; a no-op on data=1 meshes.
        zero1 = tc.shard_opt_state and mesh_axes.get("data", 1) > 1
        if pp_schedule == "1f1b":
            from repurpose_tpu.parallel.pipeline_1f1b import make_1f1b_train_step

            def _mk(norms: bool, hist: bool):
                return make_1f1b_train_step(
                    cfg.model, tc, tx, schedule, mesh=self.mesh,
                    n_microbatches=tc.pipeline_microbatches,
                    per_layer_grad_norms=norms, grad_histograms=hist,
                    zero1=zero1,
                )
        else:
            def _mk(norms: bool, hist: bool):
                return make_train_step(
                    cfg.model, tc, tx, schedule, mesh=model_mesh, model=pp_model,
                    per_layer_grad_norms=norms, grad_histograms=hist,
                    zero1_mesh=self.mesh if zero1 else None,
                )

        self.train_step = _mk(False, False)
        self.train_step_norms = _mk(True, False)
        self.train_step_hist = _mk(True, True)
        self.eval_step = make_eval_step(cfg.model, tc, mesh=model_mesh, model=pp_model)
        # rbg keys cut the step 30% on v5e (TrainConfig.rng_impl docstring)
        impl = "rbg" if tc.rng_impl == "rbg" else None
        self.step_rng = jax.random.key(tc.seed + 1, impl=impl)
        # Observability cadences (reference: per-Linear grad norms every 10
        # iters, main.py:345-367; wandb.watch default histogram freq 1000,
        # main.py:264; the divergence probe is the only one that syncs).
        self.grad_norm_freq = 10
        self.hist_freq = 1000
        self.finite_check_freq = 50
        from repurpose_tpu.train.step import kernel_layer_names

        self._layer_names = kernel_layer_names(state.params)

        self.checkpointer = Checkpointer(workdir + "/ckpt", async_save=async_checkpoints)
        self._best_ckpt: Checkpointer | None = None  # lazy (workdir/ckpt_best)
        self.metrics = MetricLogger(workdir, use_wandb=use_wandb, config=cfg.to_dict())
        # Ring attention stays live at eval (seq-sharded batches through the
        # same mesh) when shapes divide the mesh axes and eval is not the
        # per-process multi-host path; otherwise it falls back to gather
        # attention on replicated batches — same math, different partitioning.
        axis = mesh_axes
        ring_eval = (
            self._seq_sharded
            and jax.process_count() == 1
            and tc.batch_size % axis.get("data", 1) == 0
            and all(b % axis.get("seq", 1) == 0 for b in tc.buckets)
        )
        keep_impl = cfg.model.attention_impl != "ring" or ring_eval
        if cfg.model.attention_impl == "ring" and not ring_eval:
            logger.warning(
                "ring attention disabled for EVAL (train keeps it): batch %d / "
                "buckets %s don't divide mesh axes %s, or multi-host — eval "
                "falls back to gather attention on replicated batches",
                tc.batch_size, tc.buckets, axis,
            )
        eval_model_cfg = dataclasses.replace(
            cfg.model, dropout=0.0,
            attention_impl=cfg.model.attention_impl if keep_impl else "auto",
        )
        # params=None: the initial params get DONATED by the first train
        # step; evaluate() always passes the live ones explicitly.
        self._eval_model_cfg = eval_model_cfg
        self._ring_eval_mesh = self.mesh if ring_eval else None
        self.pipeline = InferencePipeline(
            eval_model_cfg, None, cfg.test_cfg, mesh=self._ring_eval_mesh,
        )
        self._debug_pipeline = None  # lazy raw-outputs variant (debug_viz)
        from repurpose_tpu.models import build_model

        # mesh must follow attention_impl: a retained "ring" impl needs the
        # mesh at build time (encoder.py raises otherwise)
        _fwd_model = build_model(
            dataclasses.replace(eval_model_cfg, dropout=cfg.model.dropout),
            mesh=self.mesh if ring_eval else None,
        )
        self._fwd = jax.jit(
            lambda p, v, a, t, m: _fwd_model.apply({"params": p}, v, a, t, m, True)
        )
        self.best_tiou = 0.0
        self.best_epoch = -1
        self.start_epoch = 0

    # -- placement -------------------------------------------------------------

    def _place(self, state: TrainState) -> TrainState:
        # Params follow the TP rules; optimizer moments pick up matching
        # shardings from the first jitted step's output layout — except under
        # ZeRO-1, where they are placed data-sharded up front so even the
        # first step's inputs carry the sharded layout.
        params = shard_params(state.params, self.mesh)
        opt_state = state.opt_state
        axes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        if self.cfg.train.shard_opt_state and axes.get("data", 1) > 1:
            from repurpose_tpu.parallel.sharding import zero1_opt_shardings

            opt_state = jax.device_put(
                opt_state, zero1_opt_shardings(opt_state, self.mesh)
            )
        return dataclasses.replace(state, params=params, opt_state=opt_state)

    def _device_batch(self, batch: Batch) -> Batch:
        from repurpose_tpu.parallel.sharding import make_global_batch

        return make_global_batch(batch, self.mesh, seq_sharded=self._seq_sharded)

    def eval_forward(self, batch: Batch):
        """Raw model outputs for debugging/visualization."""
        return self._fwd(
            self.state.params, batch.visual, batch.audio, batch.text, batch.mask
        )

    # -- checkpointing ---------------------------------------------------------

    def resume(self) -> bool:
        step = self.checkpointer.latest_step()
        if step is None:
            return False
        self.state, meta = self.checkpointer.restore(self.state, step)
        self.start_epoch = int(meta.get("epoch", 0))
        self.best_tiou = float(meta.get("best_tiou", 0.0))
        self.best_epoch = int(meta.get("best_epoch", -1))
        logger.info("resumed from step %d (epoch %d)", step, self.start_epoch)
        return True

    def _assert_finite(self) -> None:
        """Raise if any train step so far produced a non-finite loss/grad.

        Every step is checked device-side inside the compiled step
        (TrainState.nonfinite_count), so this one-scalar fetch covers the full
        history — unlike the reference, which has no divergence guard and will
        happily checkpoint NaN weights."""
        bad = int(jax.device_get(self.state.nonfinite_count))
        if bad:
            raise FloatingPointError(
                f"{bad} train step(s) produced non-finite loss/gradients "
                f"(by step {int(self.state.step)}); refusing to continue"
            )

    def _save(
        self, epoch: int, extra: dict | None = None, epoch_complete: bool = True
    ) -> None:
        # Never persist a poisoned state: the resume path must not restore NaNs.
        self._assert_finite()
        meta = {
            # epoch_complete=False (mid-epoch preemption save): resume must
            # RE-RUN this epoch — recording epoch+1 would silently skip its
            # remaining batches. The epoch's early batches are re-trained on
            # restart (standard preemption semantics).
            "epoch": epoch + 1 if epoch_complete else epoch,
            "best_tiou": self.best_tiou,
            "best_epoch": self.best_epoch,
        }
        meta.update(extra or {})
        self.checkpointer.save(int(self.state.step), self.state, meta)

    def _save_best(self, epoch: int) -> None:
        """Best-tIoU weights go to a DEDICATED single-slot manager
        (workdir/ckpt_best) — the reference saves best.pth separately from
        epoch_N.pth (main.py:718-739). Inside the periodic manager they would
        be garbage-collected once max_to_keep newer epoch saves exist."""
        if self._best_ckpt is None:
            self._best_ckpt = Checkpointer(
                self.workdir + "/ckpt_best", max_to_keep=1
            )
        self._best_ckpt.save(
            int(self.state.step), self.state,
            {"epoch": epoch + 1, "best_tiou": self.best_tiou,
             "best_epoch": self.best_epoch, "best": True},
        )

    # -- validation probe --------------------------------------------------------

    def _val_probe(self, max_batches: int = 10) -> float | None:
        if self.val_ds is None:
            return None
        losses = []
        # deterministic (shuffle=False), so build once and reuse — a fresh
        # loader every probe would re-group the whole val set each 50 steps
        if not hasattr(self, "_val_loader"):
            self._val_loader = BatchLoader(
                self.val_ds,
                batch_size=self.cfg.train.batch_size,
                buckets=self.cfg.train.buckets,
                shuffle=False,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            )
        for batch in itertools.islice(self._val_loader.epoch(0), max_batches):
            out = self.eval_step(self.state.params, self._device_batch(batch))
            # Reference normalizes the val probe by the ACTUAL batch size
            # (main.py:460-463); n_real counts real samples in the GLOBAL batch.
            losses.append(float(out["cls_loss"]) / max(int(out["n_real"]), 1))
        return float(np.mean(losses)) if losses else None

    # -- evaluation ---------------------------------------------------------------

    def _host_local_params(self):
        """A fully-replicated, host-local copy of the live params.

        Multi-host, params may be sharded (TP) across the global mesh; the
        decode+NMS eval runs per-process on local devices (the reference's
        per-rank DDP eval, main.py:571-705, where every rank holds full
        params), so gather once per eval: one XLA all-gather to a replicated
        layout, then a single host fetch."""
        if jax.process_count() == 1:
            return self.state.params
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())
        gathered = jax.jit(lambda p: p, out_shardings=rep)(self.state.params)
        # re-materialize as device arrays: returning the raw device_get numpy
        # tree would re-stage the full model host->device on EVERY eval batch
        return jax.tree.map(jnp.asarray, jax.device_get(gathered))

    def evaluate(
        self,
        dataset=None,
        max_videos: int | None = None,
        debug_viz: bool = False,
        max_debug_samples: int = 10,
        pack: bool | None = None,
    ) -> dict:
        """Precision@tIoU over the given dataset (default: test split).

        ``pack`` sequence-packs each bucket's videos before scoring
        (value-identical results, ~1.5x device throughput at corpus
        durations — docs/SERVING.md); defaults to the training config's
        ``pack_sequences``. Falls back to unpacked when the dataset exposes
        no ``lengths()`` or a ring-attention mesh is live.

        Multi-host: each process scores a strided shard of the dataset (the
        DistributedSampler analog of the reference's in-run DDP eval,
        main.py:178-187 + 571-705 — without the sampler's duplicate-padding,
        so the global metric is exact); per-threshold sums are reduced across
        processes, and every process returns the identical global result.
        This is a collective: in a multi-process run, call it from all
        processes.

        ``debug_viz`` renders per-sample prediction figures + JSON health log
        for the first batches (the reference visualizes 10 test batches each
        eval, main.py:648-666) including the model-collapse check.
        """
        ds = dataset if dataset is not None else self.test_ds
        if ds is None:
            return {}
        rank, world = jax.process_index(), jax.process_count()
        params = self._host_local_params()
        bs = self.cfg.train.batch_size
        buckets = self.cfg.train.buckets
        n = len(ds) if max_videos is None else min(len(ds), max_videos)
        my_idx = list(range(rank, n, world))
        sums = {t: 0.0 for t in TIOU_THRESHOLDS}
        count = 0
        debugger = None
        want_debug = debug_viz and rank == 0
        if want_debug:
            from repurpose_tpu.utils.debug_viz import ValidationDebugger

            debugger = ValidationDebugger(self.workdir)
            if self._debug_pipeline is None:
                # raw-outputs variant: the decode program also returns the
                # model's per-second logits/offsets, so debug figures reuse
                # the SAME forward instead of a second one per batch
                self._debug_pipeline = InferencePipeline(
                    self._eval_model_cfg, None, self.cfg.test_cfg,
                    mesh=self._ring_eval_mesh, raw_outputs=True,
                )
        pipeline = self._debug_pipeline if want_debug else self.pipeline
        entries = getattr(ds, "entries", None)
        use_pack = self.cfg.train.pack_sequences if pack is None else pack
        if use_pack and pipeline._mesh is not None:
            logger.info("packed eval is unsupported with a live ring mesh; "
                        "scoring unpacked")
            use_pack = False
        if use_pack and not hasattr(ds, "lengths"):
            logger.info("packed eval needs a dataset exposing lengths(); "
                        "scoring unpacked")
            use_pack = False
        # FIFO of host-side per-batch metadata consumed in dispatch order
        # (score_stream yields FIFO); features themselves are NOT retained.
        meta_fifo: collections.deque = collections.deque()

        def meta_for(i, sample=None):
            # GT must not depend on WHICH staging path ran: prefer the
            # dataset's entries (same source the fast path reads) so a
            # keep_gt_segments=False dataset scores identically with and
            # without the native loader.
            if entries is not None:
                return {
                    "video_id": entries[i]["youtube_id"],
                    "gt_segments": [
                        list(s) for s in entries[i]["segmentsOffset"]
                    ],
                }
            return {
                "video_id": sample["video_id"],
                "gt_segments": sample.get("gt_segments") or [],
            }

        def staged(stage_idx):
            # Host staging for batch i+1 overlaps device compute for batch i
            # via score_stream's in-flight window; the native whole-batch
            # loader (RepurposeDataset.load_batch) skips per-sample numpy
            # round-trips where it applies.
            if hasattr(ds, "lengths"):
                # group STRICTLY per bucket and chunk within each group
                # (score_videos' shape, infer.py): interleaved lengths would
                # pad nearly every chunk to its longest member's bucket, and
                # a mere sort still mixes buckets in the boundary chunks
                from repurpose_tpu.data.batching import pick_bucket

                lens_all = ds.lengths()
                groups: dict[int, list[int]] = {}
                for i in stage_idx:
                    groups.setdefault(
                        pick_bucket(int(lens_all[i]), buckets), []
                    ).append(i)
                chunks = [
                    groups[b][j : j + bs]
                    for b in sorted(groups)
                    for j in range(0, len(groups[b]), bs)
                ]
            else:
                chunks = [
                    stage_idx[j : j + bs] for j in range(0, len(stage_idx), bs)
                ]
            for idxs in chunks:
                batch = None
                if hasattr(ds, "load_batch"):
                    batch = ds.load_batch(idxs, buckets, bs)
                if batch is not None and entries is not None:
                    metas = [meta_for(i) for i in idxs]
                else:
                    # datasets with load_batch but no entries would re-read
                    # features here just for metas; none exist today
                    # (RepurposeDataset carries entries) — if one appears,
                    # give it a light per-sample metadata accessor
                    samples = [ds[i] for i in idxs]
                    if batch is None:
                        batch = collate(samples, buckets, bs)
                    metas = [meta_for(i, s) for i, s in zip(idxs, samples)]
                for j, m in enumerate(metas):  # per-video debug-viz rows
                    m["labels_row"] = batch.labels[j]
                    m["segments_row"] = batch.segments[j]
                    m["duration"] = int(batch.durations[j])
                meta_fifo.append(metas)
                yield (
                    batch.visual, batch.audio, batch.text, batch.mask,
                    batch.durations, [m["video_id"] for m in metas],
                )

        def staged_packed(stage_idx, lens):
            # SEQUENCE-PACKED staging: plan FFD from ds.lengths() (no
            # feature load), then load only each batch's videos and pack
            # them (data/batching.py:iter_packed_batches). Same overlap
            # contract — score_packed_stream keeps ``depth`` batches in
            # flight.
            from repurpose_tpu.data.batching import iter_packed_batches

            for batch, layout, gidx, samples in iter_packed_batches(
                lambda i: ds[i], lens, buckets, bs, indices=stage_idx
            ):
                metas = []
                for i, s in zip(gidx, samples):  # packed (row-major) order
                    m = meta_for(i, s)
                    d_k = min(int(s["duration"]), batch.visual.shape[1])
                    m["labels_row"] = s.get("labels", np.zeros(d_k, np.float32))
                    m["segments_row"] = s.get(
                        "segments", np.zeros((d_k, 2), np.float32)
                    )
                    m["duration"] = d_k
                    metas.append(m)
                meta_fifo.append(metas)
                yield batch, layout, [m["video_id"] for m in metas]

        def consume(stream):
            nonlocal count
            for results in stream:
                metas = meta_fifo.popleft()
                for meta, r in zip(metas, results):
                    tiou = calculate_tiou(
                        meta["gt_segments"], r["segments"].tolist(),
                        TIOU_THRESHOLDS,
                    )
                    for t in TIOU_THRESHOLDS:
                        sums[t] += tiou[t]
                    count += 1
                    if (
                        debugger is not None
                        and len(debugger.samples) < max_debug_samples
                    ):
                        d = meta["duration"]
                        x = np.asarray(r["raw_logits"], np.float64)
                        probs = np.where(  # overflow-safe sigmoid
                            x >= 0, 1.0 / (1.0 + np.exp(-np.abs(x))),
                            np.exp(-np.abs(x)) / (1.0 + np.exp(-np.abs(x))),
                        )
                        debugger.add_sample(
                            meta["video_id"],
                            probs=probs,
                            offsets=r["raw_offsets"],
                            gt_labels=np.asarray(meta["labels_row"])[:d],
                            gt_offsets=np.asarray(meta["segments_row"])[:d],
                            pred_segments=r["segments"],
                            gt_segments=meta["gt_segments"],
                        )

        if use_pack:
            # every bucket length packs: past STREAM_MAX_T the packed
            # streaming/HBM attention kernels take over (mha_pallas)
            lens = [int(t) for t in ds.lengths()]
            consume(
                pipeline.score_packed_stream(
                    staged_packed(my_idx, lens), params=params
                )
            )
        else:
            consume(pipeline.score_stream(staged(my_idx), params=params))
        if debugger is not None:
            paths = debugger.render(max_debug_samples)
            debugger.write_log()
            self.metrics.log_images(paths, int(self.state.step))
        if world > 1:
            # Sum the per-threshold tIoU sums and video counts globally so
            # every process reports the same metric (reference main.py:686-705
            # averages per-rank; here the reduction is exact).
            from jax.experimental import multihost_utils

            vec = np.array(
                [sums[t] for t in TIOU_THRESHOLDS] + [count], np.float32
            )
            total = np.asarray(multihost_utils.process_allgather(vec)).sum(axis=0)
            sums = {t: float(total[i]) for i, t in enumerate(TIOU_THRESHOLDS)}
            count = int(round(float(total[-1])))
        out = {
            f"tiou/{t}": (sums[t] / count if count else 0.0)
            for t in TIOU_THRESHOLDS
        }
        out["tiou/mean"] = float(np.mean([out[f"tiou/{t}"] for t in TIOU_THRESHOLDS]))
        return out

    # -- main loop ------------------------------------------------------------------

    def fit(self, epochs: int | None = None) -> dict:
        tc = self.cfg.train
        epochs = epochs if epochs is not None else tc.epochs

        # Preemption-safe training (capability beyond the reference, which
        # loses up to save_epochs of work on eviction): SIGTERM checkpoints
        # the current state before exiting.
        import signal

        preempted = {"flag": False}

        def _on_sigterm(signum, frame):
            preempted["flag"] = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # non-main thread (tests)
            prev_handler = None

        try:
            return self._fit_loop(epochs, preempted)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _fit_loop(self, epochs: int, preempted: dict) -> dict:
        tc = self.cfg.train
        final_eval: dict = {}
        epoch_loss = 0.0
        # Host-side step mirror: int(self.state.step) would block on the
        # device every iteration (a tunnel round-trip per step on this box,
        # CLAUDE.md), killing async dispatch. The jitted step increments by
        # exactly 1, so the mirror never drifts.
        step = int(jax.device_get(self.state.step))
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            epoch_losses = []
            for i, batch in enumerate(self.train_loader.epoch(epoch)):
                # telemetry variants only on their cadences (this step's
                # result has step+1, hence the off-by-one in the predicate)
                hist_now = (step + 1) % self.hist_freq == 0 or step == 0
                norms_now = i % self.grad_norm_freq == 0
                step_fn = (
                    self.train_step_hist if hist_now
                    else self.train_step_norms if norms_now
                    else self.train_step
                )
                self.state, m = step_fn(
                    self.state, self._device_batch(batch), self.step_rng
                )
                step += 1
                epoch_losses.append(m["loss"])
                if step % self.finite_check_freq == 1:
                    # Bounded-delay divergence probe; every step was already
                    # checked on device (TrainState.nonfinite_count), this is
                    # just the periodic host sync that surfaces it.
                    self._assert_finite()
                if i % self.grad_norm_freq == 0:
                    record = {
                        "batch/loss": m["loss"],
                        "batch/cls_loss": m["cls_loss"],
                        "batch/grad_norm": m["grad_norm"],
                        "batch/learning_rate": m.get("learning_rate", 0.0),
                    }
                    # Per-layer grad norms ride the same log record
                    # (reference main.py:345-367, every 10 iters).
                    norms = np.asarray(m["grad_norms/stacked"])
                    record.update(
                        {f"grad_norm/{n}": norms[j]
                         for j, n in enumerate(self._layer_names)}
                    )
                    self.metrics.log(record, step)
                if hist_now:
                    self.metrics.log_histograms(
                        self._layer_names,
                        m["hist/grads/counts"], m["hist/grads/edges"],
                        step, prefix="grads",
                    )
                    from repurpose_tpu.train.step import param_histograms

                    ph = param_histograms(self.state.params)
                    self.metrics.log_histograms(
                        self._layer_names, ph["counts"], ph["edges"],
                        step, prefix="params",
                    )
                if tc.intra_epoch_eval_freq and (i + 1) % tc.intra_epoch_eval_freq == 0:
                    val_loss = self._val_probe()
                    if val_loss is not None:
                        self.metrics.log({"val/loss": val_loss}, step)
                stop_now = preempted["flag"]
                if jax.process_count() > 1:
                    # The preemption save is a multi-host COLLECTIVE (Orbax
                    # barriers on every process): a lone host acting on its
                    # local SIGTERM while the others keep training deadlocks
                    # both sides. Agree on the flag across hosts on the
                    # grad-norm cadence — SIGTERM grace windows are tens of
                    # seconds, a 10-step agreement delay is milliseconds.
                    if i % self.grad_norm_freq == 0:
                        from jax.experimental import multihost_utils

                        stop_now = bool(
                            np.any(
                                multihost_utils.process_allgather(
                                    np.asarray(preempted["flag"])
                                )
                            )
                        )
                    else:
                        stop_now = False
                if stop_now:
                    logger.warning("SIGTERM received: checkpointing and exiting")
                    self._save(epoch, {"preempted": True}, epoch_complete=False)
                    return {"preempted": True, "epoch": epoch}
            epoch_loss = float(jnp.mean(jnp.stack(epoch_losses))) if epoch_losses else 0.0
            self.metrics.log(
                {"epoch": epoch + 1, "epoch/loss": epoch_loss,
                 "epoch/time_s": time.time() - t0},
                int(self.state.step),
            )

            if (epoch + 1) % tc.save_epochs == 0:
                self._save(epoch)
            if (
                self.test_ds is not None
                and tc.eval_freq
                and (epoch + 1) % tc.eval_freq == 0
            ):
                final_eval = self.evaluate(
                    debug_viz=getattr(self, "debug_viz", False)
                )
                self.metrics.log(final_eval, int(self.state.step))
                if final_eval.get("tiou/mean", 0.0) > self.best_tiou:
                    self.best_tiou = final_eval["tiou/mean"]
                    self.best_epoch = epoch
                    self._save_best(epoch)
        self.start_epoch = epochs  # resumable: a later fit() continues from here
        return {
            "best_tiou": self.best_tiou,
            "best_epoch": self.best_epoch,
            "final_loss": epoch_loss,
            **final_eval,
        }

    def close(self) -> None:
        self.metrics.close()
        self.checkpointer.close()
        if self._best_ckpt is not None:
            self._best_ckpt.close()


def fit_with_auto_resume(
    make_trainer,
    epochs: int | None = None,
    max_restarts: int = 3,
    resume_first: bool = False,
    on_complete=None,
) -> dict:
    """Elastic supervision: run ``fit()``; on an unexpected crash, rebuild the
    Trainer via ``make_trainer()``, restore the latest checkpoint, and
    continue — up to ``max_restarts`` times (the in-process half of elastic
    training; process-level kills are covered by re-running the same command,
    which hits the identical resume path).

    Deliberately NOT retried:
    - ``FloatingPointError`` (the NaN guard): resuming deterministically
      replays the divergence;
    - SIGTERM preemption: fit() already checkpointed and returned
      ``{"preempted": True}`` — exit cleanly so the scheduler reschedules;
    - ``KeyboardInterrupt``.
    """
    restarts = 0
    trainer = make_trainer()
    if resume_first:
        trainer.resume()
    while True:
        try:
            summary = trainer.fit(epochs=epochs)
        except (FloatingPointError, KeyboardInterrupt):
            trainer.close()
            raise
        except Exception as e:
            restarts += 1
            logger.warning(
                "training crashed (%s: %s); auto-resume %d/%d",
                type(e).__name__, e, restarts, max_restarts,
            )
            try:
                trainer.close()
            except Exception:
                pass
            if restarts > max_restarts:
                raise
            trainer = make_trainer()
            trainer.resume()
            continue
        # outside the try: a failure in the caller's completion hook (e.g.
        # train.py's --export_torch) must propagate, not trigger a pointless
        # retraining cycle — but never leak the trainer's threads/loggers
        summary["restarts"] = restarts
        try:
            if on_complete is not None:
                on_complete(trainer, summary)
        finally:
            trainer.close()
        return summary
