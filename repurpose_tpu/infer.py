"""Device-side batched inference pipeline: features -> ranked clips.

Replaces the reference's per-video Python loop with CPU Soft-NMS
(MMCTransformer.inference_, models/MMCTransformer.py:231-275): here the
forward pass, decode, and Soft-NMS all run on-device under one jit per bucket
shape, vmapped over the batch; the host only unpacks fixed-size keep masks
into per-video result lists.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from repurpose_tpu.config import ModelConfig, TestConfig
from repurpose_tpu.data.batching import pick_bucket
from repurpose_tpu.models import build_model
from repurpose_tpu.ops.decode import (
    DecodeResult,
    decode_batch,
    decode_packed,
    unpack_rows,
)


def _unpack(res: DecodeResult, durations, video_ids, raw=None) -> list[dict]:
    """Fixed-size decode output -> per-video result dicts (rows beyond
    len(video_ids) are batch padding from ragged final batches).

    ``raw`` (cls_logits [B,T,1], offsets [B,T,2]) attaches the model's raw
    per-second outputs, duration-sliced, as ``raw_logits``/``raw_offsets`` —
    so debug/visualization consumers reuse the decode program's forward
    instead of running a second one (Trainer.evaluate debug_viz)."""
    # ONE device_get for every output: sequential np.asarray fetches pay a
    # full D2H round trip each (~33 ms over a network-attached device —
    # 4 serial fetches dominated per-request serving latency,
    # tools/bench_serve.py); a single pytree fetch overlaps the transfers.
    fetch = [res.segments, res.scores, res.labels, res.keep]
    if raw is not None:
        fetch += [raw[0], raw[1]]
    import jax

    fetched = jax.device_get(fetch)
    segments, scores, labels, keep = (np.asarray(a) for a in fetched[:4])
    if raw is not None:
        raw_logits = np.asarray(fetched[4])
        raw_offsets = np.asarray(fetched[5])
    out = []
    for b in range(segments.shape[0]):
        k = keep[b]
        has_id = video_ids is not None and b < len(video_ids)
        r = {
            "segments": segments[b][k],
            "scores": scores[b][k],
            "labels": labels[b][k],
            "video_id": video_ids[b] if has_id else str(b),
            "duration": int(durations[b]),
        }
        if raw is not None:
            d = int(durations[b])
            r["raw_logits"] = raw_logits[b, :d, 0]
            r["raw_offsets"] = raw_offsets[b, :d]
        out.append(r)
    return out


class InferencePipeline:
    """Scores batches of per-second features and returns ranked clip lists.

    One compiled program per (batch, bucket) shape; reuse the instance to hit
    the jit cache.
    """

    def __init__(
        self, cfg: ModelConfig, params, test_cfg: TestConfig, mesh=None,
        raw_outputs: bool = False,
    ):
        """``mesh``: pass the training mesh to keep ``attention_impl="ring"``
        live at evaluation — batches are then staged seq-sharded and the whole
        forward+decode runs sequence-parallel (requires batch % data-axis == 0
        and bucket % seq-axis == 0). Without a mesh (or with seq=1), ring
        falls back to gather attention on replicated batches — same values."""
        import dataclasses

        self._mesh = None
        if cfg.attention_impl == "ring":
            seq_n = 0
            if mesh is not None:
                seq_n = dict(zip(mesh.axis_names, mesh.devices.shape)).get("seq", 1)
            if seq_n > 1:
                self._mesh = mesh
            else:
                cfg = dataclasses.replace(cfg, attention_impl="auto")
        self.cfg = cfg
        self.test_cfg = test_cfg
        self.params = params
        self.raw_outputs = raw_outputs
        model = build_model(cfg, mesh=self._mesh)

        @jax.jit
        def _forward_and_decode(params, visual, audio, text, mask, durations):
            out = model.apply(
                {"params": params}, visual, audio, text, mask, True
            )
            res = decode_batch(
                out.cls_logits[..., 0], out.offsets, mask, durations, test_cfg
            )
            if raw_outputs:
                # already computed on device; returning them costs one small
                # extra host fetch and saves debug consumers a second forward
                return res, (out.cls_logits, out.offsets)
            return res

        self._fn = _forward_and_decode

        @jax.jit
        def _forward_and_decode_packed(
            params, visual, audio, text, mask, seg_ids, positions,
            row_of, start, length,
        ):
            # sequence-packed batch (data/batching.py:pack_batch): several
            # videos per row, block-diagonal attention; unpack the outputs to
            # per-video rows on device before the ordinary decode. Capacity
            # padding (length-0 layout entries) decodes to keep=all-False.
            out = model.apply(
                {"params": params}, visual, audio, text, mask, True,
                seg_ids=seg_ids, positions=positions,
            )
            if raw_outputs:
                # needs the unpacked intermediates for the debug consumers,
                # so spell out decode_packed's body (ops/decode.py:166)
                logits_v, mask_v = unpack_rows(
                    out.cls_logits[..., 0], row_of, start, length
                )
                offsets_v, _ = unpack_rows(out.offsets, row_of, start, length)
                res = decode_batch(logits_v, offsets_v, mask_v, length, test_cfg)
                return res, (logits_v[..., None], offsets_v)
            return decode_packed(
                out.cls_logits[..., 0], out.offsets, row_of, start, length, test_cfg
            )

        self._fn_packed = _forward_and_decode_packed

    def _stage(self, visual, audio, text, mask, durations):
        """Host arrays -> device. Seq-sharded placement when ring is live."""
        mask = jnp.asarray(mask, bool)
        durations = jnp.asarray(durations, jnp.int32)
        if self._mesh is None:
            return (
                jnp.asarray(visual), jnp.asarray(audio), jnp.asarray(text),
                mask, durations,
            )
        from jax.sharding import NamedSharding, PartitionSpec as P

        feat = NamedSharding(self._mesh, P("data", "seq", None))
        return (
            jax.device_put(jnp.asarray(visual), feat),
            jax.device_put(jnp.asarray(audio), feat),
            jax.device_put(jnp.asarray(text), feat),
            jax.device_put(mask, NamedSharding(self._mesh, P("data", "seq"))),
            jax.device_put(durations, NamedSharding(self._mesh, P("data"))),
        )

    def score_batch(
        self,
        visual: Any,  # [B, T, vis_dim]
        audio: Any,
        text: Any,
        mask: Any,  # [B, T] bool
        durations: Sequence[int],
        video_ids: Sequence[str] | None = None,
        params: Any = None,
    ) -> list[dict]:
        """Returns one dict per video: {segments (N,2), scores (N,), labels (N,),
        video_id, duration} — the reference's per-video result schema
        (MMCTransformer.py:226-228, 270-272). ``params`` overrides the
        instance params (e.g. the current train state during eval)."""
        out = self._fn(
            params if params is not None else self.params,
            *self._stage(visual, audio, text, mask, durations),
        )
        res, raw = out if self.raw_outputs else (out, None)
        return _unpack(res, durations, video_ids, raw)

    def score_videos(
        self,
        videos: Sequence[dict],
        buckets: Sequence[int] = (256, 512, 1024, 2048),
        batch_size: int = 8,
        depth: int = 2,
        params: Any = None,
        pack: bool = False,
    ) -> list[dict]:
        """Serve ragged per-video features with multi-bucket auto-routing.

        ``videos``: dicts with ``visual [T,512] / audio [T,2048] / text
        [T,384]`` (per-second features, possibly different T per video) and an
        optional ``video_id``. Each video routes to the smallest bucket >= its
        length (longer ones truncate to the largest — the reference's de facto
        PE cap, models/MMCTransformer.py:11), videos sharing a bucket pack
        into ``batch_size`` batches (ragged final batches zero-pad), and all
        batches stream through ``score_stream`` so at most ``len(buckets)``
        programs compile and host packing overlaps device compute. Results
        return in input order.

        The reference scores one video per program at its exact length
        (inference.py:31 batch_size=1) — every new length is a new CUDA graph
        here replaced by a handful of static shapes.

        ``pack=True`` additionally SEQUENCE-PACKS each bucket's videos: FFD
        bin-packing lays several videos head-to-tail per row
        (data/batching.py:plan_packing), the model runs block-diagonal
        attention + per-video PE, and the outputs unpack to per-video rows on
        device before decode (ops/decode.py:unpack_rows) — results are
        value-identical to pack=False while the projection/FFN/head compute
        that pads ~35% of a realistic corpus batch scores real videos instead.
        Not yet supported with a live ring-attention mesh (falls back).
        """
        if pack:
            if self._mesh is None:
                return self._score_videos_packed(
                    videos, buckets, batch_size, depth, params
                )
            import logging

            logging.getLogger(__name__).warning(
                "score_videos(pack=True) is not supported with a live "
                "ring-attention mesh; scoring unpacked"
            )
        import collections

        buckets = sorted(buckets)
        # Bucket routing from lengths() when the sequence exposes it (lazy
        # dataset-backed inputs: no feature load just to measure length);
        # the per-video mask/duration below always comes from the features.
        if hasattr(videos, "lengths"):
            lens = [int(t) for t in videos.lengths()]
        else:
            lens = [
                min(len(v["visual"]), len(v["audio"]), len(v["text"]))
                for v in videos
            ]
        groups: dict[int, list[int]] = {}
        for i, t in enumerate(lens):
            groups.setdefault(pick_bucket(t, buckets), []).append(i)

        # Batches are built lazily and consumed through a FIFO so peak host
        # memory is ``depth`` staged batches, never the whole corpus — the
        # same contract as the packed path and inference.py's _LazyVideos.
        chunk_fifo: collections.deque = collections.deque()

        def batches():
            for bucket in sorted(groups):
                idxs = groups[bucket]
                for j in range(0, len(idxs), batch_size):
                    chunk = idxs[j : j + batch_size]
                    # Ragged tails zero-pad to a BUCKETED row count: the
                    # smallest power of two >= the real videos (<= log2(bs)+1
                    # programs per bucket instead of one, still static
                    # shapes). A lone serving request ships 1 row of H2D
                    # instead of batch_size — on a network-attached device
                    # the padded transfer dominated per-request latency
                    # (tools/bench_serve.py). Under a live ring mesh the row
                    # count stays the full batch_size so the data-axis
                    # sharding divides; _unpack drops rows beyond len(ids).
                    if self._mesh is None:
                        b = 1
                        while b < len(chunk):
                            b *= 2
                        b = min(b, batch_size)
                    else:
                        b = batch_size
                    vis = np.zeros((b, bucket, self.cfg.vis_dim), np.float32)
                    aud = np.zeros((b, bucket, self.cfg.aud_dim), np.float32)
                    txt = np.zeros((b, bucket, self.cfg.text_dim), np.float32)
                    mask = np.zeros((b, bucket), bool)
                    durs = np.zeros(b, np.int32)
                    ids = []
                    for r, i in enumerate(chunk):
                        v = videos[i]
                        t = min(
                            len(v["visual"]), len(v["audio"]), len(v["text"]), bucket
                        )
                        vis[r, :t] = v["visual"][:t]
                        aud[r, :t] = v["audio"][:t]
                        txt[r, :t] = v["text"][:t]
                        mask[r, :t] = True
                        durs[r] = t
                        ids.append(str(v.get("video_id", i)))
                    chunk_fifo.append(chunk)  # appended at dispatch, FIFO
                    yield (vis, aud, txt, mask, durs, ids)

        results: list[dict | None] = [None] * len(videos)
        # score_stream yields one result list per batch, in dispatch order
        for batch_results in self.score_stream(batches(), depth=depth, params=params):
            for i, r in zip(chunk_fifo.popleft(), batch_results):
                results[i] = r
        return results  # type: ignore[return-value]

    def _score_videos_packed(
        self, videos, buckets, batch_size: int, depth: int, params,
    ) -> list[dict]:
        """score_videos(pack=True) body, staged through
        data/batching.py:iter_packed_batches (rows padded to ``batch_size``,
        per-video layout padded to a bucket-constant capacity with length-0
        dummies; samples load lazily per batch). ``videos`` may expose
        ``lengths()`` (e.g. a dataset-backed lazy sequence) to plan packing
        without touching features. Packing covers every bucket length: past
        STREAM_MAX_T the packed streaming/HBM attention kernels take over
        (ops/flash_attention.py), so multi-hour buckets pack too."""
        import collections

        from repurpose_tpu.data.batching import iter_packed_batches

        buckets = sorted(buckets)
        if hasattr(videos, "lengths"):
            lengths = [int(t) for t in videos.lengths()]
        else:
            lengths = [
                min(len(v["visual"]), len(v["audio"]), len(v["text"]))
                for v in videos
            ]

        def fetch(i):
            v = videos[i]
            # duration from the FEATURES (same rule as the unpacked path's
            # min-over-streams), not the planning lengths — lengths() can be
            # a labels-derived upper bound longer than the feature files,
            # and packing by it would mask zero-filled tails as valid and
            # inflate the decode budget (packed != unpacked results).
            t = min(len(v["visual"]), len(v["audio"]), len(v["text"]))
            return {
                "visual": v["visual"], "audio": v["audio"], "text": v["text"],
                "duration": t, "video_id": v.get("video_id", i),
            }

        results: list[dict | None] = [None] * len(videos)
        gidx_fifo: collections.deque = collections.deque()

        def stream_items():
            for batch, layout, gidx, samples in iter_packed_batches(
                fetch, lengths, buckets, batch_size, row_bucket=True
            ):
                # ids from the already-fetched samples — indexing ``videos``
                # again would re-load features on lazy dataset-backed inputs
                ids = [
                    str(s.get("video_id", i)) for i, s in zip(gidx, samples)
                ]
                gidx_fifo.append(gidx)  # appended at dispatch, FIFO order
                yield batch, layout, ids

        for rs in self.score_packed_stream(stream_items(), depth=depth, params=params):
            for i, r in zip(gidx_fifo.popleft(), rs):
                results[i] = r
        return results  # type: ignore[return-value]

    def score_packed_stream(self, items, depth: int = 2, params: Any = None):
        """Pipelined SEQUENCE-PACKED scoring: ``items`` yields
        ``(batch, (row_of, start, length), video_ids)`` — a packed Batch from
        data/batching.py:pack_batch plus its packing_layout arrays, padded to
        a static per-bucket video capacity so each bucket reuses one compiled
        program. Yields one per-video result list per item, in dispatch
        order, keeping up to ``depth`` batches in flight (same overlap
        contract as score_stream). The packed counterpart has no reference
        equivalent (inference.py:31 scores batch_size=1)."""
        import collections

        p = params if params is not None else self.params
        pending: collections.deque = collections.deque()

        def dispatch(batch, layout, ids):
            out = self._fn_packed(
                p, jnp.asarray(batch.visual), jnp.asarray(batch.audio),
                jnp.asarray(batch.text), jnp.asarray(batch.mask, bool),
                jnp.asarray(batch.seg_ids), jnp.asarray(batch.positions),
                *(jnp.asarray(a) for a in layout),
            )
            res, raw = out if self.raw_outputs else (out, None)
            return res, list(layout[2]), ids, raw

        for batch, layout, ids in items:
            # drain to depth-1 before dispatching (same strict-depth contract
            # as score_stream)
            while len(pending) >= depth:
                yield _unpack(*pending.popleft())
            pending.append(dispatch(batch, layout, ids))
        while pending:
            yield _unpack(*pending.popleft())

    def score_stream(self, batches, depth: int = 2, params: Any = None):
        """Pipelined scoring: yields per-video result lists for an iterator of
        (visual, audio, text, mask, durations, video_ids) tuples, keeping up
        to ``depth`` batches in flight so host staging/unpacking overlaps
        device compute (JAX dispatch is async; only the result unpack syncs).
        """
        import collections

        p = params if params is not None else self.params
        pending: collections.deque = collections.deque()

        def dispatch(item):
            visual, audio, text, mask, durations, video_ids = item
            out = self._fn(p, *self._stage(visual, audio, text, mask, durations))
            res, raw = out if self.raw_outputs else (out, None)
            return res, list(durations), video_ids, raw

        for item in batches:
            # drain to depth-1 BEFORE dispatching, so at most ``depth``
            # batches are ever resident (dispatching first held depth+1 —
            # a silent extra batch of host+device memory)
            while len(pending) >= depth:
                yield _unpack(*pending.popleft())
            pending.append(dispatch(item))
        while pending:
            yield _unpack(*pending.popleft())
