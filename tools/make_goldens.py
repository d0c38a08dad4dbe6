"""Generate golden parity fixtures by RUNNING the PyTorch reference
(/root/reference) on synthetic inputs and recording its outputs as JSON.

Only the reference's *outputs* are stored — no reference code is copied.
Run once in an environment where /root/reference and torch are available:

    python tools/make_goldens.py

The committed fixtures under tests/golden/ then let the test suite verify
numerical parity without the reference present.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def make_softnms_goldens():
    sys.path.insert(0, REFERENCE)
    import torch
    from models.softnms import soft_nms_intervals_cpu

    rng = np.random.default_rng(42)
    cases = []
    for case_id, (n, sigma, thresh, max_seg) in enumerate(
        [
            (1, 0.5, 0.01, 5),
            (8, 0.5, 0.01, 5),
            (30, 0.5, 0.01, 9),
            (50, 0.5, 0.001, 20),
            (100, 0.3, 0.01, 7),
            (200, 0.5, 0.01, 4),
            (64, 0.9, 0.05, 64),
        ]
    ):
        # Candidates shaped like real decode output: descending scores in
        # (thresh, 1], intervals with durations 10-90s over a long timeline.
        scores = np.sort(rng.uniform(0.5, 1.0, size=n))[::-1].copy()
        centers = rng.uniform(0, 1800, size=n)
        durs = rng.uniform(10, 90, size=n)
        segs = np.stack([centers - durs / 2, centers + durs / 2], axis=1)
        # float32 tensors: production passes model outputs (float32); the
        # whole reference decay loop then runs float32 numpy, which the
        # repo's implementations reproduce dtype-for-dtype
        keep = soft_nms_intervals_cpu(
            torch.tensor(scores.copy(), dtype=torch.float32),
            torch.tensor(segs.copy(), dtype=torch.float32),
            sigma=sigma,
            thresh=thresh,
            max_seg_num=max_seg,
        )
        cases.append(
            {
                "case_id": case_id,
                "scores": scores.tolist(),
                "segments": segs.tolist(),
                "sigma": sigma,
                "thresh": thresh,
                "max_seg_num": max_seg,
                "keep": np.asarray(keep).tolist(),
            }
        )
    # Heavy-overlap cases to exercise decay-induced reordering (stale-length quirk).
    for case_id, (n, sigma, thresh, max_seg) in enumerate(
        [(40, 0.5, 0.01, 10), (60, 0.5, 0.01, 20), (25, 0.2, 0.01, 25)], start=100
    ):
        scores = np.sort(rng.uniform(0.4, 1.0, size=n))[::-1].copy()
        centers = rng.uniform(0, 300, size=n)  # crowded timeline
        durs = rng.uniform(10, 90, size=n)
        segs = np.stack([centers - durs / 2, centers + durs / 2], axis=1)
        keep = soft_nms_intervals_cpu(
            torch.tensor(scores.copy(), dtype=torch.float32),
            torch.tensor(segs.copy(), dtype=torch.float32),
            sigma=sigma,
            thresh=thresh,
            max_seg_num=max_seg,
        )
        cases.append(
            {
                "case_id": case_id,
                "scores": scores.tolist(),
                "segments": segs.tolist(),
                "sigma": sigma,
                "thresh": thresh,
                "max_seg_num": max_seg,
                "keep": np.asarray(keep).tolist(),
            }
        )
    # NEGATIVE stale-length totals: crowded timelines with extreme duration
    # variance make post-swap unions where overlap exceeds the stale length
    # sum (total < 0). The reference decays with a FINITE weight there (the
    # candidate usually survives) — an earlier repo version wrongly dropped
    # these; ~40 negative totals occur per case below.
    # Seeds fuzz-selected so the finite-negative-weight semantics actually
    # flip the keep set vs the old weight-0 behavior (4 discriminating seeds
    # out of 400 fuzzed).
    for case_id, seed in enumerate([49, 91, 128, 305], start=200):
        r2 = np.random.default_rng(seed)
        n = int(r2.integers(8, 30))
        sigma, thresh, max_seg = 0.5, 0.01, n
        scores = r2.uniform(0.05, 1.0, size=n).astype(np.float32)
        centers = r2.uniform(0, 40, size=n)
        durs = r2.uniform(1, 120, size=n)
        segs = np.stack([centers - durs / 2, centers + durs / 2], axis=1).astype(
            np.float32
        )
        keep = soft_nms_intervals_cpu(
            torch.tensor(scores.astype(np.float32)),
            torch.tensor(segs.astype(np.float32)),
            sigma=sigma,
            thresh=thresh,
            max_seg_num=max_seg,
        )
        cases.append(
            {
                "case_id": case_id,
                "scores": scores.tolist(),
                "segments": segs.tolist(),
                "sigma": sigma,
                "thresh": thresh,
                "max_seg_num": max_seg,
                "keep": np.asarray(keep).tolist(),
            }
        )
    with open(os.path.join(OUT_DIR, "softnms.json"), "w") as f:
        json.dump(cases, f)
    print(f"softnms: {len(cases)} cases")


def make_focal_goldens():
    sys.path.insert(0, REFERENCE)
    import torch
    from models.losses import ctr_diou_loss_1d, sigmoid_focal_loss

    rng = np.random.default_rng(7)
    logits = rng.normal(0, 3, size=(2, 17, 1))
    targets = (rng.uniform(size=(2, 17, 1)) > 0.7).astype(np.float64)
    focal = (
        sigmoid_focal_loss(
            torch.tensor(logits, dtype=torch.float32),
            torch.tensor(targets, dtype=torch.float32),
        )
        .numpy()
        .tolist()
    )
    off_in = np.abs(rng.normal(0, 20, size=(2, 9, 2)))
    off_tg = np.abs(rng.normal(0, 20, size=(2, 9, 2)))
    diou = (
        ctr_diou_loss_1d(
            torch.tensor(off_in, dtype=torch.float32),
            torch.tensor(off_tg, dtype=torch.float32),
        )
        .numpy()
        .tolist()
    )
    with open(os.path.join(OUT_DIR, "losses.json"), "w") as f:
        json.dump(
            {
                "logits": logits.tolist(),
                "targets": targets.tolist(),
                "focal": focal,
                "off_in": off_in.tolist(),
                "off_tg": off_tg.tolist(),
                "diou": diou,
            },
            f,
        )
    print("losses: ok")


def make_label_goldens():
    sys.path.insert(0, REFERENCE)
    from dataset.RepurposeClip import RepurposeClip

    gen_status = RepurposeClip.generate_time_status_list
    gen_offsets = RepurposeClip.generate_regression_offsets

    class _Shim:  # the reference methods only touch self.logger
        import logging

        logger = logging.getLogger("shim")

    shim = _Shim()
    cases = []
    for tr, segs in [
        ([0, 266.0], [[0.0, 72.42]]),
        ([0, 100.0], [[10.5, 20.7], [15.0, 40.0], [95.0, 120.0]]),
        ([50.0, 150.0], [[60.2, 75.9], [140.0, 160.0]]),
        ([0, 30.0], []),
        ([0, 10.0], [[3.0, 3.0]]),  # degenerate zero-length segment
        ([0, 20.0], [[-5.0, 4.2]]),  # segment starting before the range
        ([12.3, 99.9], [[20.0, 30.0], [25.0, 90.0]]),  # float range start
    ]:
        status = gen_status(shim, tr, segs)
        offsets = gen_offsets(shim, tr, segs)
        cases.append(
            {
                "time_range": tr,
                "segments": segs,
                "status": list(status),
                "offsets": [list(o) for o in offsets],
            }
        )
    with open(os.path.join(OUT_DIR, "labels.json"), "w") as f:
        json.dump(cases, f)
    print(f"labels: {len(cases)} cases")


def make_metric_goldens():
    sys.path.insert(0, REFERENCE)
    from utils.metrics import calculate_ap, calculate_recall, calculate_tiou

    rng = np.random.default_rng(11)
    cases = []
    for _ in range(6):
        n_ref = int(rng.integers(0, 5))
        n_pred = int(rng.integers(0, 6))
        refs = [
            [float(s), float(s + rng.uniform(5, 60))]
            for s in rng.uniform(0, 500, size=n_ref)
        ]
        preds = [
            [float(s), float(s + rng.uniform(5, 60))]
            for s in rng.uniform(0, 500, size=n_pred)
        ]
        tiou = calculate_tiou(refs, preds, [0.5, 0.6, 0.7, 0.8, 0.9])
        labels = rng.integers(0, 2, size=200).tolist()
        ap = calculate_ap(preds, labels)
        recall = calculate_recall(preds, labels)
        cases.append(
            {
                "refs": refs,
                "preds": preds,
                "tiou": {str(k): v for k, v in tiou.items()},
                "labels": labels,
                "ap": ap,
                "recall": recall,
            }
        )
    with open(os.path.join(OUT_DIR, "metrics.json"), "w") as f:
        json.dump(cases, f)
    print(f"metrics: {len(cases)} cases")


TINY_MODEL_KW = dict(
    vis_dim=32, aud_dim=64, text_dim=16, d_model=64,
    self_num_layers=2, text_num_layers=1, cross_num_layers=1, num_heads=4, d_ff=128,
)


def _build_tiny_reference_model(seed: int = 3):
    sys.path.insert(0, REFERENCE)
    import torch
    from models.MMCTransformer import MMCTransformer

    torch.manual_seed(seed)
    model = MMCTransformer(**TINY_MODEL_KW)
    model.eval()
    return model


def _tiny_batch(seed: int = 5, lens=(600, 480)):
    import torch

    rng = np.random.default_rng(seed)
    b, t = len(lens), max(lens)
    vis = rng.normal(0, 1, (b, t, 32))
    aud = rng.normal(0, 1, (b, t, 64))
    txt = rng.normal(0, 1, (b, t, 16))
    mask = np.zeros((b, 1, t), bool)
    labels = rng.integers(0, 2, (b, t)).astype(np.float64)
    segments = np.abs(rng.normal(0, 10, (b, t, 2)))
    for i, ln in enumerate(lens):
        mask[i, 0, :ln] = True
        vis[i, ln:] = aud[i, ln:] = txt[i, ln:] = 0.0
    return {
        "video_id": [f"vid{i}" for i in range(b)],
        "duration": list(lens),
        "visual_feats": torch.tensor(vis, dtype=torch.float32),
        "audio_feats": torch.tensor(aud, dtype=torch.float32),
        "text_feats": torch.tensor(txt, dtype=torch.float32),
        "masks": torch.tensor(mask),
        "labels": torch.tensor(labels, dtype=torch.float32),
        "segments": torch.tensor(segments, dtype=torch.float32),
    }


def make_model_goldens():
    """Tiny random-weight reference model: state dict + forward outputs."""
    import torch

    model = _build_tiny_reference_model()
    batch = _tiny_batch()
    with torch.no_grad():
        masks, cls_logits, offsets, _, _, _ = model(batch)
    arrays = {f"sd/{k}": v.numpy() for k, v in model.state_dict().items()}
    arrays.update(
        visual=batch["visual_feats"].numpy(),
        audio=batch["audio_feats"].numpy(),
        text=batch["text_feats"].numpy(),
        mask=batch["masks"].numpy()[:, 0, :],
        cls_logits=cls_logits.numpy(),
        offsets=offsets.numpy(),
    )
    np.savez_compressed(os.path.join(OUT_DIR, "tiny_model.npz"), **arrays)
    print("tiny model: params", sum(v.size for k, v in arrays.items() if k.startswith("sd/")))

    # End-to-end inference golden through the reference decode + Soft-NMS.
    test_cfg = {
        "pre_nms_topk": 200,
        "pre_nms_thresh": 0.3,
        "duration_thresh": 0.001,
        "duration_thresh_max": 90,
        "max_seg_per_min": 0.5,
        "nms_sigma": 0.5,
        "min_score": 0.01,
    }
    with torch.no_grad():
        results = model.inference_(batch, test_cfg)
    golden = {
        "test_cfg": test_cfg,
        "results": [
            {
                "video_id": r["video_id"],
                "duration": int(r["duration"]),
                "segments": r["segments"].numpy().tolist(),
                "scores": r["scores"].numpy().tolist(),
                "labels": r["labels"].numpy().tolist(),
            }
            for r in results
        ],
    }
    for r in golden["results"]:
        print(f"  inference golden {r['video_id']}: {len(r['scores'])} segments kept")
    with open(os.path.join(OUT_DIR, "tiny_inference.json"), "w") as f:
        json.dump(golden, f)


def _signal_batch(rng, lens, t_max):
    """A learnable synthetic batch: labels come from planted segments, and the
    first visual dims carry a +1.5 bias inside them, so short training gets a
    model with realistic (non-random) score distributions. All arrays are
    stored in the fixture — both frameworks consume the identical data."""
    b = len(lens)
    vis = rng.normal(0, 1, (b, t_max, 32))
    aud = rng.normal(0, 1, (b, t_max, 64))
    txt = rng.normal(0, 1, (b, t_max, 16))
    mask = np.zeros((b, 1, t_max), bool)
    labels = np.zeros((b, t_max))
    offsets = np.zeros((b, t_max, 2))
    gt_segments = []
    for i, ln in enumerate(lens):
        mask[i, 0, :ln] = True
        vis[i, ln:] = aud[i, ln:] = txt[i, ln:] = 0.0
        segs = []
        for _ in range(2):
            s = float(rng.uniform(0, ln - 25))
            e = s + float(rng.uniform(12, 24))
            segs.append([s, e])
        segs.sort()
        gt_segments.append(segs)
        for s, e in segs:
            lo, hi = int(s), min(int(e) + 1, ln)
            labels[i, lo:hi] = 1.0
            for t in range(lo, hi):
                if offsets[i, t].sum() == 0:
                    offsets[i, t] = (t - s, e - t)
        vis[i, :ln, :8] += 1.5 * labels[i, :ln, None]
    return {
        "visual": vis, "audio": aud, "text": txt, "mask": mask,
        "labels": labels, "segments": offsets, "lens": list(lens),
        "gt_segments": gt_segments,
    }


def _torch_batch(d):
    import torch

    return {
        "video_id": [f"vid{i}" for i in range(len(d["lens"]))],
        "duration": list(d["lens"]),
        "visual_feats": torch.tensor(d["visual"], dtype=torch.float32),
        "audio_feats": torch.tensor(d["audio"], dtype=torch.float32),
        "text_feats": torch.tensor(d["text"], dtype=torch.float32),
        "masks": torch.tensor(d["mask"]),
        "labels": torch.tensor(d["labels"], dtype=torch.float32),
        "segments": torch.tensor(d["segments"], dtype=torch.float32),
    }


def make_trained_goldens(steps: int = 120):
    """TRAIN the tiny reference model (reference numerics: Adam lr 1e-3 wd
    1e-4, loss = cls_loss / config_batch_size, per-iteration cosine schedule —
    main.py:190-206, 331, 405-409) for ``steps`` CPU steps on stored synthetic
    batches, and capture: init + trained state dicts, the per-step loss
    trajectory, a real .pth checkpoint in the reference's schema
    (main.py:513-531), and the reference's decoded outputs + tIoU on a held-out
    batch. Dropout is zeroed on the torch side (the reference hardcodes p=0.1,
    MMCTransformer.py:45,68-93) because dropout RNG is framework-specific; the
    JAX side trains with dropout=0.0 to match."""
    sys.path.insert(0, REFERENCE)
    import torch
    from models.MMCTransformer import MMCTransformer

    sys.path.insert(0, os.path.join(REFERENCE, "utils"))
    from utils.metrics import calculate_tiou as ref_tiou

    torch.manual_seed(3)
    model = MMCTransformer(**TINY_MODEL_KW)
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0  # a float attr, NOT a Dropout module — the
            # attention-weights dropout stays stochastic otherwise
    model.train()
    init_sd = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}

    rng = np.random.default_rng(17)
    train_batches = [_signal_batch(rng, (128, 96), 128) for _ in range(4)]
    eval_batch = _signal_batch(rng, (128, 110), 128)

    batch_size_cfg = 2  # the /batch_size quirk divisor (main.py:331)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
    losses = []
    for step in range(steps):
        batch = _torch_batch(train_batches[step % len(train_batches)])
        out = model(batch)
        final = model.losses(*out)["cls_loss"] / batch_size_cfg
        opt.zero_grad()
        final.backward()
        opt.step()
        cos.step()
        losses.append(float(final.item()))
    print(f"trained tiny reference: loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    assert losses[-1] < losses[0] * 0.8, "reference training failed to learn"

    trained_sd = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}
    torch.save(
        {"model": model.state_dict(), "epoch": steps, "loss": losses[-1]},
        os.path.join(OUT_DIR, "tiny_trained.pth"),
    )

    # duration_thresh ~0: cls-only training Adam-decays the never-trained
    # ReLU reg head toward zero (wd gradient is its only gradient), so
    # trained-model offsets are near-zero — the reference's own quirk of
    # running an untrained reg head at inference (main.py:664,
    # MMCTransformer.py:149). A realistic 10s gate would keep nothing.
    test_cfg = {
        "pre_nms_topk": 200, "pre_nms_thresh": 0.3, "duration_thresh": 0.0,
        "duration_thresh_max": 90.0, "max_seg_per_min": 2.0,
        "nms_sigma": 0.5, "min_score": 0.01,
    }
    model.eval()
    with torch.no_grad():
        results = model.inference_(_torch_batch(eval_batch), test_cfg)
    decode_golden = []
    for i, r in enumerate(results):
        pred_segs = r["segments"].numpy().tolist()
        tiou = ref_tiou(eval_batch["gt_segments"][i], pred_segs, [0.5, 0.6, 0.7, 0.8, 0.9])
        decode_golden.append(
            {
                "video_id": r["video_id"],
                "duration": int(r["duration"]),
                "segments": pred_segs,
                "scores": r["scores"].numpy().tolist(),
                "labels": r["labels"].numpy().tolist(),
                "tiou": {str(k): v for k, v in tiou.items()},
            }
        )
        print(f"  trained decode {r['video_id']}: {len(pred_segs)} segments kept")

    arrays = {f"init_sd/{k}": v for k, v in init_sd.items()}
    arrays.update({f"trained_sd/{k}": v for k, v in trained_sd.items()})
    for bi, d in enumerate(train_batches):
        for key in ("visual", "audio", "text", "mask", "labels", "segments"):
            arrays[f"batch{bi}/{key}"] = d[key]
        arrays[f"batch{bi}/lens"] = np.asarray(d["lens"])
    for key in ("visual", "audio", "text", "mask", "labels", "segments"):
        arrays[f"eval/{key}"] = eval_batch[key]
    arrays["eval/lens"] = np.asarray(eval_batch["lens"])
    arrays["losses"] = np.asarray(losses)
    np.savez_compressed(os.path.join(OUT_DIR, "tiny_trained.npz"), **arrays)
    with open(os.path.join(OUT_DIR, "tiny_trained_decode.json"), "w") as f:
        json.dump(
            {
                "test_cfg": test_cfg,
                "steps": steps,
                "batch_size_cfg": batch_size_cfg,
                "gt_segments": eval_batch["gt_segments"],
                "results": decode_golden,
            },
            f,
        )


def make_text_binning_goldens():
    """Per-second transcript binning golden, captured by EXECUTING the
    reference's extract_text_features (text_feature_extractor.py:313-391)
    on synthetic transcripts: ffmpeg/ffprobe are stubbed and
    sentence_transformers is replaced by a recording fake, so the strings
    the reference actually embeds per second — after its
    ``start <= second < end`` overlap test (:347-350) and double clean_text
    (:354-357) — are recorded bin-for-bin."""
    sys.path.insert(0, REFERENCE)
    import hashlib
    import tempfile
    import types
    from pathlib import Path

    calls: list[str] = []

    class _FakeST:
        def __init__(self, name):
            pass

        def encode(self, texts):
            out = []
            for t in texts:
                calls.append(t)
                h = hashlib.sha256(t.encode()).digest()
                v = np.frombuffer((h * 12)[:384], np.uint8).astype(np.float64)
                out.append(v / 255.0 + 1e-3)  # never the zero vector
            return np.stack(out)

    fake = types.ModuleType("sentence_transformers")
    fake.SentenceTransformer = _FakeST
    saved = sys.modules.get("sentence_transformers")
    sys.modules["sentence_transformers"] = fake
    try:
        # the reference's preprocessing/__init__.py is broken (imports a
        # module that doesn't exist, SURVEY.md §2.5) — load the file directly
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_ref_text_fx",
            os.path.join(REFERENCE, "preprocessing", "text_feature_extractor.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        TextFeatureExtractor = mod.TextFeatureExtractor

        class _Shim(TextFeatureExtractor):
            _dur = 1.0

            def extract_audio_from_video(self, video_path, temp_dir):
                return video_path

            def get_audio_duration(self, audio_path):
                return self._dur

        cases_in = [
            # boundary floats + overlap
            (6, [{"start": 1.2, "end": 3.7, "text": " hello "},
                 {"start": 3.0, "end": 4.0, "text": "world"},
                 {"start": 90.0, "end": 95.0, "text": "clamped"}]),
            # exact integer boundaries: second 3 must belong to the 2nd only
            (10, [{"start": 0, "end": 3, "text": "a"},
                  {"start": 3, "end": 5, "text": "b"},
                  {"start": 5.0, "end": 10.0, "text": "c"}]),
            # clean_text: unicode word chars kept, emoji/symbols stripped,
            # kept punctuation . , ! ? - '
            (8, [{"start": 0.0, "end": 4.0, "text": "Hello,   WORLD!!"},
                 {"start": 2.0, "end": 6.0, "text": "café ☕ emoji \U0001f389"},
                 {"start": 3.5, "end": 7.2, "text": "it's a—dash; test: 50% off @home"}]),
            # negative start
            (5, [{"start": -2.5, "end": 1.5, "text": "neg"}]),
            # segment running past the duration
            (7, [{"start": 5.0, "end": 12.0, "text": "tail"}]),
            # overlapping segment whose text cleans to empty -> zero vector
            (4, [{"start": 1, "end": 3, "text": "@#$%^&*"},
                 {"start": 2, "end": 4, "text": "real text"}]),
            # missing keys default to 0 (seg.get at :346-348)
            (6, [{"end": 2.0, "text": "nostart"},
                 {"start": 3.0, "text": "noend"}]),
            # whitespace-mess normalization through the double clean_text
            (3, [{"start": 0, "end": 3, "text": "  multi\n\nline\t text  "},
                 {"start": 0, "end": 3, "text": ""}]),
        ]
        cases = []
        with tempfile.TemporaryDirectory() as td:
            ex = _Shim(output_dir=os.path.join(td, "caption_features"))
            for ci, (dur, segs) in enumerate(cases_in):
                vid = f"case{ci}"
                with open(Path(ex.transcript_dir) / f"{vid}.json", "w") as f:
                    json.dump(segs, f)
                _Shim._dur = float(dur)
                calls.clear()
                ok = ex.extract_text_features(f"{vid}.mp4", vid)
                assert ok, f"reference extraction failed for case {ci}"
                feats = np.load(Path(ex.output_dir) / f"{vid}.npy")
                assert feats.shape == (dur, 384), feats.shape
                nz = np.abs(feats).sum(axis=1) > 0
                strings = list(calls)
                bins = [strings.pop(0) if nz[i] else "" for i in range(dur)]
                assert not strings, "unconsumed embed calls"
                cases.append({"duration": dur, "segments": segs, "bins": bins})
    finally:
        if saved is None:
            sys.modules.pop("sentence_transformers", None)
        else:
            sys.modules["sentence_transformers"] = saved
    with open(os.path.join(OUT_DIR, "text_binning.json"), "w") as f:
        json.dump(cases, f, ensure_ascii=False)
    print(f"text binning: {len(cases)} cases")


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    make_softnms_goldens()
    make_focal_goldens()
    make_label_goldens()
    make_metric_goldens()
    make_model_goldens()
    make_text_binning_goldens()
    make_trained_goldens()
