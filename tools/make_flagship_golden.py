"""Flagship-scale (85M-param) reference-checkpoint round-trip fixture.

Round 2 proved the .pth converter only on a tiny (d=64, 2-layer) model; the
reference's real artifact is the 16-layer d=512 MMCTransformer saved by
main.py:513-531 and consumed by inference.py:33-34. This tool RUNS the
reference's own model code (/root/reference) at flagship dims:

1. builds MMCTransformer(**configs/Repurpose.yaml model section) seeded,
2. trains it with the reference's own loop numerics (Adam lr 1e-3 wd 1e-4,
   loss = cls_loss / config_batch_size; main.py:190-206, 331) plus the
   reference's own defined-but-unused DIoU reg loss (so decoded segment
   boundaries are meaningful — see the comment in build_flagship_checkpoint)
   on seeded synthetic signal batches, long enough (160 steps) that
   PRODUCTION-threshold decode keeps a nontrivial segment set,
3. saves a real .pth in the reference checkpoint schema (main.py:513-531),
4. records the reference's fp32 forward (T=1800, the corpus-max length) and
   its decode + Soft-NMS outputs + tIoU under both the production TestConfig
   and a low-threshold variant.

Only reference *outputs* are committed (tests/golden/flagship_outputs.npz +
flagship_decode.json — a few tens of KB); the 340 MB checkpoint itself is
cached under tests/golden_cache/ (gitignored) and regenerated automatically
by tests/test_flagship_parity.py when torch + /root/reference are available.
All inputs come from seeded numpy Generators (bit-stable across platforms),
so regeneration is deterministic up to torch kernel scheduling.

Run:  python tools/make_flagship_golden.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")
CACHE_DIR = os.path.join(REPO, "tests", "golden_cache")
CKPT_PATH = os.path.join(CACHE_DIR, "flagship_trained.pth")

# The reference's shipped model section, verbatim (configs/Repurpose.yaml:22-32;
# d_ff defaults to 2048, MMCTransformer.py:26).
FLAGSHIP_KW = dict(
    vis_dim=512, aud_dim=2048, text_dim=384, d_model=512,
    self_num_layers=16, text_num_layers=3, cross_num_layers=3, num_heads=8,
)

TRAIN_STEPS = 160
REG_WEIGHT = 0.5
TRAIN_LENS = (192, 160)
EVAL_LENS = (1800, 1313)  # corpus max + ~mean (BASELINE.md)
BATCH_SIZE_CFG = 2

# Production decode settings (configs/Repurpose.yaml:52-61) + a low-threshold
# variant that keeps segments even from a briefly-trained model.
TEST_CFGS = {
    "production": {
        "pre_nms_topk": 1000, "pre_nms_thresh": 0.5, "duration_thresh": 10.0,
        "duration_thresh_max": 90.0, "max_seg_per_min": 0.3,
        "nms_sigma": 0.5, "min_score": 0.01,
    },
    "low_thresh": {
        "pre_nms_topk": 1000, "pre_nms_thresh": 0.05, "duration_thresh": 0.0,
        "duration_thresh_max": 90.0, "max_seg_per_min": 2.0,
        "nms_sigma": 0.5, "min_score": 0.01,
    },
}


def signal_batch(rng: np.random.Generator, lens, t_max) -> dict:
    """Learnable synthetic batch at flagship feature dims: labels come from
    planted 12-24 s segments and the first 32 visual dims carry a +2.5 bias
    inside them (same construction as the tiny fixture, tools/make_goldens.py),
    so a short training run yields realistic score distributions."""
    b = len(lens)
    vis = rng.normal(0, 1, (b, t_max, FLAGSHIP_KW["vis_dim"]))
    aud = rng.normal(0, 1, (b, t_max, FLAGSHIP_KW["aud_dim"]))
    txt = rng.normal(0, 1, (b, t_max, FLAGSHIP_KW["text_dim"]))
    mask = np.zeros((b, 1, t_max), bool)
    labels = np.zeros((b, t_max))
    offsets = np.zeros((b, t_max, 2))
    gt_segments = []
    for i, ln in enumerate(lens):
        mask[i, 0, :ln] = True
        vis[i, ln:] = aud[i, ln:] = txt[i, ln:] = 0.0
        segs = []
        for _ in range(max(2, ln // 400)):
            s = float(rng.uniform(0, ln - 30))
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
        vis[i, :ln, :32] += 2.5 * labels[i, :ln, None]
    return {
        "visual": vis, "audio": aud, "text": txt, "mask": mask,
        "labels": labels, "segments": offsets, "lens": list(lens),
        "gt_segments": gt_segments,
    }


def train_batches(n: int = 4) -> list[dict]:
    rng = np.random.default_rng(23)
    return [signal_batch(rng, TRAIN_LENS, max(TRAIN_LENS)) for _ in range(n)]


def eval_batch() -> dict:
    return signal_batch(np.random.default_rng(29), EVAL_LENS, max(EVAL_LENS))


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


def build_flagship_checkpoint(path: str = CKPT_PATH, steps: int = TRAIN_STEPS):
    """Train the flagship reference model for ``steps`` and save the .pth in
    the reference's checkpoint schema. Returns the per-step loss list."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch
    from models.MMCTransformer import MMCTransformer

    torch.manual_seed(1234)  # the reference's own seed (configs/Repurpose.yaml:34)
    model = MMCTransformer(**FLAGSHIP_KW)
    # Dropout RNG is framework-specific; zero it for a deterministic fixture
    # (the reference hardcodes p=0.1, MMCTransformer.py:45).
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0
    model.train()

    from models.losses import ctr_diou_loss_1d

    batches = train_batches()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-4)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
    losses = []
    for step in range(steps):
        batch = _torch_batch(batches[step % len(batches)])
        out = model(batch)
        cls_loss = model.losses(*out)["cls_loss"] / BATCH_SIZE_CFG
        # The shipped reference trains cls-only (main.py:664 'Regression loss
        # removed'), which leaves the reg head — the source of decoded segment
        # BOUNDARIES — at init: every predicted duration is ~0 s and the
        # production duration_thresh=10 gate empties the keep-set, making the
        # decode golden non-discriminating. The fixture therefore also trains
        # the reg head with the reference's OWN (defined-but-unused) DIoU loss
        # (models/losses.py:57), masked to positive timesteps like our
        # ops/losses.py:masked_reg_loss; inference parity is unaffected by how
        # the checkpoint was trained, and production-threshold decode now
        # keeps a real segment set.
        masks, _, offsets, labels, gt_offsets, _ = out
        pos = (labels * masks.transpose(1, 2).squeeze(-1)).float()
        # clamp: gt offsets are negative OUTSIDE segments (dataset label
        # construction), and the TorchScript loss asserts non-negativity on
        # every entry even though the pos mask zeroes those terms anyway
        # (the TorchScript body indexes [:,:,k]: it takes [B,T,2] despite its
        # docstring's (N,2))
        diou = ctr_diou_loss_1d(offsets, gt_offsets.clamp_min(0.0))
        reg_loss = (diou * pos).sum() / BATCH_SIZE_CFG
        final = cls_loss + REG_WEIGHT * reg_loss
        opt.zero_grad()
        final.backward()
        opt.step()
        cos.step()
        losses.append(float(cls_loss.item()))
        print(
            f"  ref step {step}: cls {losses[-1]:.4f} reg {float(reg_loss):.4f}",
            flush=True,
        )
    assert losses[-1] < losses[0], "flagship reference training went nowhere"

    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save(
        # the reference checkpoint schema, main.py:513-531
        {
            "model": model.state_dict(),
            "optimizer": opt.state_dict(),
            "epoch": 1,
            "loss": losses[-1],
        },
        path,
    )
    return losses


def reference_eval(ckpt_path: str = CKPT_PATH):
    """Load the .pth the way the reference's inference.py:33-34 does, run the
    fp32 forward + per-cfg decode on the seeded eval batch, and return all
    outputs as numpy/json-able structures.

    Device-semantics pin: the reference's soft_nms_intervals_cpu mutates its
    numpy view of the scores IN PLACE (softnms.py:4-5 swap + decay), and
    ``tensor.cpu().numpy()`` ALIASES the torch tensor when inference already
    runs on CPU — so the reference reports decayed, swap-scrambled scores on
    CPU but pre-decay originals on CUDA (where ``.cpu()`` copies). The
    deployed reference runs CUDA; this framework pins THOSE semantics
    (PARITY.md 'pre-decay scores'), so the generator clones the scores
    tensor before NMS to emulate the CUDA copy deterministically."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch
    import models.MMCTransformer as _mm
    from models.MMCTransformer import MMCTransformer

    orig_nms = _mm.soft_nms_intervals_cpu
    _mm.soft_nms_intervals_cpu = lambda scores, segs, **kw: orig_nms(
        scores.clone(), segs, **kw
    )

    sys.path.insert(0, os.path.join(REFERENCE, "utils"))
    from utils.metrics import calculate_tiou as ref_tiou

    model = MMCTransformer(**FLAGSHIP_KW)
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    model.load_state_dict(ckpt["model"])
    model.eval()

    ev = eval_batch()
    tb = _torch_batch(ev)
    with torch.no_grad():
        _, cls_logits, offsets, _, _, _ = model(tb)
    decode = {}
    for cfg_name, test_cfg in TEST_CFGS.items():
        with torch.no_grad():
            results = model.inference_(tb, test_cfg)
        decode[cfg_name] = [
            {
                "video_id": r["video_id"],
                "duration": int(r["duration"]),
                "segments": r["segments"].numpy().tolist(),
                "scores": r["scores"].numpy().tolist(),
                "labels": r["labels"].numpy().tolist(),
                "tiou": {
                    str(k): v
                    for k, v in ref_tiou(
                        ev["gt_segments"][i],
                        r["segments"].numpy().tolist(),
                        [0.5, 0.6, 0.7, 0.8, 0.9],
                    ).items()
                },
            }
            for i, r in enumerate(results)
        ]
    return ev, cls_logits.numpy(), offsets.numpy(), decode


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    if "--eval-only" in sys.argv and os.path.exists(CKPT_PATH):
        # reuse the cached checkpoint (training is deterministic from seeds;
        # ~15 CPU-min saved when only the eval/decode recording changed)
        with open(os.path.join(GOLDEN_DIR, "flagship_decode.json")) as f:
            losses = json.load(f)["losses"]
    else:
        print("training flagship reference model (85M params, CPU)...", flush=True)
        losses = build_flagship_checkpoint()
    print("running reference eval forward at T=1800...", flush=True)
    ev, cls_logits, offsets, decode = reference_eval()
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "flagship_outputs.npz"),
        cls_logits=cls_logits.astype(np.float32),
        offsets=offsets.astype(np.float32),
    )
    with open(os.path.join(GOLDEN_DIR, "flagship_decode.json"), "w") as f:
        json.dump(
            {
                "model_kw": FLAGSHIP_KW,
                "steps": TRAIN_STEPS,
                "batch_size_cfg": BATCH_SIZE_CFG,
                "losses": losses,
                "test_cfgs": TEST_CFGS,
                "gt_segments": ev["gt_segments"],
                "decode": decode,
            },
            f,
        )
    for name, res in decode.items():
        kept = [len(r["scores"]) for r in res]
        print(f"decode[{name}]: segments kept per video = {kept}")
    print("flagship goldens written")


if __name__ == "__main__":
    main()
