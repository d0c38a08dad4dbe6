"""Checkpoint interop BOTH ways (models/torch_convert.py).

Import (reference .pth -> MMCT params) is pinned at tiny and flagship scale
by golden tests (test_model.py, test_flagship_parity.py). These tests pin
the EXPORT direction — a model trained HERE deploys through the reference's
own torch stack (its inference.py:33-34 load path): exact numeric
round-trips, and (when torch + /root/reference are present) a strict
``load_state_dict`` into the reference's real MMCTransformer followed by a
forward-parity check against our model."""

import os

import jax
import numpy as np
import pytest

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.models.mmct import MMCT
from repurpose_tpu.models.torch_convert import (
    convert_reference_state_dict,
    export_reference_state_dict,
)

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")

# head hidden width is HARDCODED 256 in the reference (MMCTransformer.py:60);
# export targets must match it to load strictly.
CFG = ModelConfig(
    vis_dim=32, aud_dim=64, text_dim=16, d_model=64, self_num_layers=2,
    num_heads=4, d_ff=128, hidden_dim=256, compute_dtype="float32",
    attention_impl="xla", dropout=0.0, matmul_precision="highest",
)


@pytest.fixture(scope="module")
def params():
    return MMCT(CFG).init_params(jax.random.key(0), bucket=16)


def test_export_convert_roundtrip(params):
    """convert(export(params)) == params exactly, leaf for leaf."""
    sd = export_reference_state_dict(params, CFG)
    back = convert_reference_state_dict(sd, CFG)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))


def test_convert_export_roundtrip(params):
    """export(convert(sd)) == sd — the state-dict side of the bijection."""
    sd = export_reference_state_dict(params, CFG)
    sd2 = export_reference_state_dict(convert_reference_state_dict(sd, CFG), CFG)
    assert set(sd) == set(sd2)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k], err_msg=k)


@pytest.mark.slow
def test_reference_loads_export_and_matches_forward(params, tmp_path):
    """The strong interop proof: save_reference_checkpoint's .pth loads into
    the reference's REAL MMCTransformer with strict=True, and the torch
    forward on it matches our forward on the same batch (so a model trained
    here actually serves through the reference's stack)."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REFERENCE):
        pytest.skip("no /root/reference")
    import sys

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.MMCTransformer import MMCTransformer

    from repurpose_tpu.models.torch_convert import save_reference_checkpoint

    path = str(tmp_path / "exported.pth")
    save_reference_checkpoint(path, params, CFG, epoch=3, loss=1.25)

    model = MMCTransformer(
        vis_dim=CFG.vis_dim, aud_dim=CFG.aud_dim, text_dim=CFG.text_dim,
        d_model=CFG.d_model, self_num_layers=CFG.self_num_layers,
        text_num_layers=1, cross_num_layers=1, num_heads=CFG.num_heads,
        d_ff=CFG.d_ff,
    )
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 3 and ckpt["loss"] == 1.25
    # the synthesized positional_encoding.pe buffer must be BIT-EXACT with
    # the reference's own computation (MMCTransformer.py:11-18) — checked
    # BEFORE the load overwrites the model's buffer with ours
    np.testing.assert_array_equal(
        ckpt["model"]["positional_encoding.pe"].numpy(),
        model.positional_encoding.pe.numpy(),
    )
    # STRICT load — the reference's real inference load path
    # (inference.py:34) uses load_state_dict's strict default; this is the
    # exact call that must succeed for a checkpoint trained here to deploy
    model.load_state_dict(ckpt["model"])
    model.eval()

    rng = np.random.default_rng(5)
    b, t = 2, 16
    vis = rng.normal(0, 1, (b, t, CFG.vis_dim)).astype(np.float32)
    aud = rng.normal(0, 1, (b, t, CFG.aud_dim)).astype(np.float32)
    txt = rng.normal(0, 1, (b, t, CFG.text_dim)).astype(np.float32)
    mask = np.ones((b, 1, t), bool)
    mask[1, 0, 12:] = False
    batch = {
        "video_id": ["a", "b"],
        "duration": [t, 12],
        "visual_feats": torch.tensor(vis),
        "audio_feats": torch.tensor(aud),
        "text_feats": torch.tensor(txt),
        "labels": torch.zeros((b, t)),
        "segments": torch.zeros((b, t, 2)),
        "masks": torch.tensor(mask),
    }
    with torch.no_grad():
        _, ref_logits, ref_offsets, _, _, _ = model(batch)

    ours = MMCT(CFG).apply(
        {"params": params}, vis, aud, txt, mask[:, 0, :], True
    )
    valid = mask[:, 0, :, None]
    np.testing.assert_allclose(
        np.asarray(ours.cls_logits)[valid[..., 0]],
        ref_logits.numpy()[valid[..., 0]],
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours.offsets)[np.broadcast_to(valid, ours.offsets.shape)],
        ref_offsets.numpy()[np.broadcast_to(valid, ref_offsets.numpy().shape)],
        atol=2e-4,
    )
