"""MMCT forward parity vs the reference MMCTransformer.

The golden fixture (tests/golden/tiny_model.npz) holds a tiny random-weight
reference model's state dict, inputs, and outputs, captured by
tools/make_goldens.py. Converting the state dict and applying MMCT in float32
at matmul_precision="highest" must reproduce the torch forward on valid
(unpadded) positions.

All applies are jitted: on this box unjitted op-by-op dispatch compiles each
primitive separately and is pathologically slow on a single core.
"""

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.models import MMCT, convert_reference_state_dict

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_model.npz")

TINY_CFG = ModelConfig(
    vis_dim=32, aud_dim=64, text_dim=16, d_model=64,
    self_num_layers=2, num_heads=4, d_ff=128,
    compute_dtype="float32", attention_impl="xla", matmul_precision="highest",
)


@functools.lru_cache(maxsize=8)
def _jitted_apply(cfg: ModelConfig):
    model = MMCT(cfg)
    return jax.jit(lambda p, *a: model.apply({"params": p}, *a, True))


def _run(cfg, params, data, t=None):
    sl = slice(None) if t is None else slice(0, t)
    return _jitted_apply(cfg)(
        params,
        jnp.asarray(data["visual"][:, sl]),
        jnp.asarray(data["audio"][:, sl]),
        jnp.asarray(data["text"][:, sl]),
        jnp.asarray(data["mask"][:, sl]),
    )


@pytest.fixture(scope="module")
def fixture():
    data = np.load(GOLDEN)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    return data, convert_reference_state_dict(sd, TINY_CFG)


def test_forward_parity_fp32(fixture):
    data, params = fixture
    out = _run(TINY_CFG, params, data)
    mask = data["mask"].astype(bool)
    for got, want, name, atol in [
        (np.asarray(out.cls_logits), data["cls_logits"], "cls", 2e-4),
        (np.asarray(out.offsets), data["offsets"], "reg", 2e-4),
    ]:
        np.testing.assert_allclose(
            got[mask], want[mask], atol=atol, rtol=1e-3, err_msg=name
        )


def test_forward_bf16_close(fixture):
    data, params = fixture
    cfg = dataclasses.replace(TINY_CFG, compute_dtype="bfloat16")
    out = _run(cfg, params, data)
    mask = data["mask"].astype(bool)
    assert out.cls_logits.dtype == jnp.float32
    # bf16 activations: expect coarse agreement with the fp32 reference.
    got, want = np.asarray(out.cls_logits)[mask], data["cls_logits"][mask]
    assert np.abs(got - want).mean() < 0.05


def test_init_matches_converted_structure(fixture):
    _, params = fixture
    init = MMCT(TINY_CFG).init_params(jax.random.key(0))
    got = jax.tree.map(lambda x: x.shape, init)
    want = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert got == want


def test_dropout_active_in_train_mode(fixture):
    data, params = fixture
    model = MMCT(TINY_CFG)

    args = (
        jnp.asarray(data["visual"][:1, :64]),
        jnp.asarray(data["audio"][:1, :64]),
        jnp.asarray(data["text"][:1, :64]),
        jnp.asarray(data["mask"][:1, :64]),
    )
    run_det = jax.jit(lambda p: model.apply({"params": p}, *args, True))
    run_tr = jax.jit(
        lambda p, key: model.apply(
            {"params": p}, *args, False, rngs={"dropout": key}
        )
    )
    det = run_det(params)
    tr1 = run_tr(params, jax.random.key(1))
    tr2 = run_tr(params, jax.random.key(2))
    det2 = run_det(params)
    np.testing.assert_array_equal(det.cls_logits, det2.cls_logits)
    assert not np.allclose(tr1.cls_logits, tr2.cls_logits)


def test_padded_rows_are_finite(fixture):
    data, params = fixture
    out = _run(TINY_CFG, params, data)
    # Unlike torch's math SDPA (NaN on fully-masked query rows), every output
    # row must be finite so masked losses stay NaN-free.
    assert np.isfinite(np.asarray(out.cls_logits)).all()
    assert np.isfinite(np.asarray(out.offsets)).all()
