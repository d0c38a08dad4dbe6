"""Modality ablations: visual-only / visual+audio / all-three models."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repurpose_tpu.config import ModelConfig, load_config
from repurpose_tpu.models.mmct import MMCT

TINY = ModelConfig(
    vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
    num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
    attention_impl="xla",
)


@pytest.mark.parametrize(
    "modalities,concat",
    [
        (("visual",), 8),
        (("visual", "audio"), 20),
        (("visual", "audio", "text"), 24),
        (("text",), 4),
    ],
)
def test_concat_dim_and_param_shapes(modalities, concat):
    cfg = dataclasses.replace(TINY, modalities=modalities)
    assert cfg.concat_dim == concat
    params = MMCT(cfg).init_params(jax.random.key(0))
    assert params["input_projection"]["kernel"].shape == (concat, 16)


def test_ablated_forward_ignores_disabled_stream(rng):
    cfg = dataclasses.replace(TINY, modalities=("visual", "audio"))
    model = MMCT(cfg)
    params = model.init_params(jax.random.key(0))
    b, t = 1, 32
    vis = jnp.asarray(rng.normal(0, 1, (b, t, 8)), jnp.float32)
    aud = jnp.asarray(rng.normal(0, 1, (b, t, 12)), jnp.float32)
    mask = jnp.ones((b, t), bool)
    run = jax.jit(lambda txt: model.apply({"params": params}, vis, aud, txt, mask, True))
    out1 = run(jnp.zeros((b, t, 4)))
    out2 = run(jnp.asarray(rng.normal(0, 1, (b, t, 4)), jnp.float32))
    np.testing.assert_array_equal(out1.cls_logits, out2.cls_logits)


def test_modalities_from_yaml():
    cfg = load_config({"tpu": {"modalities": ["visual"]}})
    assert cfg.model.modalities == ("visual",)
    assert cfg.model.concat_dim == 512


def test_bad_modalities_rejected():
    with pytest.raises(ValueError):
        ModelConfig(modalities=("visual", "smell"))
    with pytest.raises(ValueError):
        ModelConfig(modalities=())
