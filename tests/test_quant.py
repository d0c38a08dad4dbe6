"""Dynamic int8 quantized Dense path: accuracy vs the float model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.models import MMCT
from repurpose_tpu.ops.quant import int8_dynamic_dot_general

TINY = ModelConfig(
    vis_dim=8, aud_dim=12, text_dim=4, d_model=16, self_num_layers=1,
    num_heads=2, d_ff=32, hidden_dim=8, compute_dtype="float32",
    attention_impl="xla",
)


def test_int8_dot_close_to_float(rng):
    x = jnp.asarray(rng.normal(0, 1, (64, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (128, 96)), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    want = np.asarray(jax.lax.dot_general(x, w, dn))
    got = np.asarray(jax.jit(
        lambda a, b: int8_dynamic_dot_general(a, b, dn)
    )(x, w))
    # relative error bounded by ~1/127 per operand
    denom = np.abs(want).mean()
    assert np.abs(got - want).mean() / denom < 0.03


def test_int8_model_close_to_float(rng):
    params = MMCT(TINY).init_params(jax.random.key(0))
    qcfg = dataclasses.replace(TINY, quantize="int8")
    b, t = 2, 64
    args = (
        jnp.asarray(rng.normal(0, 1, (b, t, 8)), jnp.float32),
        jnp.asarray(rng.normal(0, 1, (b, t, 12)), jnp.float32),
        jnp.asarray(rng.normal(0, 1, (b, t, 4)), jnp.float32),
        jnp.ones((b, t), bool),
    )
    f32 = jax.jit(lambda p: MMCT(TINY).apply({"params": p}, *args, True))(params)
    q8 = jax.jit(lambda p: MMCT(qcfg).apply({"params": p}, *args, True))(params)
    # logits agree to bf16-comparable error
    d = np.abs(np.asarray(q8.cls_logits) - np.asarray(f32.cls_logits))
    assert d.mean() < 0.05, d.mean()
    assert np.isfinite(np.asarray(q8.cls_logits)).all()
