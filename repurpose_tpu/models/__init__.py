import jax
import jax.numpy as jnp

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.models.mmct import MMCT  # noqa: F401
from repurpose_tpu.models.torch_convert import (  # noqa: F401
    convert_reference_state_dict,
    export_reference_state_dict,
    load_reference_checkpoint,
    save_reference_checkpoint,
)


def build_model(cfg: ModelConfig, mesh=None):
    """Model factory: the parity-exact concat-fusion MMCT (default) or the
    cross-modal / bottleneck fusion variants. ``mesh`` is required for
    attention_impl="ring" (sequence-parallel attention needs the ring axis)."""
    if cfg.fusion == "cross":
        from repurpose_tpu.models.cross_modal import MMCTCross

        return MMCTCross(cfg)
    if cfg.fusion == "bottleneck":
        from repurpose_tpu.models.bottleneck import MMCTBottleneck

        return MMCTBottleneck(cfg)
    return MMCT(cfg, mesh=mesh)


def init_model_params(model, cfg: ModelConfig, rng, bucket: int = 64, batch: int = 1):
    """Jitted parameter init for any model with the MMCT call signature."""
    dummy = lambda d: jnp.zeros((batch, bucket, d), jnp.float32)

    def init(r):
        return model.init(
            r, dummy(cfg.vis_dim), dummy(cfg.aud_dim), dummy(cfg.text_dim),
            jnp.ones((batch, bucket), bool), True,
        )["params"]

    return jax.jit(init)(rng)
