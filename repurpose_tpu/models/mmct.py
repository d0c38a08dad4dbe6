"""MMCT — the multimodal temporal transformer (flagship model).

Capability-equivalent to the reference MMCTransformer
(models/MMCTransformer.py:25-157): early fusion by concatenation of the three
per-second feature streams (CLIP 512 + PANNs 2048 + SBERT 384 = 2944), linear
projection + LayerNorm to d_model, sinusoidal positional encoding, a deep
pre-LN encoder, then a feature MLP feeding twin heads:

- ``cls``: per-second engagement logit [B, T, 1];
- ``reg``: per-second (left, right) boundary offsets [B, T, 2], ReLU'd
  non-negative (models/MMCTransformer.py:92).

TPU-first differences from the reference:
- functional Flax module — params live in a pytree, sharded by
  ``parallel.sharding`` rules over the device mesh;
- activations in bfloat16 (heads' logits returned in float32), LayerNorm and
  softmax in float32;
- attention is pluggable (XLA / Pallas FlashAttention);
- all shapes static: T is a bucket size, padding carried in ``mask``.

Weight init matches the reference (_init_weights, MMCTransformer.py:98-107):
Xavier-uniform kernels, zero biases, unit LayerNorm.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.models.encoder import Encoder, dense_kw
from repurpose_tpu.models.positional import sinusoidal_positional_encoding

Array = jax.Array


class MMCTOutput(NamedTuple):
    cls_logits: Array  # [B, T, 1] float32
    offsets: Array  # [B, T, 2] float32, non-negative
    feats: Array  # [B, T, d_model] compute dtype


class _Head(nn.Module):
    """LN -> Dense(hidden) -> relu -> drop -> Dense(hidden) -> relu -> drop
    -> Dense(out) — the reference's cls/reg head shape (MMCTransformer.py:71-93).

    ``final_relu`` heads (the reg head) can use softplus instead via
    ModelConfig.reg_activation: the reference's final ReLU has a zero-gradient
    region that leaves offset units permanently dead once the reg loss is on.
    """

    cfg: ModelConfig
    out_dim: int
    final_relu: bool

    @nn.compact
    def __call__(self, x: Array, deterministic: bool) -> Array:
        cfg = self.cfg
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(x.dtype)
        for i in range(2):
            y = nn.Dense(cfg.hidden_dim, dtype=x.dtype, name=f"dense_{i}", **dense_kw(cfg))(y)
            y = nn.relu(y)
            y = nn.Dropout(cfg.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.out_dim, dtype=jnp.float32, name="out", **dense_kw(cfg))(y)
        if self.final_relu:
            y = nn.relu(y) if cfg.reg_activation == "relu" else jax.nn.softplus(y)
        return y.astype(jnp.float32)


class MMCT(nn.Module):
    cfg: ModelConfig
    mesh: Any = None  # required for attention_impl="ring" (static, hashable)

    @nn.compact
    def __call__(
        self,
        visual: Array,  # [B, T, vis_dim]
        audio: Array,  # [B, T, aud_dim]
        text: Array,  # [B, T, text_dim]
        mask: Array,  # [B, T] bool — True on real timesteps
        deterministic: bool = True,
        seg_ids: Array | None = None,  # [B, T] int32 — sequence packing
        positions: Array | None = None,  # [B, T] int32 — position WITHIN video
    ) -> MMCTOutput:
        """``seg_ids``/``positions`` enable sequence-packed batches
        (data/batching.py:pack_batch): several videos share a row, attention
        goes block-diagonal per segment, and the positional encoding restarts
        at each video's own t=0 (``positions``) so a packed video sees exactly
        the PE an unpacked one would. The reference has no packing."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        streams = {"visual": visual, "audio": audio, "text": text}
        x = jnp.concatenate(
            [streams[m].astype(dtype) for m in cfg.modalities], axis=-1
        )
        x = nn.Dense(cfg.d_model, dtype=dtype, name="input_projection", **dense_kw(cfg))(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="input_norm")(x)
        pe = sinusoidal_positional_encoding(x.shape[1], cfg.d_model)
        x = (x + (pe[None] if positions is None else pe[positions])).astype(dtype)

        x = Encoder(cfg, mesh=self.mesh, name="encoder")(
            x, mask, deterministic, seg_ids
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="encoder_norm")(x).astype(dtype)

        # feature_map: Dense -> LN -> relu -> drop (MMCTransformer.py:63-68)
        f = nn.Dense(cfg.d_model, dtype=dtype, name="feature_map", **dense_kw(cfg))(x)
        f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="feature_norm")(f).astype(dtype)
        f = nn.relu(f)
        f = nn.Dropout(cfg.dropout, deterministic=deterministic)(f)

        cls_logits = _Head(cfg, 1, final_relu=False, name="cls_head")(f, deterministic)
        offsets = _Head(cfg, 2, final_relu=True, name="reg_head")(f, deterministic)
        return MMCTOutput(cls_logits=cls_logits, offsets=offsets, feats=f)

    def init_params(self, rng: jax.Array, bucket: int = 64, batch: int = 1):
        """Initialize a parameter pytree on tiny static shapes (jitted: one
        compiled program instead of hundreds of eager init ops). Delegates to
        ``models.init_model_params`` — the single init path shared with
        ``create_train_state``."""
        from repurpose_tpu.models import init_model_params

        return init_model_params(self, self.cfg, rng, bucket=bucket, batch=batch)
