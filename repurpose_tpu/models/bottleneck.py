"""Bottleneck-token multimodal fusion (MBT-style).

Third fusion family beyond the reference's capabilities, after the
concat-fusion MMCT (the shipped reference model) and the cross-attention
MMCTCross (its unused library): modalities exchange information ONLY through
a small set of shared bottleneck tokens, per "Attention Bottlenecks for
Multimodal Fusion" (arXiv 2107.00135 — PAPERS.md). Cost grows as
O(M * (T + nb)^2) instead of the cross variant's O(T * M*T), and the
bottleneck forces compressed cross-modal exchange.

Structure:
- per-modality UniModalEncoder stacks (``text_num_layers`` layers);
- ``cross_num_layers`` fusion rounds: each modality self-attends over
  [its tokens ; bottleneck tokens]; the per-modality bottleneck updates are
  averaged into the shared bottleneck for the next round;
- per-second outputs: mean of the modality streams -> feature map -> the
  same cls/reg heads as MMCT. Selected via ``fusion: "bottleneck"``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.models.cross_modal import EncoderLayer, UniModalEncoder
from repurpose_tpu.models.encoder import dense_kw
from repurpose_tpu.models.mmct import MMCTOutput, _Head

Array = jax.Array

N_BOTTLENECK = 8  # MBT uses ~4; 8 keeps the (T + nb) padding tile-friendly


class MMCTBottleneck(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        visual: Array,
        audio: Array,
        text: Array,
        mask: Array,
        deterministic: bool = True,
    ) -> MMCTOutput:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        b = visual.shape[0]
        n_uni = max(cfg.text_num_layers, 1)

        streams = {
            "visual": UniModalEncoder(cfg, n_uni, name="visual_encoder")(
                visual.astype(dtype), mask, deterministic
            ),
            "audio": UniModalEncoder(cfg, n_uni, name="audio_encoder")(
                audio.astype(dtype), mask, deterministic
            ),
            "text": UniModalEncoder(cfg, n_uni, name="text_encoder")(
                text.astype(dtype), mask, deterministic
            ),
        }

        bottleneck0 = self.param(
            "bottleneck_tokens",
            nn.initializers.normal(0.02),
            (N_BOTTLENECK, cfg.d_model),
            jnp.float32,
        )
        bn = jnp.broadcast_to(
            bottleneck0.astype(dtype), (b, N_BOTTLENECK, cfg.d_model)
        )
        bn_valid = jnp.ones((b, N_BOTTLENECK), bool)
        ext_valid = jnp.concatenate([mask, bn_valid], axis=1)

        for i in range(max(cfg.cross_num_layers, 1)):
            bn_updates = []
            for m in ("visual", "audio", "text"):
                joint = jnp.concatenate([streams[m], bn], axis=1)
                joint = EncoderLayer(cfg, name=f"fuse_{i}_{m}")(
                    joint, ext_valid, deterministic
                )
                streams[m] = joint[:, : streams[m].shape[1]]
                bn_updates.append(joint[:, streams[m].shape[1] :])
            bn = sum(bn_updates) / len(bn_updates)

        fused = (streams["visual"] + streams["audio"] + streams["text"]) / 3.0
        f = nn.Dense(cfg.d_model, dtype=dtype, name="feature_map", **dense_kw(cfg))(fused)
        f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="feature_norm")(f).astype(dtype)
        f = nn.relu(f)
        f = nn.Dropout(cfg.dropout, deterministic=deterministic)(f)
        cls_logits = _Head(cfg, 1, final_relu=False, name="cls_head")(f, deterministic)
        offsets = _Head(cfg, 2, final_relu=True, name="reg_head")(f, deterministic)
        return MMCTOutput(cls_logits=cls_logits, offsets=offsets, feats=f)
