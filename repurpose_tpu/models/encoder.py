"""Pre-LN transformer encoder in Flax.

Capability-equivalent to the reference's nn.TransformerEncoder configuration
(models/MMCTransformer.py:41-55: pre-LN, ReLU FFN, dropout 0.1 on attention
weights / attention output / FFN hidden / FFN output), re-built TPU-first:

- packed QKV projection (one [d, 3d] matmul keeps the MXU busy and matches
  torch's in_proj layout for weight conversion);
- activations in ``compute_dtype`` (bfloat16 by default), LayerNorm and the
  attention softmax in float32, params always float32;
- attention implementation is pluggable (XLA einsum or the Pallas
  FlashAttention kernel) via ModelConfig.attention_impl;
- optional ``jax.checkpoint`` per layer (ModelConfig.remat) to trade FLOPs
  for HBM on long sequences.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from typing import Any

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.ops.attention import select_attention_impl

Array = jax.Array

_dense_kw = dict(
    kernel_init=nn.initializers.xavier_uniform(),
    bias_init=nn.initializers.zeros_init(),
    param_dtype=jnp.float32,
)


def dense_kw(cfg: ModelConfig) -> dict:
    return dict(_dense_kw, precision=cfg.matmul_precision)


class SelfAttention(nn.Module):
    """Packed-QKV multi-head self-attention (torch MHA layout parity)."""

    cfg: ModelConfig
    mesh: Any = None

    @nn.compact
    def __call__(
        self, x: Array, key_valid: Array, deterministic: bool,
        seg_ids: Array | None = None,
    ) -> Array:
        cfg = self.cfg
        d, h = cfg.d_model, cfg.num_heads
        dh = d // h
        b, t, _ = x.shape
        qkv = nn.Dense(3 * d, dtype=x.dtype, name="qkv", **dense_kw(cfg))(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, dh)
        k = k.reshape(b, t, h, dh)
        v = v.reshape(b, t, h, dh)
        if cfg.attention_impl == "ring" and not self.is_initializing():
            # (init traces with dummy batch-1 shapes that need not divide the
            # mesh; attention holds no params, so init uses the XLA path.)
            if self.mesh is None:
                raise ValueError('attention_impl="ring" needs build_model(cfg, mesh=...)')
            if seg_ids is not None:
                raise ValueError("sequence packing is not supported with ring attention")
            from repurpose_tpu.ops.ring_attention import ring_attention

            out = ring_attention(
                q, k, v, key_valid, self.mesh, precision=cfg.matmul_precision
            )
        else:
            attn = select_attention_impl(
                cfg.attention_impl, t, cfg.matmul_precision,
                cfg.attn_softmax_dtype,
            )
            out = attn(q, k, v, key_valid, seg_ids=seg_ids)
        # Attention-weight dropout (torch MHA's `dropout` arg) is not applied
        # inside the fused kernel; it is approximated by dropout on the
        # attention output, which the reference also applies (dropout1).
        out = out.reshape(b, t, d)
        out = nn.Dense(d, dtype=x.dtype, name="out", **dense_kw(cfg))(out)
        return out


class EncoderLayer(nn.Module):
    """x + Drop(SA(LN1(x))); x + Drop(FFN(LN2(x))) — pre-LN residual block."""

    cfg: ModelConfig
    mesh: Any = None

    @nn.compact
    def __call__(
        self, x: Array, key_valid: Array, deterministic: bool,
        seg_ids: Array | None = None,
    ) -> Array:
        cfg = self.cfg
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
        y = SelfAttention(cfg, mesh=self.mesh, name="attn")(
            y, key_valid, deterministic, seg_ids
        )
        y = nn.Dropout(cfg.dropout, deterministic=deterministic)(y)
        x = x + y

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
        y = nn.Dense(cfg.d_ff, dtype=x.dtype, name="linear1", **dense_kw(cfg))(y)
        y = nn.relu(y)
        y = nn.Dropout(cfg.dropout, deterministic=deterministic)(y)
        y = nn.Dense(cfg.d_model, dtype=x.dtype, name="linear2", **dense_kw(cfg))(y)
        y = nn.Dropout(cfg.dropout, deterministic=deterministic)(y)
        return x + y


class Encoder(nn.Module):
    """Stack of pre-LN layers (reference: 16, models/MMCTransformer.py:51-55)."""

    cfg: ModelConfig
    mesh: Any = None

    @nn.compact
    def __call__(
        self, x: Array, key_valid: Array, deterministic: bool,
        seg_ids: Array | None = None,
    ) -> Array:
        layer_cls = EncoderLayer
        if self.cfg.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
        for i in range(self.cfg.self_num_layers):
            if seg_ids is None:
                x = layer_cls(self.cfg, mesh=self.mesh, name=f"layer_{i}")(
                    x, key_valid, deterministic
                )
            else:
                x = layer_cls(self.cfg, mesh=self.mesh, name=f"layer_{i}")(
                    x, key_valid, deterministic, seg_ids
                )
        return x
