"""Cross-modal attention encoder library.

Capability parity with the reference's ``models/transformer.py:1-191`` — the
hand-rolled attention stack for the paper's cross-modal architecture (MLP,
MultiHeadAttention, EncoderLayer, CrossAttentionEncoderLayer,
CrossSelfEncoderLayer, UniModalEncoder). In the reference nothing imports it
(the shipped MMCTransformer uses concat fusion, and the
``text_num_layers``/``cross_num_layers`` config knobs go unused); here the
library is wired up as an optional fusion variant:

    MMCTCross — per-modality UniModalEncoder stacks (``text_num_layers``
    each), then ``cross_num_layers`` CrossSelf blocks where the visual stream
    self-attends and cross-attends into audio and text, then the same
    feature-map + cls/reg heads as MMCT.

This gives the config knobs the reference accepts-but-ignores an actual
meaning, while the default model stays the parity-exact concat MMCT.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from repurpose_tpu.config import ModelConfig
from repurpose_tpu.models.encoder import dense_kw
from repurpose_tpu.models.mmct import MMCTOutput, _Head
from repurpose_tpu.models.positional import sinusoidal_positional_encoding
from repurpose_tpu.ops.attention import NEG_INF

Array = jax.Array


class MLP(nn.Module):
    """fc1(hidden) -> relu -> fc2(out) — the reference MLP exactly
    (transformer.py:24-35; it contains NO dropout)."""

    cfg: ModelConfig
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.Dense(self.hidden_dim, dtype=x.dtype, name="fc1", **dense_kw(self.cfg))(x)
        y = nn.relu(y)
        return nn.Dense(self.out_dim, dtype=x.dtype, name="fc2", **dense_kw(self.cfg))(y)


class FFN(nn.Module):
    """Linear(d -> d_ff) -> ReLU -> Linear(d_ff -> d) — the reference layers'
    ``ff`` block (transformer.py:91-95). ``inner_dropout`` adds the Dropout
    the reference places between relu and fc2 ONLY in
    CrossSelfEncoderLayer.ff (transformer.py:148-153)."""

    cfg: ModelConfig
    inner_dropout: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool) -> Array:
        y = nn.Dense(self.cfg.d_ff, dtype=x.dtype, name="lin1", **dense_kw(self.cfg))(x)
        y = nn.relu(y)
        if self.inner_dropout:
            y = nn.Dropout(self.cfg.dropout, deterministic=deterministic)(y)
        return nn.Dense(self.cfg.d_model, dtype=x.dtype, name="lin2", **dense_kw(self.cfg))(y)


class CrossAttention(nn.Module):
    """Explicit-QKV multi-head attention where queries and keys/values may
    come from different streams (reference MultiHeadAttention: masked fill
    with a large negative before softmax)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, q_in: Array, kv_in: Array, kv_valid: Array, deterministic: bool
    ) -> Array:
        cfg = self.cfg
        d, h = cfg.d_model, cfg.num_heads
        dh = d // h
        b, tq, _ = q_in.shape
        tk = kv_in.shape[1]
        q = nn.Dense(d, dtype=q_in.dtype, name="q", **dense_kw(cfg))(q_in)
        k = nn.Dense(d, dtype=q_in.dtype, name="k", **dense_kw(cfg))(kv_in)
        v = nn.Dense(d, dtype=q_in.dtype, name="v", **dense_kw(cfg))(kv_in)
        q = q.reshape(b, tq, h, dh)
        k = k.reshape(b, tk, h, dh)
        v = v.reshape(b, tk, h, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        s = s + jnp.where(kv_valid[:, None, None, :], 0.0, NEG_INF)
        # no attention-weight dropout: the reference MultiHeadAttention has
        # none (transformer.py:37-80); residual dropouts live in the layers
        w = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v).reshape(b, tq, d)
        return nn.Dense(d, dtype=q_in.dtype, name="out", **dense_kw(cfg))(o)


class EncoderLayer(nn.Module):
    """PRE-LN self-attention + FFN block: ``x + drop(attn(LN1(x)))`` then
    ``x + drop(ff(LN2(x)))`` — the reference EncoderLayer exactly
    (transformer.py:82-102). The reference instantiates these with its
    default ``dropout=0.0`` and never overrides it; the runnable variant
    applies ModelConfig.dropout on the same residual-add sites."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: Array, valid: Array, deterministic: bool) -> Array:
        drop = nn.Dropout(self.cfg.dropout, deterministic=deterministic)
        x2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x).astype(x.dtype)
        x = x + drop(CrossAttention(self.cfg, name="self_attn")(x2, x2, valid, deterministic))
        x2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x).astype(x.dtype)
        return x + drop(FFN(self.cfg, name="ffn")(x2, deterministic))


class CrossAttentionEncoderLayer(nn.Module):
    """PRE-LN cross-attention + FFN (reference CrossAttentionEncoderLayer,
    transformer.py:104-130): ``x + drop(cross(LN1(x), context))`` then
    ``x + drop(ff(LN2(x)))``."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, x: Array, context: Array, ctx_valid: Array, deterministic: bool
    ) -> Array:
        drop = nn.Dropout(self.cfg.dropout, deterministic=deterministic)
        x2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x).astype(x.dtype)
        x = x + drop(
            CrossAttention(self.cfg, name="cross_attn")(x2, context, ctx_valid, deterministic)
        )
        x2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x).astype(x.dtype)
        return x + drop(FFN(self.cfg, name="ffn")(x2, deterministic))


class CrossSelfEncoderLayer(nn.Module):
    """Self-attn -> cross-attn -> FFN (reference CrossSelfEncoderLayer,
    transformer.py:132-176) — including its NORM-IN-RESIDUAL quirk: the
    first residual adds to the un-normed input, but the cross and FFN
    residuals add to the ALREADY-NORMED tensor (``x = norm_2(x);
    x = x + drop(cross(x, ...))``), and the FFN carries an inner dropout
    the sibling layers lack."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, x: Array, valid: Array, context: Array, ctx_valid: Array,
        deterministic: bool,
    ) -> Array:
        drop = nn.Dropout(self.cfg.dropout, deterministic=deterministic)
        x2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x).astype(x.dtype)
        x = x + drop(CrossAttention(self.cfg, name="self_attn")(x2, x2, valid, deterministic))
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x).astype(x.dtype)
        x = x + drop(
            CrossAttention(self.cfg, name="cross_attn")(x, context, ctx_valid, deterministic)
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln3")(x).astype(x.dtype)
        return x + drop(FFN(self.cfg, inner_dropout=True, name="ffn")(x, deterministic))


class UniModalEncoder(nn.Module):
    """Per-modality encoder: MLP(input, d_ff, d_model) projection + PE + N
    pre-LN self layers (reference UniModalEncoder, transformer.py:179-191)."""

    cfg: ModelConfig
    num_layers: int

    @nn.compact
    def __call__(self, feats: Array, valid: Array, deterministic: bool) -> Array:
        cfg = self.cfg
        x = MLP(cfg, cfg.d_ff, cfg.d_model, name="proj")(feats)
        pe = sinusoidal_positional_encoding(x.shape[1], cfg.d_model)
        x = x + pe[None].astype(x.dtype)
        for i in range(self.num_layers):
            x = EncoderLayer(cfg, name=f"layer_{i}")(x, valid, deterministic)
        return x


class MMCTCross(nn.Module):
    """Cross-modal fusion variant: the architecture the reference's unused
    library and config knobs describe, made runnable."""

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
        n_uni = max(cfg.text_num_layers, 1)

        vis = UniModalEncoder(cfg, n_uni, name="visual_encoder")(
            visual.astype(dtype), mask, deterministic
        )
        aud = UniModalEncoder(cfg, n_uni, name="audio_encoder")(
            audio.astype(dtype), mask, deterministic
        )
        txt = UniModalEncoder(cfg, n_uni, name="text_encoder")(
            text.astype(dtype), mask, deterministic
        )

        x = vis
        context = jnp.concatenate([aud, txt], axis=1)
        ctx_valid = jnp.concatenate([mask, mask], axis=1)
        for i in range(max(cfg.cross_num_layers, 1)):
            x = CrossSelfEncoderLayer(cfg, name=f"cross_{i}")(
                x, mask, context, ctx_valid, deterministic
            )

        f = nn.Dense(cfg.d_model, dtype=dtype, name="feature_map", **dense_kw(cfg))(x)
        f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="feature_norm")(f).astype(dtype)
        f = nn.relu(f)
        f = nn.Dropout(cfg.dropout, deterministic=deterministic)(f)
        cls_logits = _Head(cfg, 1, final_relu=False, name="cls_head")(f, deterministic)
        offsets = _Head(cfg, 2, final_relu=True, name="reg_head")(f, deterministic)
        return MMCTOutput(cls_logits=cls_logits, offsets=offsets, feats=f)
