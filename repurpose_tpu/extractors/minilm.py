"""MiniLM-L6 sentence encoder (all-MiniLM-L6-v2) in Flax.

Capability parity with the reference's text extractor
(preprocessing/text_feature_extractor.py:338-376): per-second transcript bins
-> SBERT MiniLM 384-d embeddings, zero vector for silent seconds. The
reference encodes each second's text individually; here all bins of a video
encode as one padded batch.

Architecture (HF BertModel, 6 layers, width 384, 12 heads, GELU, learned
positions, post-LN): tokenization stays host-side (transformers tokenizer);
this module is the transformer + mean pooling + L2 norm (the
sentence-transformers pooling recipe for this model).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class MiniLMConfig:
    vocab_size: int = 30522
    width: int = 384
    layers: int = 6
    heads: int = 12
    intermediate: int = 1536
    max_position: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12


class _BertLayer(nn.Module):
    cfg: MiniLMConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array, attn_mask: Array) -> Array:
        cfg = self.cfg
        d, h = cfg.width, cfg.heads
        b, t, _ = x.shape
        q = nn.Dense(d, dtype=x.dtype, name="q")(x).reshape(b, t, h, d // h)
        k = nn.Dense(d, dtype=x.dtype, name="k")(x).reshape(b, t, h, d // h)
        v = nn.Dense(d, dtype=x.dtype, name="v")(x).reshape(b, t, h, d // h)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(jnp.asarray(d // h, jnp.float32))
        s = s + jnp.where(attn_mask[:, None, None, :], 0.0, -1e9)
        w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, d)
        o = nn.Dense(d, dtype=x.dtype, name="attn_out")(o)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="attn_ln")(
            x + o
        ).astype(x.dtype)

        y = nn.Dense(cfg.intermediate, dtype=x.dtype, name="ffn_in")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=x.dtype, name="ffn_out")(y)
        return nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="ffn_ln")(
            x + y
        ).astype(x.dtype)


class MiniLMEncoder(nn.Module):
    """(input_ids, attention_mask [B,T]) -> L2-normalized embeds [B, 384]."""

    cfg: MiniLMConfig = MiniLMConfig()
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self, input_ids: Array, attention_mask: Array, token_type_ids: Array | None = None
    ) -> Array:
        cfg = self.cfg
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        b, t = input_ids.shape
        tok = self.param(
            "tok_embed", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.width), jnp.float32
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (cfg.max_position, cfg.width), jnp.float32
        )
        typ = self.param(
            "type_embed", nn.initializers.normal(0.02), (cfg.type_vocab, cfg.width), jnp.float32
        )
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = tok[input_ids] + pos[jnp.arange(t)][None] + typ[token_type_ids]
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="embed_ln")(x).astype(dtype)
        mask = attention_mask.astype(bool)
        for i in range(cfg.layers):
            x = _BertLayer(cfg, dtype, name=f"layer_{i}")(x, mask)
        # sentence-transformers mean pooling over valid tokens + L2 norm
        m = mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.clip(
            jnp.sum(m, axis=1), 1e-9, None
        )
        return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)


def convert_hf_bert(sd: Mapping[str, np.ndarray], cfg: MiniLMConfig) -> dict:
    """HF BertModel state dict -> MiniLMEncoder params."""

    def lin(name):
        return {
            "kernel": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"]).T),
            "bias": np.asarray(sd[f"{name}.bias"]),
        }

    def ln(name):
        return {
            "scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"]),
        }

    params: dict = {
        "tok_embed": np.asarray(sd["embeddings.word_embeddings.weight"]),
        "pos_embed": np.asarray(sd["embeddings.position_embeddings.weight"]),
        "type_embed": np.asarray(sd["embeddings.token_type_embeddings.weight"]),
        "embed_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.layers):
        e = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "q": lin(f"{e}attention.self.query"),
            "k": lin(f"{e}attention.self.key"),
            "v": lin(f"{e}attention.self.value"),
            "attn_out": lin(f"{e}attention.output.dense"),
            "attn_ln": ln(f"{e}attention.output.LayerNorm"),
            "ffn_in": lin(f"{e}intermediate.dense"),
            "ffn_out": lin(f"{e}output.dense"),
            "ffn_ln": ln(f"{e}output.LayerNorm"),
        }
    return params
