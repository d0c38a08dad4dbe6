"""CLIP ViT-B/32 image encoder in Flax.

Capability parity with the reference's visual extractor
(preprocessing/visual_feature_extractor_clip.py:171-201): CLIP ViT-B/32
``encode_image`` followed by L2 normalization, one frame per second. The
reference encodes frame-at-a-time on GPU (`:184-199` — unbatched!); here
frames are encoded in large batches so the MXU stays busy.

Architecture (openai/clip-vit-base-patch32): 32x32 conv patch embed on
224x224 -> 49 patches + class token + learned position embeds, pre-LN
transformer (12 layers, width 768, 12 heads, QuickGELU), ln_post on the class
token, linear projection to 512. Weights convert from the HuggingFace
``CLIPVisionModelWithProjection`` state dict.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# ImageNet-style normalization CLIP preprocessing uses.
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    projection_dim: int = 512
    ln_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class _Block(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        d, h = cfg.width, cfg.heads
        b, t, _ = x.shape
        y = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="ln1")(x).astype(x.dtype)
        qkv = nn.Dense(3 * d, dtype=x.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, d // h)
        k = k.reshape(b, t, h, d // h)
        v = v.reshape(b, t, h, d // h)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(jnp.asarray(d // h, jnp.float32))
        w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=x.dtype, name="attn_out")(o)

        y = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="ln2")(x).astype(x.dtype)
        y = nn.Dense(d * cfg.mlp_ratio, dtype=x.dtype, name="mlp_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(d, dtype=x.dtype, name="mlp_proj")(y)
        return x + y


class CLIPVisionEncoder(nn.Module):
    """images [B, 224, 224, 3] (normalized) -> L2-normalized embeds [B, 512]."""

    cfg: CLIPVisionConfig = CLIPVisionConfig()
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, images: Array, normalize: bool = True) -> Array:
        cfg = self.cfg
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        x = images.astype(dtype)
        x = nn.Conv(
            cfg.width, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False, dtype=dtype, name="patch_embed",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, cfg.num_patches, cfg.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.width,), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dtype), (b, 1, cfg.width)), x], axis=1
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_patches + 1, cfg.width),
            jnp.float32,
        )
        x = x + pos.astype(dtype)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="ln_pre")(x).astype(dtype)
        for i in range(cfg.layers):
            x = _Block(cfg, dtype, name=f"block_{i}")(x)
        cls_tok = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="ln_post")(
            x[:, 0]
        )
        emb = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=jnp.float32, name="proj"
        )(cls_tok)
        if normalize:  # reference L2-normalizes features (:196-198)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb


def preprocess_frames(frames: np.ndarray) -> np.ndarray:
    """uint8 RGB [B, H, W, 3] -> CLIP-normalized float32 [B, 224, 224, 3].
    Resize (bicubic to 224 shorter side + center crop) via PIL, matching
    CLIP's preprocessing."""
    from PIL import Image

    out = np.empty((len(frames), 224, 224, 3), np.float32)
    for i, f in enumerate(frames):
        im = Image.fromarray(f)
        w, h = im.size
        # torchvision semantics exactly (CLIP's _transform is
        # Resize(224)+CenterCrop(224)): the long side TRUNCATES
        # (int(size * long / short)) and the crop origin ROUNDS
        # (int(round((x - 224) / 2))) — round-based resize / floor-based
        # crop differ by one pixel on a size-dependent subset of frames
        if w <= h:
            nw, nh = 224, int(224 * h / w)
        else:
            nw, nh = int(224 * w / h), 224
        im = im.resize((nw, nh), Image.BICUBIC)
        w, h = im.size
        left = int(round((w - 224) / 2.0))
        top = int(round((h - 224) / 2.0))
        im = im.crop((left, top, left + 224, top + 224))
        out[i] = np.asarray(im, np.float32) / 255.0
    return (out - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


def convert_hf_clip_vision(sd: Mapping[str, np.ndarray], cfg: CLIPVisionConfig) -> dict:
    """HF CLIPVisionModelWithProjection state dict -> CLIPVisionEncoder params."""
    p = "vision_model."

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
        # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
        "patch_embed": {
            "kernel": np.asarray(
                sd[f"{p}embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0)
        },
        "class_embedding": np.asarray(sd[f"{p}embeddings.class_embedding"]).reshape(-1),
        "position_embedding": np.asarray(
            sd[f"{p}embeddings.position_embedding.weight"]
        ),
        "ln_pre": ln(f"{p}pre_layrnorm"),  # (sic) HF attribute name
        "ln_post": ln(f"{p}post_layernorm"),
        "proj": {
            "kernel": np.ascontiguousarray(
                np.asarray(sd["visual_projection.weight"]).T
            )
        },
    }
    for i in range(cfg.layers):
        e = f"{p}encoder.layers.{i}."
        qw, kw, vw = (
            np.asarray(sd[f"{e}self_attn.{n}_proj.weight"]) for n in ("q", "k", "v")
        )
        qb, kb, vb = (
            np.asarray(sd[f"{e}self_attn.{n}_proj.bias"]) for n in ("q", "k", "v")
        )
        params[f"block_{i}"] = {
            "ln1": ln(f"{e}layer_norm1"),
            "ln2": ln(f"{e}layer_norm2"),
            "qkv": {
                "kernel": np.ascontiguousarray(np.concatenate([qw, kw, vw], 0).T),
                "bias": np.concatenate([qb, kb, vb], 0),
            },
            "attn_out": lin(f"{e}self_attn.out_proj"),
            "mlp_fc": lin(f"{e}mlp.fc1"),
            "mlp_proj": lin(f"{e}mlp.fc2"),
        }
    return params
