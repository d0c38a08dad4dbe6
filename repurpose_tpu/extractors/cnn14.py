"""PANNs CNN14 audio embedder in Flax (inference).

Capability parity with the reference's audio extractor
(preprocessing/audio_feature_extractor.py:93-157): per-1-second chunks through
``panns_inference.AudioTagging`` (CNN14, AudioSet), keeping the 2048-d
embedding. The reference re-constructs the model per video (:125) and loops
chunks one by one; here all chunks of a video run as one batch.

Architecture (qiuqiangkong/audioset_tagging_cnn Cnn14): log-mel [T, 64] ->
BN over mel bins -> 6 ConvBlocks (two 3x3 conv+BN+ReLU each, channels
64..2048, 2x2 avg-pool after blocks 1-5, 1x1 after block 6) -> mean over mel
-> (max+mean) over time -> fc1+ReLU = 2048-d embedding.

BatchNorms are FOLDED into per-channel affines at weight-conversion time —
exact at inference, cheaper on TPU, and keeps the module stateless.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from repurpose_tpu.extractors.audio_frontend import logmel

Array = jax.Array

@dataclass(frozen=True)
class CNN14Config:
    n_mels: int = 64
    embed_dim: int = 2048
    channels: tuple = (64, 128, 256, 512, 1024, 2048)


class _Affine(nn.Module):
    """Folded BatchNorm: y = x * scale + bias (per channel, last axis)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class _ConvBlock(nn.Module):
    out_ch: int
    pool: tuple[int, int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in (1, 2):
            x = nn.Conv(
                self.out_ch, (3, 3), padding=1, use_bias=False,
                dtype=x.dtype, name=f"conv{i}",
            )(x)
            x = _Affine(self.out_ch, name=f"bn{i}")(x)
            x = nn.relu(x)
        if self.pool != (1, 1):
            x = nn.avg_pool(x, self.pool, strides=self.pool)
        return x


class CNN14(nn.Module):
    """log-mel [B, T, 64] -> embedding [B, 2048]."""

    cfg: CNN14Config = CNN14Config()
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, mel: Array) -> Array:
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        x = _Affine(self.cfg.n_mels, name="bn0")(mel.astype(dtype))
        x = x[..., None]  # [B, T, mel, 1] (NHWC)
        for i, ch in enumerate(self.cfg.channels):
            pool = (2, 2) if i < len(self.cfg.channels) - 1 else (1, 1)
            x = _ConvBlock(ch, pool, name=f"block{i + 1}")(x)
        x = jnp.mean(x, axis=2)  # mean over mel -> [B, T', C]
        x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)  # max+mean over time
        x = nn.Dense(self.cfg.embed_dim, dtype=jnp.float32, name="fc1")(
            x.astype(jnp.float32)
        )
        return nn.relu(x)


_EMBED_FNS: dict = {}


def embed_waveform_chunks(params, wave_chunks: Array, compute_dtype="bfloat16") -> Array:
    """[N, samples] 1-second chunks -> [N, 2048] embeddings. Jitted
    (CLAUDE.md: unjitted op-by-op dispatch is pathological on this box's
    tunneled TPU) with params threaded as an argument (relay rule)."""
    import jax

    fn = _EMBED_FNS.get(compute_dtype)
    if fn is None:
        fn = jax.jit(
            lambda v, w: CNN14(compute_dtype=compute_dtype).apply(v, logmel(w))
        )
        _EMBED_FNS[compute_dtype] = fn
    return fn({"params": params}, wave_chunks)


def _fold_bn(sd: Mapping[str, np.ndarray], name: str, eps: float = 1e-5) -> dict:
    gamma = np.asarray(sd[f"{name}.weight"], np.float64)
    beta = np.asarray(sd[f"{name}.bias"], np.float64)
    mean = np.asarray(sd[f"{name}.running_mean"], np.float64)
    var = np.asarray(sd[f"{name}.running_var"], np.float64)
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return {"scale": scale.astype(np.float32), "bias": bias.astype(np.float32)}


def convert_panns_cnn14(sd: Mapping[str, np.ndarray], cfg: CNN14Config = CNN14Config()) -> dict:
    """PANNs Cnn14 checkpoint state dict -> CNN14 params (BNs folded).

    Handles both raw ``torch.load(ckpt)['model']`` dicts and ones with a
    ``module.`` DataParallel prefix.
    """
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    params: dict = {"bn0": _fold_bn(sd, "bn0")}
    for i in range(1, 7):
        blk = f"conv_block{i}"
        params[f"block{i}"] = {
            # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
            "conv1": {"kernel": np.asarray(sd[f"{blk}.conv1.weight"]).transpose(2, 3, 1, 0)},
            "bn1": _fold_bn(sd, f"{blk}.bn1"),
            "conv2": {"kernel": np.asarray(sd[f"{blk}.conv2.weight"]).transpose(2, 3, 1, 0)},
            "bn2": _fold_bn(sd, f"{blk}.bn2"),
        }
    params["fc1"] = {
        "kernel": np.ascontiguousarray(np.asarray(sd["fc1.weight"]).T),
        "bias": np.asarray(sd["fc1.bias"]),
    }
    return params
