"""Convert a reference PyTorch MMCTransformer checkpoint to MMCT params.

Key mapping (reference module names from models/MMCTransformer.py:25-96; torch
``nn.Linear`` stores [out, in] so kernels are transposed):

    input_projection.{weight,bias}                  -> input_projection.{kernel.T,bias}
    input_norm.{weight,bias}                        -> input_norm.{scale,bias}
    multimodal_encoder.layers.{i}.self_attn.in_proj_{weight,bias}
                                                    -> encoder.layer_{i}.attn.qkv
    multimodal_encoder.layers.{i}.self_attn.out_proj -> encoder.layer_{i}.attn.out
    multimodal_encoder.layers.{i}.linear{1,2}        -> encoder.layer_{i}.linear{1,2}
    multimodal_encoder.layers.{i}.norm{1,2}          -> encoder.layer_{i}.norm{1,2}
    encoder_norm                                     -> encoder_norm
    feature_map.0 (Linear) / feature_map.1 (LN)      -> feature_map / feature_norm
    {cls,reg}_head.0 (LN) / .1 / .4 / .7 (Linears)   -> {cls,reg}_head.{norm,dense_0,dense_1,out}

Torch's packed in_proj rows are ordered [q; k; v]; the Flax ``qkv`` Dense uses
the same packing, so the transpose alone preserves semantics.

Checkpoints are loaded host-side (numpy); torch is only required when reading
a ``.pth`` file, not for the conversion itself.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from repurpose_tpu.config import ModelConfig


def _lin(sd: Mapping[str, np.ndarray], name: str) -> dict:
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"]).T),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _ln(sd: Mapping[str, np.ndarray], name: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def convert_reference_state_dict(
    state_dict: Mapping[str, np.ndarray], cfg: ModelConfig
) -> dict:
    """Build the MMCT params pytree from a reference torch state dict
    (tensors already converted to numpy, e.g. ``{k: v.numpy() for ...}``)."""
    sd = state_dict
    params: dict = {
        "input_projection": _lin(sd, "input_projection"),
        "input_norm": _ln(sd, "input_norm"),
        "encoder_norm": _ln(sd, "encoder_norm"),
        "feature_map": _lin(sd, "feature_map.0"),
        "feature_norm": _ln(sd, "feature_map.1"),
    }

    encoder = {}
    for i in range(cfg.self_num_layers):
        p = f"multimodal_encoder.layers.{i}"
        encoder[f"layer_{i}"] = {
            "attn": {
                "qkv": {
                    "kernel": np.ascontiguousarray(
                        np.asarray(sd[f"{p}.self_attn.in_proj_weight"]).T
                    ),
                    "bias": np.asarray(sd[f"{p}.self_attn.in_proj_bias"]),
                },
                "out": _lin(sd, f"{p}.self_attn.out_proj"),
            },
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
        }
    params["encoder"] = encoder

    for head in ("cls_head", "reg_head"):
        params[head] = {
            "norm": _ln(sd, f"{head}.0"),
            "dense_0": _lin(sd, f"{head}.1"),
            "dense_1": _lin(sd, f"{head}.4"),
            "out": _lin(sd, f"{head}.7"),
        }
    return params


def load_reference_checkpoint(path: str, cfg: ModelConfig) -> dict:
    """Read a reference ``.pth`` training checkpoint (main.py:513-531 schema:
    the model weights live under the 'model' key) and convert."""
    import torch  # local import: torch is optional at runtime

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return convert_reference_state_dict(
        {k: v.detach().cpu().numpy() for k, v in sd.items()}, cfg
    )
