"""Checkpoint interop with the reference, BOTH directions.

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


def reference_pe_buffer(d_model: int, max_len: int = 5000) -> np.ndarray:
    """The reference's persistent ``positional_encoding.pe`` buffer
    (models/MMCTransformer.py:11-18), synthesized host-side: [1, max_len,
    d_model] float32 sinusoidal table. It is deterministic (no trained
    state), but torch's ``load_state_dict`` is strict by default
    (reference inference.py:34), so the exported dict must carry it."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32)
        * np.float32(-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[None]


def _reference_pe_torch(d_model: int, max_len: int = 5000) -> "object":
    """Bit-exact variant of :func:`reference_pe_buffer` using torch's own
    float32 exp/sin/cos (their CPU libm rounds differently from numpy's at
    large arguments — up to 1.2e-4 near position 5000). Used by
    :func:`save_reference_checkpoint`, where torch is present anyway, so the
    written buffer is indistinguishable from one the reference computed."""
    import math

    import torch

    half = torch.exp(
        torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model)
    )
    angles = torch.arange(max_len, dtype=torch.float).unsqueeze(1) * half
    pe = torch.zeros(max_len, d_model)
    pe[:, 0::2] = torch.sin(angles)
    pe[:, 1::2] = torch.cos(angles)
    return pe.unsqueeze(0)


def _lin_out(sd: dict, name: str, p: Mapping) -> None:
    sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    sd[f"{name}.bias"] = np.asarray(p["bias"])


def _ln_out(sd: dict, name: str, p: Mapping) -> None:
    sd[f"{name}.weight"] = np.asarray(p["scale"])
    sd[f"{name}.bias"] = np.asarray(p["bias"])


def export_reference_state_dict(params: Mapping, cfg: ModelConfig) -> dict:
    """Inverse of ``convert_reference_state_dict``: MMCT params -> a numpy
    state dict in the reference's module names (models/MMCTransformer.py:
    25-96), so a model TRAINED HERE deploys through the reference's own
    torch inference stack. Exact round-trip on the trained tensors:
    convert(export(p)) == p, and export(convert(sd)) == sd on every key
    except ``positional_encoding.pe`` (convert ignores that deterministic
    buffer and export regenerates it — numpy's libm differs from torch's by
    up to ~1.2e-4 near position 5000; ``save_reference_checkpoint`` ships
    the torch-bit-exact variant) — tests/test_torch_convert.py."""
    sd: dict = {}
    sd["positional_encoding.pe"] = reference_pe_buffer(cfg.d_model)
    _lin_out(sd, "input_projection", params["input_projection"])
    _ln_out(sd, "input_norm", params["input_norm"])
    _ln_out(sd, "encoder_norm", params["encoder_norm"])
    _lin_out(sd, "feature_map.0", params["feature_map"])
    _ln_out(sd, "feature_map.1", params["feature_norm"])
    for i in range(cfg.self_num_layers):
        p = f"multimodal_encoder.layers.{i}"
        layer = params["encoder"][f"layer_{i}"]
        sd[f"{p}.self_attn.in_proj_weight"] = np.ascontiguousarray(
            np.asarray(layer["attn"]["qkv"]["kernel"]).T
        )
        sd[f"{p}.self_attn.in_proj_bias"] = np.asarray(layer["attn"]["qkv"]["bias"])
        _lin_out(sd, f"{p}.self_attn.out_proj", layer["attn"]["out"])
        _lin_out(sd, f"{p}.linear1", layer["linear1"])
        _lin_out(sd, f"{p}.linear2", layer["linear2"])
        _ln_out(sd, f"{p}.norm1", layer["norm1"])
        _ln_out(sd, f"{p}.norm2", layer["norm2"])
    for head in ("cls_head", "reg_head"):
        _ln_out(sd, f"{head}.0", params[head]["norm"])
        _lin_out(sd, f"{head}.1", params[head]["dense_0"])
        _lin_out(sd, f"{head}.4", params[head]["dense_1"])
        _lin_out(sd, f"{head}.7", params[head]["out"])
    return sd


def save_reference_checkpoint(
    path: str, params: Mapping, cfg: ModelConfig,
    epoch: int = 0, loss: float = 0.0,
) -> None:
    """Write a ``.pth`` the reference's inference.py:33-34 loads directly
    (main.py:513-531 schema; the optimizer slot is omitted — torch's
    ``load_state_dict(ckpt['model'])`` is all the reference eval reads)."""
    import torch  # local import: torch is optional at runtime

    sd = export_reference_state_dict(params, cfg)
    # np.array copy: JAX buffers are non-writable and torch warns on
    # zero-copy views of them
    model = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    model["positional_encoding.pe"] = _reference_pe_torch(cfg.d_model)
    torch.save({"model": model, "epoch": epoch, "loss": loss}, path)
