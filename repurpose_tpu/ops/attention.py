"""Masked multi-head self-attention compute paths.

The O(T^2) encoder attention is the hot spot of the whole framework
(reference: 16-layer nn.TransformerEncoder over padded [B,T<=1800,512],
models/MMCTransformer.py:135-138). Two interchangeable implementations:

- ``mha_xla``: plain jnp einsum formulation. XLA fuses the softmax chain and
  maps the two batched matmuls onto the MXU; fine for short T and the
  correctness baseline.
- ``mha_pallas`` (ops/flash_attention.py): blockwise FlashAttention Pallas
  kernel — O(T) memory, no [B,H,T,T] materialization, custom VJP.

``select_attention_impl`` picks per ModelConfig.attention_impl ("auto" uses
Pallas on TPU for T >= 512, XLA otherwise).

Masking semantics match torch's ``src_key_padding_mask``: padded *keys* are
excluded from every query's softmax. Padded *query* rows produce finite
garbage (torch emits NaN there with the math SDPA backend); both frameworks
exclude those rows from the loss, and parity tests compare valid rows only.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e9  # large-negative instead of -inf: keeps padded rows NaN-free


def mha_xla(
    q: Array,  # [B, T, H, Dh]
    k: Array,  # [B, T, H, Dh]
    v: Array,  # [B, T, H, Dh]
    key_valid: Array,  # [B, T] bool — True where the key position is real
    precision: str = "default",
    seg_ids: Array | None = None,  # [B, T] int32 — sequence-packing segments
) -> Array:
    """Reference XLA attention. Softmax in float32, output in q.dtype.

    ``seg_ids`` enables SEQUENCE PACKING (several videos sharing one row,
    data/batching.py:pack_batch): attention becomes block-diagonal — query i
    attends key j only when ``seg_ids[i] == seg_ids[j]`` and j is valid, so
    packed videos never see each other. The reference has no packing
    (dataset/RepurposeClip.py pads every video to the batch max)."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k,
        preferred_element_type=jnp.float32, precision=precision,
    )
    scores = scores * scale
    allowed = key_valid[:, None, :]
    if seg_ids is not None:
        allowed = allowed & (seg_ids[:, :, None] == seg_ids[:, None, :])
    bias = jnp.where(allowed[:, None], 0.0, NEG_INF)  # [B, 1|Tq, 1, Tk]->bhqk
    weights = jax.nn.softmax(scores + bias, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32, precision=precision,
    )
    return out.astype(q.dtype)


def select_attention_impl(
    impl: str, seq_len: int, precision: str = "default",
    softmax_dtype: str = "float32",
) -> Callable:
    """Resolve "auto"/"xla"/"pallas"/"pallas_full" to a callable
    (q, k, v, key_valid) -> out.

    "auto" and "pallas_full" use the fused Pallas forward AND backward —
    measured 1.57x the XLA-recompute backward for the flagship train step at
    T=2048 (133.8 vs 210.3 ms, v5e, chained back-to-back; round 1 called them
    par, but that measurement sat on this box's RPC noise floor).
    "pallas" keeps the fused forward with the XLA-recompute backward as an
    escape hatch."""
    if impl != "xla":
        on_tpu = jax.default_backend() == "tpu"
        if impl in ("pallas", "pallas_full") or (
            impl == "auto" and on_tpu and seq_len >= 512
        ):
            from repurpose_tpu.ops.flash_attention import mha_pallas

            backward = "xla" if impl == "pallas" else "pallas"
            # precision travels along: it governs the XLA fallback for
            # kernel-incompatible bucket lengths and the "xla" recompute
            # backward (fp32 parity mode must not silently drop to
            # bf16-grade dots, CLAUDE.md)
            return functools.partial(
                mha_pallas, backward=backward, precision=precision,
                softmax_dtype=softmax_dtype,
            )
    return functools.partial(mha_xla, precision=precision)
