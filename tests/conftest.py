"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

The ambient TPU-tunnel plugin's sitecustomize calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start,
which OVERRIDES the JAX_PLATFORMS env var — so env alone cannot pin tests to
CPU (ops would dispatch one-by-one over the network tunnel, ~10x slower).
A config.update here wins because it runs later; backends initialize lazily
on first use, after this file.

Multi-chip sharding tests run on the virtual host-platform mesh (the driver
separately dry-runs the real multi-chip path via
__graft_entry__.dryrun_multichip).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def tiny():
    """Randomly-initialized tiny HF Whisper + converted JAX params, shared by
    test_whisper / test_whisper_align / test_whisper_beam. Session-scoped:
    the HF build + conversion is expensive on this one-core box, and the old
    import-a-module-fixture pattern rebuilt it once per consuming module."""
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from repurpose_tpu.extractors.whisper_jax import (
        config_from_hf,
        convert_hf_whisper,
    )

    hf_cfg = WhisperConfig(
        vocab_size=51865, num_mel_bins=8, d_model=16, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32, max_source_positions=1500,
        max_target_positions=24,
    )
    # eager attention so output_attentions works (cross-attention parity,
    # tests/test_whisper_align.py); numerics are identical to sdpa
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    enc_p, dec_p = convert_hf_whisper(sd, cfg)
    return hf, cfg, enc_p, dec_p
