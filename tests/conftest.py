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
