"""Platform selection helper.

Some environments register a TPU-tunnel PJRT plugin from sitecustomize and
force ``jax_platforms`` via config at interpreter start — which silently
overrides a user's ``JAX_PLATFORMS`` env var (config beats env). Every CLI
calls this to re-assert the env value so ``JAX_PLATFORMS=cpu python train.py``
behaves as written.
"""

from __future__ import annotations

import os

import jax


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want and jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)
