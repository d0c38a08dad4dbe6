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


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Persist XLA compilations across processes (serving cold-start fix).

    The flagship model compiles in minutes on remote-compile setups; with a
    persistent cache a restarted server reloads each (bucket, batch) program
    in seconds. Honors JAX_COMPILATION_CACHE_DIR; defaults to
    ``~/.cache/repurpose_tpu/xla``. Returns the directory used. See
    docs/SERVING.md."""
    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/repurpose_tpu/xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program, however fast it compiled locally (remote-compile
    # round trips dominate, not local compile time)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
