"""Persistent XLA compilation cache.

The full SwinVox train step takes minutes to compile (especially through
the remote-TPU tunnel, where the first compile measured ~18 min); the
persistent cache makes every subsequent process start in seconds.  Call
early, before the first jit execution.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/swinvox_tpu/jax")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SWINVOX_COMPILATION_CACHE", _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
