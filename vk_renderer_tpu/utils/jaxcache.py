"""Persistent XLA compilation cache setup.

The full render graph is a large XLA program (minutes of compile at 1080p);
the persistent cache makes every run after the first start in seconds.
Call before the first jit execution.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "VKR_JAX_CACHE", os.path.expanduser("~/.cache/vkr_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
