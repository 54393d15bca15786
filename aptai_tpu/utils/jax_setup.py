"""Process-level JAX setup helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on the persistent XLA compilation cache.

    Full-size encoder programs take minutes to compile through the TPU
    tunnel; the persistent cache makes every subsequent process start
    instantly.  Safe to call multiple times; must run before the first
    compilation.
    """
    import jax

    cache_dir = path or os.environ.get("APTAI_JAX_CACHE",
                                       os.path.expanduser("~/.jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
