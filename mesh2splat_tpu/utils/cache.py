"""Persistent XLA compilation cache helper.

First compiles of the big fused programs take minutes over a tunneled TPU
runtime; reruns of the bench, the driver's compile checks, and the CPU test
suite should never pay that twice. The reference's analogue is the GL shader
program cache implicit in ShaderRegistry keeping linked programs alive
(reference: src/utils/ShaderRegistry.cpp:39-68) — here the artifact survives
the process.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent, best-effort).
    Default location: <repo or package parent>/.jax_cache, override with
    M2S_COMPILE_CACHE. Returns the directory used, or None on failure."""
    import jax

    cache = (
        cache_dir
        or os.environ.get("M2S_COMPILE_CACHE")
        or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return cache
    except Exception:
        return None
