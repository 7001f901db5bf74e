"""Persistent XLA compilation cache.

First compiles through this environment's TPU compile service take
minutes; the client-side persistent cache makes warm starts ~instant
across processes. Called by every CLI entry point and bench.py.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/phones_las_tpu/xla") -> None:
    import jax

    cache_dir = os.path.expanduser(path)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or unsupported backend: harmless
