"""Persistent XLA compilation cache.

First compiles through this environment's TPU compile service take
minutes; the client-side persistent cache makes warm starts ~instant
across processes. Called by every CLI entry point and bench.py.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/phones_las_tpu/xla") -> None:
    import jax

    if jax.default_backend() != "tpu":
        # CPU compiles are fast, and sharing the cache dir across machines
        # poisons the CPU path: cache entries hold XLA:CPU AOT results
        # compiled elsewhere (cpu_aot_loader feature-mismatch errors), and
        # the axon plugin flips jax_platforms to 'axon' while handling the
        # failed load — observed switching a forced-CPU test process onto
        # the TPU mid-run. TPU-only caching avoids both.
        return
    cache_dir = os.path.expanduser(path)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or unsupported backend: harmless
