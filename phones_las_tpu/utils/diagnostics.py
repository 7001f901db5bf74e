"""Observability / sanitizer hooks (SURVEY.md §6 aux subsystems).

Reference → rebuild mapping:
  * tracing/profiling: TF timeline (unwired in the reference) →
    ``jax.profiler`` traces viewable in TensorBoard's profile plugin,
    plus named-scope annotations around the hot steps;
  * race detection/sanitizers: moot under jit purity → the analogous
    tool is the NaN/Inf checker (``jax_debug_nans``) and finite-ness
    asserts;
  * metrics/logging: tf.summary scalars + attention images →
    clu.metric_writers (TensorBoard) via the Trainer.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, *, with_perfetto: bool = False) -> Iterator[None]:
    """Capture a device trace for TensorBoard's profile plugin.

    Usage::
        with profile_trace("runs/t1/profile"):
            for _ in range(10):
                state, _ = train_step(state, batch)
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir, create_perfetto_link=with_perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True) -> None:
    """The jit-world 'sanitizer': raise on NaN production inside jitted
    computations (recompiles with checks; debug only)."""
    jax.config.update("jax_debug_nans", enable)


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side finite check for tests / debug loops."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise FloatingPointError(f"non-finite values in {name}{jax.tree_util.keystr(path)}")
