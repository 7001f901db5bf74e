"""Pyramid time reduction (the "p" in pBLSTM).

Reference behavior (SURVEY.md Appendix A): between encoder layers the
time axis halves by concatenating adjacent frame pairs —
``[B, T, U] → [B, T//2, 2U]``, lengths halve. Odd-length policy (SURVEY
Appendix B open question 4): we zero-pad to even and use
``new_len = ceil(len / 2)``, so no real frame is ever dropped; the padded
half-pair is masked downstream. On TPU this is a free reshape — no data
movement beyond a layout change that XLA folds into neighbors.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pyramid_reduce(
    x: jnp.ndarray, lengths: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, U] → [B, ceil(T/2), 2U]; lengths → ceil(lengths/2)."""
    b, t, u = x.shape
    if t % 2:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        t += 1
    x = x.reshape(b, t // 2, 2 * u)
    return x, (lengths + 1) // 2
