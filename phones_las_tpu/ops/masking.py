"""Length-mask helpers shared across the stack."""

from __future__ import annotations

import jax.numpy as jnp


def length_mask(lengths: jnp.ndarray, max_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """[B] lengths → [B, max_len] mask (1 for valid positions)."""
    pos = jnp.arange(max_len)
    return (pos[None, :] < lengths[:, None]).astype(dtype)
