"""Global cepstral mean/variance normalization.

The reference computes global Σx, Σx² during offline prep and applies
``(x - μ)/σ`` in the input_fn (SURVEY.md §4.4/§4.5, Appendix A). Here the
stats object is a small pytree applied on device right after the fused
front-end, and accumulated either on host during prep or on device.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CmvnStats:
    """Running global feature stats: count, Σx, Σx² per feature dim."""

    count: float
    sum: np.ndarray
    sumsq: np.ndarray

    @classmethod
    def zeros(cls, dim: int) -> "CmvnStats":
        return cls(0.0, np.zeros(dim, np.float64), np.zeros(dim, np.float64))

    def update(self, feats: np.ndarray, length: Optional[int] = None) -> None:
        """Accumulate [T, D] (optionally only the first ``length`` frames)."""
        f = np.asarray(feats, dtype=np.float64)
        if length is not None:
            f = f[:length]
        self.count += f.shape[0]
        self.sum += f.sum(axis=0)
        self.sumsq += (f * f).sum(axis=0)

    @property
    def mean(self) -> np.ndarray:
        return self.sum / max(self.count, 1.0)

    @property
    def std(self) -> np.ndarray:
        var = self.sumsq / max(self.count, 1.0) - self.mean**2
        return np.sqrt(np.maximum(var, 1e-10))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {"count": self.count, "sum": self.sum.tolist(), "sumsq": self.sumsq.tolist()},
                f,
            )

    @classmethod
    def load(cls, path: str) -> "CmvnStats":
        with open(path) as f:
            d = json.load(f)
        return cls(d["count"], np.asarray(d["sum"]), np.asarray(d["sumsq"]))


def apply_cmvn(feats: jnp.ndarray, mean, std) -> jnp.ndarray:
    """(x - μ)/σ over the last axis; mean/std are [D] arrays."""
    mean = jnp.asarray(mean, dtype=feats.dtype)
    std = jnp.asarray(std, dtype=feats.dtype)
    return (feats - mean) / std
