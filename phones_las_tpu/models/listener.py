"""Listener: pyramidal BiLSTM encoder.

Reference shape (SURVEY.md §3 Listener row, §4.1 hot loop 1): a stack of
bidirectional LSTM layers; from the second layer on, the time axis is
halved before the layer by reshape-concat of adjacent frame pairs, so the
final encoder emits ``ceil(T / 2^(L-1))`` frames of ``2·units`` features.
Per-layer dropout on outputs during training.

TPU mapping: each direction is one big input-projection matmul plus a
fused recurrence (``ops.lstm``); the pyramid is a free reshape.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from phones_las_tpu.ops.lstm import LSTMParams, bilstm_layer, init_lstm_params
from phones_las_tpu.ops.pyramid import pyramid_reduce


@dataclasses.dataclass(frozen=True)
class ListenerConfig:
    input_dim: int = 120  # 40 log-mel × (1 + Δ + ΔΔ)
    num_layers: int = 2
    units: int = 256
    dropout: float = 0.0

    @property
    def output_dim(self) -> int:
        return 2 * self.units

    def time_reduction(self) -> int:
        """Overall T divisor: 2^(num_layers - 1)."""
        return 2 ** (self.num_layers - 1)


class ListenerParams(NamedTuple):
    # layers[l] = (forward LSTMParams, backward LSTMParams)
    layers: Tuple[Tuple[LSTMParams, LSTMParams], ...]


def init_listener(key, cfg: ListenerConfig, dtype=jnp.float32) -> ListenerParams:
    layers = []
    in_dim = cfg.input_dim
    for l in range(cfg.num_layers):
        key, kf, kb = jax.random.split(key, 3)
        layers.append(
            (
                init_lstm_params(kf, in_dim, cfg.units, dtype),
                init_lstm_params(kb, in_dim, cfg.units, dtype),
            )
        )
        # next layer sees the pyramid concat of this layer's bi-output
        in_dim = 4 * cfg.units
    return ListenerParams(layers=tuple(layers))


def listen(
    params: ListenerParams,
    cfg: ListenerConfig,
    feats: jnp.ndarray,  # [B, T, D]
    lengths: jnp.ndarray,  # [B]
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    implementation: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (encoder outputs [B, ceil(T/2^(L-1)), 2U], reduced lengths)."""
    x, lens = feats, lengths
    for l, (pf, pb) in enumerate(params.layers):
        if l > 0:
            x, lens = pyramid_reduce(x, lens)
        x, _ = bilstm_layer(pf, pb, x, lens, implementation=implementation)
        if train and cfg.dropout > 0.0:
            assert dropout_rng is not None, "train=True with dropout needs dropout_rng"
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = 1.0 - cfg.dropout
            mask = jax.random.bernoulli(sub, keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
    return x, lens
