"""Train state: params + Adam optimizer with non-trainable masking.

The reference uses Adam with gradient clipping by global norm and an
optionally decaying learning rate (SURVEY.md §3 model_fn row). CMVN
stats and static binf code matrices live inside the params pytree but are
data, not weights — their gradients are zeroed before the optimizer so
they never move.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from phones_las_tpu.models.las import LASConfig, LASParams, init_las, trainable_filter


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    lr_decay_rate: float = 1.0  # 1.0 → constant lr
    lr_decay_steps: int = 10000
    warmup_steps: int = 0
    clip_norm: float = 5.0
    # scheduled sampling ramps linearly from 0 to the speller's
    # sampling_probability over this many steps (0 → constant)
    sampling_ramp_steps: int = 0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    num_steps: int = 10000
    eval_every: int = 1000
    checkpoint_every: int = 1000
    # also checkpoint when this many seconds elapse since the last save
    # (Estimator save_checkpoints_secs parity; 0 → step-based only)
    checkpoint_every_secs: float = 0.0
    keep_checkpoints: int = 5
    log_every: int = 100
    seed: int = 0


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: LASParams
    opt_state: optax.OptState
    rng: jax.Array


def lr_schedule(cfg: TrainConfig):
    def schedule(step):
        lr = cfg.learning_rate
        if cfg.warmup_steps > 0:
            lr = lr * jnp.minimum(1.0, (step + 1) / cfg.warmup_steps)
        if cfg.lr_decay_rate != 1.0:
            lr = lr * cfg.lr_decay_rate ** (
                jnp.maximum(step - cfg.warmup_steps, 0) / cfg.lr_decay_steps
            )
        return lr

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps),
        optax.scale_by_schedule(lambda s: -lr_schedule(cfg)(s)),
    )


def mask_grads(grads: LASParams, params: LASParams) -> LASParams:
    """Zero gradients of non-trainable leaves (CMVN stats, binf codes)."""
    mask = trainable_filter(params)

    def f(g, m):
        if g is None:
            return None
        return g if m else jnp.zeros_like(g)

    return jax.tree.map(f, grads, mask, is_leaf=lambda x: x is None)


def create_train_state(
    rng: jax.Array,
    model_cfg: LASConfig,
    train_cfg: TrainConfig,
    binf_codes=None,
) -> TrainState:
    k_init, k_state = jax.random.split(rng)
    params = init_las(k_init, model_cfg, binf_codes=binf_codes)
    tx = make_optimizer(train_cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=k_state,
    )
