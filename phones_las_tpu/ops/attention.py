"""Attention mechanisms for the speller.

Covers the reference's flag-selected mechanisms (SURVEY.md §3 Speller row):
Bahdanau (additive, optionally weight-normalized) and Luong
(multiplicative, optionally scaled), with softmax over masked encoder
positions. TPU shape: keys are precomputed once per utterance with a
single MXU matmul; each decode step is a cheap batched matvec + masked
softmax over ≤ T/2^(L-1) keys (the pyramid already solved sequence
length — SURVEY.md §6 long-context row).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_NEG = -1e9


class AttentionParams(NamedTuple):
    """Parameters for one attention head (arrays only — the variant name
    is static config, passed to ``attention_scores`` explicitly so the
    params stay a jit-traceable pytree).

    wq: [Q, A] query projection (bahdanau only; None for luong)
    wk: [M, A] memory/key projection
    v:  [A] score vector (bahdanau); scalar g for norm/scaled variants
    b:  [A] normalized-bahdanau bias (None otherwise)
    """

    wq: Optional[jnp.ndarray]
    wk: jnp.ndarray
    v: Optional[jnp.ndarray]
    b: Optional[jnp.ndarray]


def init_attention_params(
    key, variant: str, query_dim: int, memory_dim: int, attn_units: int,
    dtype=jnp.float32,
) -> AttentionParams:
    k1, k2, k3 = jax.random.split(key, 3)

    def glorot(k, shape):
        s = jnp.sqrt(6.0 / (shape[0] + shape[1]))
        return jax.random.uniform(k, shape, dtype, -s, s)

    if variant in ("bahdanau", "bahdanau_norm"):
        wq = glorot(k1, (query_dim, attn_units))
        wk = glorot(k2, (memory_dim, attn_units))
        v = jax.random.uniform(
            k3, (attn_units,), dtype,
            -jnp.sqrt(3.0 / attn_units), jnp.sqrt(3.0 / attn_units),
        )
        b = jnp.zeros((attn_units,), dtype) if variant == "bahdanau_norm" else None
        return AttentionParams(wq, wk, v, b)
    if variant in ("luong", "luong_scaled"):
        # Luong "general": score = q · (W_k m); query_dim must equal attn_units.
        wk = glorot(k2, (memory_dim, attn_units))
        v = jnp.ones((), dtype) if variant == "luong_scaled" else None
        return AttentionParams(None, wk, v, None)
    raise ValueError(f"unknown attention variant {variant!r}")


def precompute_keys(params: AttentionParams, memory: jnp.ndarray) -> jnp.ndarray:
    """[B, T, M] → [B, T, A]; one MXU matmul, done once per utterance."""
    return jnp.einsum("btm,ma->bta", memory, params.wk)


def attention_scores(
    params: AttentionParams,
    variant: str,
    query: jnp.ndarray,  # [B, Q]
    keys: jnp.ndarray,  # [B, T, A]
    mask: jnp.ndarray,  # [B, T] 1 for valid
) -> jnp.ndarray:
    """Masked softmax attention probabilities [B, T]."""
    if variant in ("bahdanau", "bahdanau_norm"):
        q = query @ params.wq  # [B, A]
        act = jnp.tanh(keys + q[:, None, :] + (params.b if params.b is not None else 0.0))
        v = params.v
        if variant == "bahdanau_norm":
            # weight-normalized v (TF normalize=True): g * v / ||v||, with
            # g initialized to sqrt(1/A) folded into v's init here.
            v = v * jax.lax.rsqrt(jnp.sum(v * v) + 1e-12)
        scores = jnp.einsum("bta,a->bt", act, v)
    else:
        scores = jnp.einsum("bta,ba->bt", keys, query)
        if variant == "luong_scaled":
            scores = scores * params.v
    scores = jnp.where(mask > 0, scores, _NEG)
    return jax.nn.softmax(scores, axis=-1)


def attention_context(probs: jnp.ndarray, memory: jnp.ndarray) -> jnp.ndarray:
    """[B, T] × [B, T, M] → [B, M]."""
    return jnp.einsum("bt,btm->bm", probs, memory)
