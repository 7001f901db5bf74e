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
    v:  [A] score vector (bahdanau); scalar g for luong_scaled
    b:  [A] normalized-bahdanau bias (None otherwise)
    score_bias: scalar bias on monotonic scores (None otherwise)
    g:  scalar weight-norm gain (bahdanau_norm only; TF normalize=True
        trains g alongside the unit-normalized v)
    """

    wq: Optional[jnp.ndarray]
    wk: jnp.ndarray
    v: Optional[jnp.ndarray]
    b: Optional[jnp.ndarray]
    score_bias: Optional[jnp.ndarray]
    g: Optional[jnp.ndarray] = None


def init_attention_params(
    key, variant: str, query_dim: int, memory_dim: int, attn_units: int,
    dtype=jnp.float32,
) -> AttentionParams:
    k1, k2, k3 = jax.random.split(key, 3)

    def glorot(k, shape):
        s = jnp.sqrt(6.0 / (shape[0] + shape[1]))
        return jax.random.uniform(k, shape, dtype, -s, s)

    monotonic = variant.endswith("_monotonic")
    base = variant[: -len("_monotonic")] if monotonic else variant
    score_bias = jnp.zeros((), dtype) if monotonic else None
    if base in ("bahdanau", "bahdanau_norm"):
        wq = glorot(k1, (query_dim, attn_units))
        wk = glorot(k2, (memory_dim, attn_units))
        v = jax.random.uniform(
            k3, (attn_units,), dtype,
            -jnp.sqrt(3.0 / attn_units), jnp.sqrt(3.0 / attn_units),
        )
        b = jnp.zeros((attn_units,), dtype) if base == "bahdanau_norm" else None
        g = (
            jnp.asarray(jnp.sqrt(1.0 / attn_units), dtype)
            if base == "bahdanau_norm" else None
        )
        return AttentionParams(wq, wk, v, b, score_bias, g)
    if base in ("luong", "luong_scaled"):
        # Luong "general": score = q · (W_k m); query_dim must equal attn_units.
        assert query_dim == attn_units, (
            f"luong attention requires attention_units == decoder units "
            f"({attn_units} != {query_dim})"
        )
        wk = glorot(k2, (memory_dim, attn_units))
        v = jnp.ones((), dtype) if base == "luong_scaled" else None
        return AttentionParams(None, wk, v, None, score_bias)
    raise ValueError(f"unknown attention variant {variant!r}")


def precompute_keys(params: AttentionParams, memory: jnp.ndarray) -> jnp.ndarray:
    """[B, T, M] → [B, T, A]; one MXU matmul, done once per utterance."""
    return jnp.einsum("btm,ma->bta", memory, params.wk)


def _raw_scores(params, base_variant, query, keys):
    """query [B, Q] → scores [B, T]; query [B, K, Q] (beam axis, shared
    keys — beam search never tiles memory across beams) → [B, K, T].

    The beamed additive form stays the XLA broadcast-fuse: measured on
    v5e, it is VPU-compute-bound on the K·T·A tanh (not bandwidth), and
    hand-written Pallas variants (VMEM-resident key slabs, MXU reduce)
    were 1.3–2.1× *slower* than XLA's fusion — negative result recorded
    in docs/PERF.md."""
    beamed = query.ndim == 3
    if base_variant in ("bahdanau", "bahdanau_norm"):
        q = query @ params.wq  # [B, A] or [B, K, A]
        b = params.b if params.b is not None else 0.0
        v = params.v
        if base_variant == "bahdanau_norm":
            # weight-normalized v (TF normalize=True): trainable scalar
            # gain g (init sqrt(1/A)) times unit-normalized v.
            v = params.g * v * jax.lax.rsqrt(jnp.sum(v * v) + 1e-12)
        if beamed:
            act = jnp.tanh(keys[:, None, :, :] + q[:, :, None, :] + b)
            return jnp.einsum("bkta,a->bkt", act, v)
        act = jnp.tanh(keys + q[:, None, :] + b)
        return jnp.einsum("bta,a->bt", act, v)
    scores = jnp.einsum(
        "bta,bka->bkt" if beamed else "bta,ba->bt", keys, query
    )
    if base_variant == "luong_scaled":
        scores = scores * params.v
    return scores


def hard_monotonic_attention(
    choose: jnp.ndarray,  # [B, T] hard 0/1 selection decisions
    prev_align: jnp.ndarray,  # [B, T] one-hot previous position (or zeros)
) -> jnp.ndarray:
    """Test-time 'hard' monotonic attention (TF ``mode='hard'``): attend
    the first position j ≥ previous position with choose[j] = 1; all-zero
    attention if the head never chooses (matches TF semantics — the
    context vector is then zero and the head has 'run off the end')."""
    allowed = jnp.cumsum(prev_align, axis=-1)  # 1 at and after prev pos
    candidates = choose * jnp.minimum(allowed, 1.0)
    return candidates * (jnp.cumsum(candidates, axis=-1) == 1.0)


def monotonic_attention(
    p_choose: jnp.ndarray,  # [B, T] selection probabilities
    prev_align: jnp.ndarray,  # [B, T] previous attention distribution
) -> jnp.ndarray:
    """Stable "parallel" monotonic attention recursion (Raffel et al.
    2017; TF ``monotonic_attention(mode='parallel')``):

      α_i[j] = p[j] · Π_{l<j}(1-p[l]) · Σ_{k≤j} α_{i-1}[k] / Π_{l<k+? }…

    computed as p · cumprod₁₋ₚ · cumsum(α_prev / clip(cumprod₁₋ₚ)).
    """
    tiny = 1e-10
    cp = jnp.cumprod(1.0 - p_choose, axis=-1)
    cp_excl = jnp.concatenate(
        [jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1
    )
    q = prev_align / jnp.clip(cp_excl, tiny, 1.0)
    return p_choose * cp_excl * jnp.cumsum(q, axis=-1)


def attention_scores(
    params: AttentionParams,
    variant: str,
    query: jnp.ndarray,  # [B, Q]
    keys: jnp.ndarray,  # [B, T, A]
    mask: jnp.ndarray,  # [B, T] 1 for valid
    *,
    prev_align: Optional[jnp.ndarray] = None,  # monotonic variants only
    sigmoid_noise: float = 0.0,
    noise_rng: Optional[jax.Array] = None,
    monotonic_mode: str = "parallel",  # 'parallel' | 'hard'
    monotonic_bias: float = 0.0,  # decode-time energy bias (calibration)
) -> jnp.ndarray:
    """Attention probabilities [B, T]: masked softmax for the standard
    variants; for ``*_monotonic``, the parallel recursion (training/eval
    default) or hard decisions (``monotonic_mode='hard'``, test time).
    A 3-D query [B, K, Q] (beam axis) yields [B, K, T] against the same
    [B, T, A] keys."""
    monotonic = variant.endswith("_monotonic")
    base = variant[: -len("_monotonic")] if monotonic else variant
    scores = _raw_scores(params, base, query, keys)
    if scores.ndim == 3 and mask.ndim == 2:
        mask = mask[:, None, :]  # broadcast over beams
    if not monotonic:
        scores = jnp.where(mask > 0, scores, _NEG)
        return jax.nn.softmax(scores, axis=-1)
    assert prev_align is not None, "monotonic attention needs prev_align"
    # monotonic_bias shifts the pre-sigmoid selection energies at decode
    # time only — an inference-side calibration knob for the hard mode's
    # attend/skip threshold (a model trained with the soft recursion can
    # sit systematically below the hard 0-threshold; see docs/ACCURACY.md
    # hard-mode calibration)
    scores = scores + params.score_bias + monotonic_bias
    if monotonic_mode == "hard":
        choose = (scores > 0).astype(scores.dtype) * mask
        return hard_monotonic_attention(choose, prev_align)
    if sigmoid_noise > 0.0 and noise_rng is not None:
        scores = scores + sigmoid_noise * jax.random.normal(
            noise_rng, scores.shape, scores.dtype
        )
    p_choose = jax.nn.sigmoid(scores) * mask  # never select padding
    return monotonic_attention(p_choose, prev_align)


def attention_context(probs: jnp.ndarray, memory: jnp.ndarray) -> jnp.ndarray:
    """[B, T] × [B, T, M] → [B, M]; beamed [B, K, T] → [B, K, M] (memory
    is read once per utterance, not once per beam)."""
    if probs.ndim == 3:
        return jnp.einsum("bkt,btm->bkm", probs, memory)
    return jnp.einsum("bt,btm->bm", probs, memory)
