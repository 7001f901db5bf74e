"""N-gram language model for shallow-fusion beam decoding.

Beyond-parity decode feature (the reference's BeamSearchDecoder is
acoustic-only — SURVEY.md §4.3): a token-level n-gram LM trained on the
corpus transcripts, fused into the beam's per-step scores as
``log P_am + λ·log P_lm`` (standard shallow fusion). TPU-shaped: the LM
is a dense log-prob table (``[V,V]`` bigram or ``[V,V,V]`` trigram, at
phone/char vocab sizes a few KB–MB), so the per-step lookup inside the
jitted beam scan is one static gather — no tries, no host callbacks.

Smoothing is Jelinek-Mercer interpolation down to an add-k unigram:
``P(w|h) = λ·ML(w|h) + (1−λ)·P_lower(w)`` — simple, monotone, and every
row is a proper distribution (exactly what score fusion needs; the gains
of fancier discounting are negligible at these vocab sizes).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def fit_ngram_lm(
    sequences: Sequence[np.ndarray],
    vocab_size: int,
    bos_id: int,
    eos_id: int,
    order: int = 2,
    interp: float = 0.8,
    add_k: float = 0.5,
) -> np.ndarray:
    """Count-based interpolated n-gram over token sequences.

    Each sequence is the raw target ids WITHOUT bos/eos; the fit appends
    ``eos_id`` and uses ``bos_id`` as the left context, matching how the
    beam consumes the table (context starts at <sos>, beams are scored
    for ending). → log-prob table ``[V,V]`` (order 2, row = previous
    token) or ``[V,V,V]`` (order 3, indexed ``[prev2, prev1]``).
    """
    assert order in (2, 3), order
    v = vocab_size
    uni = np.full((v,), add_k, np.float64)
    big = np.zeros((v, v), np.float64)
    tri = np.zeros((v, v, v), np.float64) if order == 3 else None
    for seq in sequences:
        toks = [int(t) for t in seq] + [eos_id]
        ctx2, ctx1 = bos_id, bos_id  # (prev2, prev1)
        for w in toks:
            uni[w] += 1.0
            big[ctx1, w] += 1.0
            if tri is not None:
                tri[ctx2, ctx1, w] += 1.0
            ctx2, ctx1 = ctx1, w
    p_uni = uni / uni.sum()
    row = big.sum(axis=-1, keepdims=True)
    ml_big = np.divide(big, row, out=np.zeros_like(big), where=row > 0)
    # unseen contexts fall all the way back to the unigram
    lam_b = np.where(row > 0, interp, 0.0)
    p_big = lam_b * ml_big + (1.0 - lam_b) * p_uni[None, :]
    if order == 2:
        return np.log(p_big).astype(np.float32)
    rows3 = tri.sum(axis=-1, keepdims=True)
    ml_tri = np.divide(tri, rows3, out=np.zeros_like(tri), where=rows3 > 0)
    lam_t = np.where(rows3 > 0, interp, 0.0)
    p_tri = lam_t * ml_tri + (1.0 - lam_t) * p_big[None, :, :]
    return np.log(p_tri).astype(np.float32)


def save_lm(path: str, logp: np.ndarray, vocab_tokens: Optional[List[str]] = None):
    np.savez_compressed(
        path,
        logp=logp,
        order=np.int32(logp.ndim),
        vocab=np.asarray(vocab_tokens if vocab_tokens is not None else [], object),
    )


def load_lm(path: str) -> np.ndarray:
    with np.load(path, allow_pickle=True) as z:
        logp = z["logp"].astype(np.float32)
    assert logp.ndim in (2, 3), logp.shape
    return logp


def lm_step_scores(logp, prev1, prev2):
    """Per-step LM row for the beam: [B, K] contexts → [B, K, V].

    Implemented as a one-hot MXU matmul over the flattened context axis
    rather than a row gather — the same trick the beam uses for carry
    reordering (row gathers serialize on TPU). Measured on v5e at
    B=64/K=8/V=34, 200-step beam batch: trigram fusion overhead
    2.8 → 0.7 ms (luong_scaled 17.2 → 17.9 ms fused) vs the gather.
    Very large context spaces fall back to the gather (the [B,K,C]
    one-hot itself would dominate HBM traffic past C ≈ 8k).
    """
    import jax
    import jax.numpy as jnp

    v = logp.shape[-1]
    if logp.ndim == 2:
        ctx, n_ctx = prev1, v
    else:
        ctx, n_ctx = prev2 * v + prev1, v * v
    if n_ctx > 8192:
        return logp[prev1] if logp.ndim == 2 else logp[prev2, prev1]
    onehot = jax.nn.one_hot(ctx, n_ctx, dtype=logp.dtype)  # [B, K, C]
    return jnp.einsum("bkc,cv->bkv", onehot, logp.reshape(n_ctx, v))
