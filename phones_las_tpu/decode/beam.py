"""Static-shape vectorized beam search.

Replaces TF's ``BeamSearchDecoder`` + ``tile_batch`` (SURVEY.md §4.3 hot
loop) the TPU way (PAPERS.md arXiv:1811.04568 "Vectorization of
hypotheses and speech for faster beam search"): beams are a second batch
axis, every step is one fused jit body over ``[B·K]`` rows, and the loop
runs a static ``max_steps`` with finished-beam masking — no dynamic trip
counts, no host round-trips.

Semantics: log-softmax accumulation; a finished beam only extends with
<eos> at probability 1 (score frozen); Google-NMT length penalty
``((5+len)/6)^α`` (TF's ``length_penalty_weight``, default 0 = off);
final pick prefers finished beams when any exist.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from phones_las_tpu.models.speller import (
    SpellerConfig,
    SpellerParams,
    embed_tokens,
    init_speller_carry,
    speller_step,
)
from phones_las_tpu.ops.attention import precompute_keys

_NEG = -1e9


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_steps] best beam, <eos>-padded
    lengths: jnp.ndarray  # [B] token count excluding <eos>
    scores: jnp.ndarray  # [B] length-normalized log prob of the best beam
    beam_tokens: jnp.ndarray  # [B, K, max_steps]
    beam_lengths: jnp.ndarray  # [B, K]
    beam_scores: jnp.ndarray  # [B, K]


def _length_penalty(lengths: jnp.ndarray, alpha: float) -> jnp.ndarray:
    if alpha == 0.0:
        return jnp.ones_like(lengths, jnp.float32)
    return jnp.power((5.0 + lengths.astype(jnp.float32)) / 6.0, alpha)


def beam_decode(
    params: SpellerParams,
    cfg: SpellerConfig,
    memory: jnp.ndarray,  # [B, Tenc, M]
    enc_mask: jnp.ndarray,  # [B, Tenc]
    max_steps: int,
    beam_width: int = 8,
    length_penalty: float = 0.0,
) -> BeamResult:
    b, t_enc, m = memory.shape
    k = beam_width
    v = cfg.vocab_size

    def tile(x):  # [B, ...] → [B*K, ...]
        return jnp.repeat(x, k, axis=0)

    memory_bk = tile(memory)
    mask_bk = tile(enc_mask)
    keys_bk = precompute_keys(params.attention, memory_bk)

    carry0 = init_speller_carry(cfg, b * k, t_enc, memory.dtype)
    tokens0 = jnp.full((b, k, max_steps), cfg.eos_id, jnp.int32)
    # beam 0 active, others -inf so step 1 spreads over distinct tokens
    logp0 = jnp.tile(jnp.array([0.0] + [_NEG] * (k - 1), jnp.float32), (b, 1))
    fin0 = jnp.zeros((b, k), bool)
    len0 = jnp.zeros((b, k), jnp.int32)
    prev0 = jnp.full((b, k), cfg.bos_id, jnp.int32)

    def step(state, i):
        carry, tokens, logp, finished, lengths, prev = state
        emb = embed_tokens(params, cfg, prev.reshape(b * k))
        carry, logits, _ = speller_step(
            params, cfg, carry, emb, keys_bk, memory_bk, mask_bk
        )
        step_logp = jax.nn.log_softmax(logits.reshape(b, k, v), axis=-1)
        # finished beams: only <eos> continuation, at logp 0 (score frozen)
        eos_row = jnp.full((v,), _NEG, jnp.float32).at[cfg.eos_id].set(0.0)
        step_logp = jnp.where(finished[..., None], eos_row, step_logp)

        total = logp[..., None] + step_logp  # [B, K, V]
        new_logp, flat_idx = jax.lax.top_k(total.reshape(b, k * v), k)
        parent = flat_idx // v  # [B, K]
        tok = (flat_idx % v).astype(jnp.int32)

        def gather_beams(x):
            # x: [B*K, ...] → parent-gathered [B*K, ...]
            xk = x.reshape(b, k, *x.shape[1:])
            idx = parent.reshape(b, k, *([1] * (x.ndim - 1)))
            return jnp.take_along_axis(xk, idx, axis=1).reshape(x.shape)

        carry = jax.tree.map(gather_beams, carry)
        tokens = jnp.take_along_axis(tokens, parent[..., None], axis=1)
        tokens = tokens.at[:, :, i].set(tok)
        parent_fin = jnp.take_along_axis(finished, parent, axis=1)
        parent_len = jnp.take_along_axis(lengths, parent, axis=1)
        new_fin = parent_fin | (tok == cfg.eos_id)
        new_len = parent_len + jnp.where(parent_fin | (tok == cfg.eos_id), 0, 1)
        return (carry, tokens, new_logp, new_fin, new_len, tok), None

    state0 = (carry0, tokens0, logp0, fin0, len0, prev0)
    (_, tokens, logp, finished, lengths, _), _ = jax.lax.scan(
        step, state0, jnp.arange(max_steps)
    )

    scores = logp / _length_penalty(lengths, length_penalty)
    any_fin = jnp.any(finished, axis=1, keepdims=True)
    pick_scores = jnp.where(any_fin & ~finished, _NEG, scores)
    best = jnp.argmax(pick_scores, axis=1)  # [B]
    take = lambda x: jnp.take_along_axis(
        x, best.reshape(b, *([1] * (x.ndim - 1))), axis=1
    )[:, 0]
    return BeamResult(
        tokens=take(tokens),
        lengths=take(lengths),
        scores=take(pick_scores),
        beam_tokens=tokens,
        beam_lengths=lengths,
        beam_scores=scores,
    )
