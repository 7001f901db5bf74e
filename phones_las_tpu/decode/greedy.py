"""Greedy decoding as one jit-compiled ``lax.scan``.

Matches TF ``GreedyEmbeddingHelper`` + ``dynamic_decode`` semantics
(SURVEY.md §4.2): start from <sos>, feed back the argmax token, stop a row
once it emits <eos>; the loop itself always runs ``max_steps`` (static
shape — finished rows keep emitting <eos> and stop counting). The whole
step (embedding, LSTM stack, attention, projection, argmax) is one fused
scan body, so per-step dispatch overhead — the reference's decode
bottleneck (SURVEY.md §7 hard parts) — is gone.
"""

from __future__ import annotations

from typing import Optional, Tuple

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


def greedy_decode(
    params: SpellerParams,
    cfg: SpellerConfig,
    memory: jnp.ndarray,  # [B, Tenc, M]
    enc_mask: jnp.ndarray,  # [B, Tenc]
    max_steps: int,
    *,
    return_alignments: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """→ (tokens [B, max_steps] (<eos>-padded), lengths [B] excluding
    <eos>, alignments [B, max_steps, Tenc] or None).

    Deliberately a fixed-trip ``scan``: an early-exit ``while_loop`` was
    measured token-identical but no faster (per-iteration condition
    overhead cancels the skipped steps; docs/PERF.md), so the simpler
    constant-shape loop stays.
    """
    b = memory.shape[0]
    keys = precompute_keys(params.attention, memory)
    carry0 = init_speller_carry(cfg, b, memory.shape[1], memory.dtype)
    tok0 = jnp.full((b,), cfg.bos_id, jnp.int32)
    fin0 = jnp.zeros((b,), bool)

    def step(loop_carry, _):
        carry, token, finished = loop_carry
        emb = embed_tokens(params, cfg, token)
        carry, logits, extras = speller_step(
            params, cfg, carry, emb, keys, memory, enc_mask
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, cfg.eos_id, nxt)
        new_finished = finished | (nxt == cfg.eos_id)
        out = (nxt, extras["probs"] if return_alignments else jnp.zeros((b, 0)))
        return (carry, nxt, new_finished), out

    (_, _, _), (tokens_tm, probs_tm) = jax.lax.scan(
        step, (carry0, tok0, fin0), None, length=max_steps
    )
    tokens = jnp.transpose(tokens_tm, (1, 0))  # [B, S]
    lengths = jnp.sum((jnp.cumsum(tokens == cfg.eos_id, axis=1) == 0), axis=1)
    aligns = jnp.transpose(probs_tm, (1, 0, 2)) if return_alignments else None
    return tokens, lengths.astype(jnp.int32), aligns
