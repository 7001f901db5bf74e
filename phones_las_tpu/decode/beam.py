"""Static-shape vectorized beam search.

Replaces TF's ``BeamSearchDecoder`` + ``tile_batch`` (SURVEY.md §4.3 hot
loop) the TPU way (PAPERS.md arXiv:1811.04568 "Vectorization of
hypotheses and speech for faster beam search"): beams are an explicit
second batch axis ``[B, K]``, every step is one fused jit body, and the
loop runs a static ``max_steps`` with finished-beam masking — no dynamic
trip counts, no host round-trips.

TPU-shaping (this is where the 97 ms → fast path came from, r1 VERDICT
item 3):

  * **memory/keys are never tiled across beams.** Attention takes the
    ``[B, K, Q]`` queries against the shared ``[B, T, A]`` keys and the
    context is one ``bkt,btm->bkm`` einsum — HBM reads of the encoder
    output per step drop K-fold vs the TF ``tile_batch`` translation.
  * **carry reordering is a one-hot matmul**, not a gather:
    ``bkj,bj...->bk...`` einsum against the parent one-hot runs on the
    MXU; ``take_along_axis`` row gathers are serial on TPU.
  * **token histories are not carried through the scan.** The scan emits
    per-step (token, parent) pairs; the best sequences are rebuilt by a
    cheap reverse backtrace scan afterwards, so the hot loop never
    touches a ``[B, K, max_steps]`` buffer.

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
    beam_scores: jnp.ndarray  # [B, K] length-penalty-normalized
    # raw (unnormalized) log probs + finished flags: what external
    # rescorers need — combining another model's raw log prob with the
    # *normalized* score would mix incompatible scales, and a repick
    # must honor the same prefer-finished rule as the in-loop pick
    beam_logp: jnp.ndarray = None  # [B, K]
    beam_finished: jnp.ndarray = None  # [B, K] bool
    # best beam's per-token attention-peak encoder frame (token
    # timestamps — long-form stitching); backtraced like the tokens
    peaks: jnp.ndarray = None  # [B, max_steps] int32


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
    lm_logp: jnp.ndarray = None,  # [V,V] or [V,V,V] n-gram table (decode.lm)
    lm_weight: float = 0.0,
    ctc_logp: jnp.ndarray = None,  # [B, Tenc, V] log-softmax CTC head for
    # ONE-PASS joint decoding (Watanabe-style prefix scores in the loop)
    ctc_alpha: float = 0.7,  # step score = α·attn + (1−α)·Δψ_ctc
) -> BeamResult:
    b, t_enc, m = memory.shape
    k = beam_width
    v = cfg.vocab_size
    joint = ctc_logp is not None and ctc_alpha < 1.0

    keys = precompute_keys(params.attention, memory)  # [B, T, A], not tiled

    # carry is [B, K, ...] throughout (beam axis explicit)
    carry0 = jax.tree.map(
        lambda x: x.reshape(b, k, *x.shape[1:]),
        init_speller_carry(cfg, b * k, t_enc, memory.dtype),
    )
    # beam 0 active, others -inf so step 1 spreads over distinct tokens
    logp0 = jnp.tile(jnp.array([0.0] + [_NEG] * (k - 1), jnp.float32), (b, 1))
    fin0 = jnp.zeros((b, k), bool)
    len0 = jnp.zeros((b, k), jnp.int32)
    prev0 = jnp.full((b, k), cfg.bos_id, jnp.int32)
    prev2_0 = jnp.full((b, k), cfg.bos_id, jnp.int32)  # trigram-LM context
    # finished-beam continuation row: <eos> at logp 0, rest impossible
    eos_row = jnp.full((v,), _NEG, jnp.float32).at[cfg.eos_id].set(0.0)
    use_lm = lm_logp is not None and lm_weight != 0.0
    if joint:
        from phones_las_tpu.decode.ctc import (
            ctc_prefix_init,
            ctc_prefix_scores,
            ctc_prefix_update,
        )

        ctc_lp = ctc_logp.astype(jnp.float32)
        ctc_pexp = jnp.exp(ctc_lp)
        ctc_state0 = ctc_prefix_init(ctc_lp, enc_mask, k)
    else:
        ctc_state0 = None

    def step(state, _):
        carry, logp, finished, lengths, prev, prev2, cstate = state
        emb = embed_tokens(params, cfg, prev)  # [B, K, E]
        carry, logits, extras = speller_step(
            params, cfg, carry, emb, keys, memory, enc_mask
        )
        peak = jnp.argmax(extras["probs"], axis=-1).astype(jnp.int32)  # [B, K]
        step_logp = jax.nn.log_softmax(logits, axis=-1)  # [B, K, V]
        step_logp = jnp.where(finished[..., None], eos_row, step_logp)

        if joint:
            psi_mat = ctc_prefix_scores(
                cstate, ctc_lp, ctc_pexp, enc_mask, prev,
                cfg.eos_id, cfg.bos_id,
            )  # [B, K, V]
            delta = psi_mat - cstate.psi[..., None]
            step_logp = ctc_alpha * step_logp + (1.0 - ctc_alpha) * jnp.where(
                finished[..., None], 0.0, delta
            )
        if use_lm:
            # shallow fusion OUTSIDE the joint α-mix — the standard hybrid
            # CTC/attention score is α·att + (1−α)·ctc + λ·lm (Watanabe
            # et al. 2017 eq. 14), not α·(att + λ·lm) + (1−α)·ctc; mixing
            # inside would silently rescale λ by α. Masked for finished
            # beams so their frozen <eos> continuation stays at logp 0.
            from phones_las_tpu.decode.lm import lm_step_scores

            lm_term = lm_weight * lm_step_scores(lm_logp, prev, prev2)
            step_logp = step_logp + jnp.where(
                finished[..., None], 0.0, lm_term
            )

        total = logp[..., None] + step_logp  # [B, K, V]
        new_logp, flat_idx = jax.lax.top_k(total.reshape(b, k * v), k)
        parent = (flat_idx // v).astype(jnp.int32)  # [B, K]
        tok = (flat_idx % v).astype(jnp.int32)

        # reorder the carry by parent beam with a one-hot matmul (MXU)
        onehot = jax.nn.one_hot(parent, k, dtype=memory.dtype)  # [B, Knew, Kold]
        carry = jax.tree.map(
            lambda x: jnp.einsum("bkj,bj...->bk...", onehot, x), carry
        )
        parent_fin = jnp.take_along_axis(finished, parent, axis=1)
        parent_len = jnp.take_along_axis(lengths, parent, axis=1)
        new_fin = parent_fin | (tok == cfg.eos_id)
        new_len = parent_len + jnp.where(new_fin, 0, 1)
        # the step's attention peak belongs to the *parent* beam's step
        step_peak = jnp.take_along_axis(peak, parent, axis=1)
        # the new beam's previous-previous token = its parent's last token
        new_prev2 = jnp.take_along_axis(prev, parent, axis=1)
        if joint:
            # reorder the prefix-DP state by parent (f32 one-hot — the
            # carry einsum above may run in the memory dtype) and advance
            # it for the chosen extensions
            oh32 = onehot.astype(jnp.float32)
            from phones_las_tpu.decode.ctc import CTCPrefixState

            cparent = CTCPrefixState(
                lrn=jnp.einsum("bkj,bjt->bkt", oh32, cstate.lrn),
                lrb=jnp.einsum("bkj,bjt->bkt", oh32, cstate.lrb),
                psi=jnp.take_along_axis(cstate.psi, parent, axis=1),
            )
            new_cstate = ctc_prefix_update(
                cparent, psi_mat.reshape(b, k * v), flat_idx, tok,
                new_prev2, new_fin, ctc_lp, enc_mask,
            )
        else:
            new_cstate = None
        return (
            (carry, new_logp, new_fin, new_len, tok, new_prev2, new_cstate),
            (tok, parent, step_peak),
        )

    state0 = (carry0, logp0, fin0, len0, prev0, prev2_0, ctc_state0)
    (_, logp, finished, lengths, _, _, _), (toks_s, parents_s, peaks_s) = jax.lax.scan(
        step, state0, None, length=max_steps
    )

    # backtrace: rebuild [B, K, S] token histories (and attention peaks)
    # from per-step (token, parent) pairs — S tiny [B, K] gathers,
    # outside the hot loop
    def btrace(idx, xs):
        tok, parent, pk = xs
        out = jnp.take_along_axis(tok, idx, axis=1)
        out_pk = jnp.take_along_axis(pk, idx, axis=1)
        return jnp.take_along_axis(parent, idx, axis=1), (out, out_pk)

    idx0 = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :], (b, k))
    _, (rebuilt, rebuilt_pk) = jax.lax.scan(
        btrace, idx0, (toks_s, parents_s, peaks_s), reverse=True
    )
    tokens = jnp.transpose(rebuilt, (1, 2, 0))  # [B, K, S]
    peaks = jnp.transpose(rebuilt_pk, (1, 2, 0))  # [B, K, S]

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
        beam_logp=logp,
        beam_finished=finished,
        peaks=take(peaks),
    )
