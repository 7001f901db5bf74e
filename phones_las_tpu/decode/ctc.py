"""CTC greedy decoding for the encoder CTC head (joint CTC-attention
training, ``LASConfig.ctc_weight``).

The attention decoder stays the primary inference path; CTC decode is
the standard diagnostic/secondary hypothesis — frame-synchronous, so it
needs no decode loop at all: one argmax over the head's logits, then a
host-side collapse (merge repeats, drop blanks).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1.0e9


def ctc_frame_ids(params, memory: jnp.ndarray, enc_mask: jnp.ndarray):
    """Jit-friendly device half: per-frame argmax ids, blanked at pad.

    → ids [B, T'] int32 (pad frames forced to blank 0).
    """
    logits = memory @ params.ctc_w + params.ctc_b
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(enc_mask > 0, ids, 0)


def rescore_beams(
    ctc_logits: jnp.ndarray,  # [B, T', V] encoder CTC head logits
    enc_mask: jnp.ndarray,  # [B, T']
    beam_tokens: jnp.ndarray,  # [B, K, S] <eos>-padded hypotheses
    beam_lengths: jnp.ndarray,  # [B, K] token counts excluding <eos>
    beam_logp: jnp.ndarray,  # [B, K] RAW attention log probs
    alpha: float = 0.7,
    *,
    beam_finished: jnp.ndarray = None,  # [B, K] bool
    length_penalty: float = 0.0,
):
    """Two-pass joint decoding: rescore the beam's K hypotheses with the
    CTC head and repick (score = α·logP_att + (1−α)·logP_ctc — the
    hypothesis-rescoring form of Watanabe-style joint decoding; one
    batched CTC forward per beam, no per-step prefix DP).

    Both terms are RAW sequence log probs (same scale); the length
    penalty divides the *combined* score, mirroring the in-loop pick.
    With ``beam_finished``, the repick also mirrors the beam's
    prefer-finished rule — otherwise a hypothesis truncated at the step
    cap (never emitted <eos>) could out-score every finished one.

    → (best_idx [B], combined [B, K]). Hypotheses whose CTC score is
    −inf (unreachable under CTC, e.g. longer than the encoder frames)
    keep their attention-only rank via a large negative floor.
    """
    import optax

    from phones_las_tpu.decode.beam import _length_penalty

    b, k, s = beam_tokens.shape
    logit_pad = 1.0 - enc_mask.astype(jnp.float32)
    pos = jnp.arange(s)[None, :]

    def per_beam(labels, lab_lens):  # [B, S], [B]
        label_pad = (pos >= lab_lens[:, None]).astype(jnp.float32)
        loss = optax.ctc_loss(
            ctc_logits.astype(jnp.float32), logit_pad,
            # an all-padded row (empty hypothesis) still needs one valid
            # label slot for the DP; mask keeps its score out anyway
            jnp.where(label_pad > 0, 0, labels), label_pad, blank_id=0,
        )
        return -loss  # log prob

    ctc_logp = jax.vmap(per_beam, in_axes=(1, 1), out_axes=1)(
        beam_tokens, jnp.maximum(beam_lengths, 1)
    )  # [B, K]
    # empty hypotheses: the length clamp above scored the <eos> pad as a
    # real CTC label, which would floor a legitimately-empty best beam
    # near −1e7 on silent audio. The empty sequence has an EXACT CTC
    # score — the all-blank path, Σ_t log p_t(blank) — so use it.
    lp_blank = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), -1)[:, :, 0]
    empty_logp = jnp.sum(lp_blank * enc_mask.astype(jnp.float32), axis=-1)
    ctc_logp = jnp.where(beam_lengths == 0, empty_logp[:, None], ctc_logp)
    ctc_logp = jnp.maximum(ctc_logp, -1e7)
    combined = alpha * beam_logp + (1.0 - alpha) * ctc_logp
    combined = combined / _length_penalty(beam_lengths, length_penalty)
    if beam_finished is not None:
        any_fin = jnp.any(beam_finished, axis=1, keepdims=True)
        combined = jnp.where(any_fin & ~beam_finished, _NEG, combined)
    return jnp.argmax(combined, axis=1), combined


# ---------------------------------------------------------------------------
# One-pass joint decoding: CTC prefix scores inside the beam loop
# (Watanabe et al. 2017, "Hybrid CTC/Attention Architecture", Algorithm 2),
# reshaped for TPU: the per-candidate score is one MXU einsum + logsumexp
# reduction over frames, and the per-step DP update is two *associative*
# scans over frames (log-depth) instead of the sequential frame loop the
# CPU/GPU implementations use. All state is static-shape [B, K, T'+1].
#
# Conventions: lp = log-softmax CTC head output [B, T', V], blank = id 0
# (the pad id, which the attention decoder never emits); state arrays have
# T'+1 slots, slot t meaning "after consuming frame t" (slot 0 = before any
# frame). Padded frames are identity in the DP and excluded from score
# reductions, so slot T' always holds the value at the true encoder length.
# ---------------------------------------------------------------------------


class CTCPrefixState(NamedTuple):
    """Per-beam CTC prefix-DP state for hypotheses g.

    lrn[b,k,t] = log P(CTC path emits exactly g within frames ≤ t, path
    ends in the last symbol of g (non-blank)); lrb likewise but path ends
    in blank; psi[b,k] = log CTC prefix probability of g (score already
    banked into the beam's accumulated joint score).
    """

    lrn: jnp.ndarray  # [B, K, T'+1] f32
    lrb: jnp.ndarray  # [B, K, T'+1] f32
    psi: jnp.ndarray  # [B, K] f32


def _affine_log_scan(la: jnp.ndarray, lb: jnp.ndarray) -> jnp.ndarray:
    """Cumulative x_t = a_t·x_{t-1} + b_t in log space along the last axis,
    for x_0 = 0 (log −inf): returns log x_t = the composed b term.

    (la, lb) compose associatively: (a1,b1)∘(a2,b2) = (a1a2, a2·b1+b2),
    so the whole recurrence is one ``lax.associative_scan`` (log depth on
    TPU vs the T-step sequential loop of the textbook algorithm).
    """

    def combine(first, second):
        la1, lb1 = first
        la2, lb2 = second
        return la1 + la2, jnp.logaddexp(lb1 + la2, lb2)

    _, out = jax.lax.associative_scan(combine, (la, lb), axis=-1)
    return out


def ctc_prefix_init(
    lp: jnp.ndarray, valid: jnp.ndarray, beam_width: int
) -> CTCPrefixState:
    """State for the empty prefix ∅, tiled over K beams.

    lp: [B, T', V] log-softmax CTC head; valid: [B, T'] frame mask.
    r^b_t(∅) = Π_{τ≤t} p_τ(blank); r^n_t(∅) = 0; ψ(∅) = 1.
    """
    b, t, _ = lp.shape
    lpb = jnp.where(valid > 0, lp[:, :, 0], 0.0)  # pad frames: identity
    lrb = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.float32), jnp.cumsum(lpb, axis=-1)], axis=-1
    )
    lrb = jnp.broadcast_to(lrb[:, None, :], (b, beam_width, t + 1))
    lrn = jnp.full((b, beam_width, t + 1), _NEG, jnp.float32)
    psi = jnp.zeros((b, beam_width), jnp.float32)
    return CTCPrefixState(lrn=lrn, lrb=lrb, psi=psi)


def ctc_prefix_scores(
    state: CTCPrefixState,
    lp: jnp.ndarray,  # [B, T', V] log-softmax CTC head
    pexp: jnp.ndarray,  # [B, T', V] = exp(lp), precomputed once per decode
    valid: jnp.ndarray,  # [B, T'] frame mask
    prev: jnp.ndarray,  # [B, K] last token of each hypothesis (bos at ∅)
    eos_id: int,
    bos_id: int,
) -> jnp.ndarray:
    """log CTC prefix probability ψ(g·c) for ALL candidate tokens c.

    → [B, K, V]; column eos = the complete-sequence CTC score of g,
    columns blank/bos = −1e9 (not extendable under CTC).
    """
    b, k, _ = state.lrn.shape
    v = lp.shape[-1]
    lrn_p, lrb_p = state.lrn[..., :-1], state.lrb[..., :-1]  # value at t−1
    vmask = (valid > 0)[:, None, :]  # [B, 1, T']

    # generic column (c ≠ last(g)): Φ_t = r^b_{t−1} + r^n_{t−1}; the
    # t-reduction ψ(c) = Σ_t Φ_t·p_t(c) is an MXU einsum in prob space
    # with a per-beam max shift for stability.
    lphi = jnp.logaddexp(lrb_p, lrn_p)  # [B, K, T']
    lphi = jnp.where(vmask, lphi, _NEG)
    m = jnp.maximum(jnp.max(lphi, axis=-1, keepdims=True), _NEG)  # [B, K, 1]
    phi = jnp.exp(lphi - m)
    psi_all = m + jnp.log(
        jnp.maximum(jnp.einsum("bkt,btv->bkv", phi, pexp), 1e-38)
    )

    # repeat column (c == last(g)): Φ_t = r^b_{t−1} only (a repeated label
    # must cross a blank under CTC)
    prev_oh = jax.nn.one_hot(prev, v, dtype=jnp.float32)  # [B, K, V]
    lp_prev = jnp.einsum("bkv,btv->bkt", prev_oh, lp)
    psi_rep = jax.nn.logsumexp(
        jnp.where(vmask, lrb_p + lp_prev, _NEG), axis=-1
    )  # [B, K]

    psi = jnp.where(prev_oh > 0, psi_rep[..., None], psi_all)
    # eos: ψ = full-sequence CTC probability of g itself
    psi_eos = jnp.logaddexp(state.lrn[..., -1], state.lrb[..., -1])
    psi = psi.at[..., eos_id].set(psi_eos)
    psi = psi.at[..., 0].set(_NEG)  # blank/pad is not a label
    psi = psi.at[..., bos_id].set(_NEG)
    return jnp.maximum(psi, _NEG)


def ctc_prefix_update(
    state: CTCPrefixState,  # parent-gathered states of g
    psi_flat: jnp.ndarray,  # [B, K*V] this step's ψ matrix, flattened
    flat_idx: jnp.ndarray,  # [B, K] top-k picks into psi_flat
    tok: jnp.ndarray,  # [B, K] chosen tokens c
    parent_prev: jnp.ndarray,  # [B, K] last token of the parent hypothesis
    frozen: jnp.ndarray,  # [B, K] bool: keep parent state (finished beams)
    lp: jnp.ndarray,  # [B, T', V]
    valid: jnp.ndarray,  # [B, T']
) -> CTCPrefixState:
    """Advance the prefix DP to g·c for the chosen extensions.

    r^n_t(g·c) = (r^n_{t−1}(g·c) + Φ_t)·p_t(c) and
    r^b_t(g·c) = (r^b_{t−1}(g·c) + r^n_{t−1}(g·c))·p_t(blank) are affine
    recurrences along t → two log-depth associative scans.
    """
    b, k, _ = state.lrn.shape
    v = lp.shape[-1]
    vmask = (valid > 0)[:, None, :]
    lrn_p, lrb_p = state.lrn[..., :-1], state.lrb[..., :-1]

    tok_oh = jax.nn.one_hot(tok, v, dtype=jnp.float32)
    lp_tok = jnp.einsum("bkv,btv->bkt", tok_oh, lp)  # [B, K, T']
    rep = (tok == parent_prev)[..., None]  # [B, K, 1]
    lphi = jnp.where(rep, lrb_p, jnp.logaddexp(lrb_p, lrn_p))

    # r^n scan (x_0 = 0): a_t = p_t(c), b_t = Φ_t·p_t(c); pad → identity
    la = jnp.where(vmask, lp_tok, 0.0)
    lb = jnp.where(vmask, lphi + lp_tok, _NEG)
    lrn_new = _affine_log_scan(la, lb)  # [B, K, T'] = value at t
    lrn_full = jnp.concatenate(
        [jnp.full((b, k, 1), _NEG, jnp.float32), lrn_new], axis=-1
    )

    # r^b scan (x_0 = 0): a_t = p_t(blank), b_t = r^n_{t−1}(g·c)·p_t(blank)
    lpb = jnp.broadcast_to(lp[:, None, :, 0], lrn_new.shape)
    la_b = jnp.where(vmask, lpb, 0.0)
    lb_b = jnp.where(vmask, lrn_full[..., :-1] + lpb, _NEG)
    lrb_new = _affine_log_scan(la_b, lb_b)
    lrb_full = jnp.concatenate(
        [jnp.full((b, k, 1), _NEG, jnp.float32), lrb_new], axis=-1
    )

    psi_new = jnp.take_along_axis(psi_flat, flat_idx, axis=1)  # [B, K]
    keep = frozen[..., None]
    return CTCPrefixState(
        lrn=jnp.where(keep, state.lrn, jnp.maximum(lrn_full, _NEG)),
        lrb=jnp.where(keep, state.lrb, jnp.maximum(lrb_full, _NEG)),
        psi=jnp.where(frozen, state.psi, psi_new),
    )


def collapse(ids: np.ndarray, lengths: np.ndarray, blank: int = 0) -> List[List[int]]:
    """Host half: merge consecutive repeats, drop blanks."""
    out = []
    ids = np.asarray(ids)
    for b in range(ids.shape[0]):
        row, prev, seq = ids[b, : int(lengths[b])], blank, []
        for t in row:
            t = int(t)
            if t != prev and t != blank:
                seq.append(t)
            prev = t
        out.append(seq)
    return out
