"""CTC greedy decoding for the encoder CTC head (joint CTC-attention
training, ``LASConfig.ctc_weight``).

The attention decoder stays the primary inference path; CTC decode is
the standard diagnostic/secondary hypothesis — frame-synchronous, so it
needs no decode loop at all: one argmax over the head's logits, then a
host-side collapse (merge repeats, drop blanks).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


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
    beam_scores: jnp.ndarray,  # [B, K] attention log probs
    alpha: float = 0.7,
):
    """Two-pass joint decoding: rescore the beam's K hypotheses with the
    CTC head and repick (score = α·logP_att + (1−α)·logP_ctc — the
    hypothesis-rescoring form of Watanabe-style joint decoding; one
    batched CTC forward per beam, no per-step prefix DP).

    → (best_idx [B], combined [B, K]). Hypotheses whose CTC score is
    −inf (unreachable under CTC, e.g. longer than the encoder frames)
    keep their attention-only rank via a large negative floor.
    """
    import optax

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
    ctc_logp = jnp.maximum(ctc_logp, -1e7)
    combined = alpha * beam_scores + (1.0 - alpha) * ctc_logp
    return jnp.argmax(combined, axis=1), combined


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
