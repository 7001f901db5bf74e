"""CTC greedy decoding for the encoder CTC head (joint CTC-attention
training, ``LASConfig.ctc_weight``).

The attention decoder stays the primary inference path; CTC decode is
the standard diagnostic/secondary hypothesis — frame-synchronous, so it
needs no decode loop at all: one argmax over the head's logits, then a
host-side collapse (merge repeats, drop blanks).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np


def ctc_frame_ids(params, memory: jnp.ndarray, enc_mask: jnp.ndarray):
    """Jit-friendly device half: per-frame argmax ids, blanked at pad.

    → ids [B, T'] int32 (pad frames forced to blank 0).
    """
    logits = memory @ params.ctc_w + params.ctc_b
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(enc_mask > 0, ids, 0)


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
