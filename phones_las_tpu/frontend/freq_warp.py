"""VTLP-style frequency-axis warping (Jaitly & Hinton 2013).

Beyond-parity train-time augmentation (the reference has none — SURVEY
§6 lists no augmentation subsystem): each utterance's log-mel channels
are resampled along the frequency axis by a random per-utterance warp
factor α ~ U[1−W, 1+W], approximating a vocal-tract-length change.
This targets the measured long-form per-speaker residual
(docs/ACCURACY.md round 5: systematic vowel substitutions under a
single fixed speaker draw — the synthesizer itself draws a per-speaker
VTLN factor in [0.85, 1.18], data/speechlike.py), which per-stream
CMVN measurably cannot fix: formant positions are a spectral-axis
effect, not a channel statistic.

TPU-native shape: a per-row piecewise-linear gather along the last
axis — static shapes, no host work, O(B·T·F) VPU work inside the
jitted train step. Applied after CMVN next to SpecAugment
(models/las.py::encode), sharing its convention that the Δ/ΔΔ blocks
get the identical channel map (frequency warping is a linear map on
the channel axis applied at every frame, so it commutes with the
time-difference that produces the deltas — warping after is exactly
warping before).

Only meaningful for ``feature_type='logmel'``: warping DCT-domain MFCC
coefficients is not a spectral warp (encode() rejects that combination
at trace time).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# knee of the piecewise-linear map, as a fraction of the top channel:
# channels below the knee warp with slope 1/α, the remainder re-anchors
# to keep the endpoints fixed (Jaitly & Hinton use a boundary frequency
# below Nyquist for the same reason — the band edges carry window/
# filterbank artifacts that should not move).
_KNEE = 0.85


def warp_positions(alpha: jnp.ndarray, num_bins: int) -> jnp.ndarray:
    """Source positions [B, num_bins] for per-row warp factors α [B].

    Monotone piecewise-linear map p with p(0) = 0 and
    p(num_bins−1) = num_bins−1 (band edges fixed), and p(j) = j/α below
    the knee — so spectral content at source channel s appears at output
    channel α·s: α > 1 shifts formants up (shorter vocal tract),
    α < 1 down. α = 1 is the identity map exactly.
    """
    alpha = jnp.asarray(alpha, jnp.float32)[:, None]  # [B, 1]
    top = float(num_bins - 1)
    j = jnp.arange(num_bins, dtype=jnp.float32)[None, :]  # [1, F]
    # knee in OUTPUT space; g/α ≤ _KNEE·top ≤ top for every α ≥ _KNEE·
    # min(α,1)/min(α,1) — i.e. the lower segment never leaves the band
    g = _KNEE * top * jnp.minimum(alpha, 1.0)
    p_lo = j / alpha
    # upper segment: line from (g, g/α) to (top, top)
    rest = jnp.maximum(top - g, 1e-6)
    p_hi = g / alpha + (j - g) * (top - g / alpha) / rest
    return jnp.where(j <= g, p_lo, p_hi)


def apply_freq_warp(
    rng,
    feats: jnp.ndarray,  # [B, T, D], D = n_blocks × bins (fbank ‖ Δ ‖ ΔΔ)
    max_warp: float,  # W: α ~ U[1−W, 1+W] per utterance
    bins_per_block: int,
) -> jnp.ndarray:
    """Resample every Δ block's channel axis by a shared per-row warp."""
    b, t, d = feats.shape
    assert d % bins_per_block == 0, (d, bins_per_block)
    n_blocks = d // bins_per_block
    alpha = jax.random.uniform(
        rng, (b,), minval=1.0 - max_warp, maxval=1.0 + max_warp
    )
    pos = warp_positions(alpha, bins_per_block)  # [B, bins]
    lo = jnp.clip(jnp.floor(pos), 0.0, bins_per_block - 1.0)
    w = (pos - lo)[:, None, None, :]  # [B, 1, 1, bins]
    lo = lo.astype(jnp.int32)
    hi = jnp.minimum(lo + 1, bins_per_block - 1)
    x = feats.reshape(b, t, n_blocks, bins_per_block).astype(jnp.float32)
    idx_lo = lo[:, None, None, :]  # broadcast over T and blocks
    idx_hi = hi[:, None, None, :]
    out = (
        jnp.take_along_axis(x, jnp.broadcast_to(idx_lo, x.shape), axis=-1)
        * (1.0 - w)
        + jnp.take_along_axis(x, jnp.broadcast_to(idx_hi, x.shape), axis=-1)
        * w
    )
    return out.reshape(b, t, d).astype(feats.dtype)
