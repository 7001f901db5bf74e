"""SpecAugment: on-device spectrogram augmentation (Park et al. 2019).

The reference has no augmentation at all (SURVEY.md §2 — its input_fn
feeds precomputed frames verbatim); this is a beyond-parity training
feature, standard for LAS-family models since SpecAugment was introduced
on exactly this architecture (LAS on LibriSpeech). TPU-native shape: the
masks are built from broadcasted iota comparisons on device, inside the
jitted train step — static shapes, no host RNG, keyed by the step rng so
resume reproduces the same augmentation stream.

Masking conventions:

- frequency masks are drawn over the per-block feature bins (the 40 mel
  bins) and applied to *all* delta blocks at the same bin — the Δ/ΔΔ
  channels of a masked mel bin carry the same information, so masking
  them together is the faithful generalization of masking the
  spectrogram before delta computation;
- time masks are drawn within each utterance's valid frame range, with
  the per-mask width capped at ``time_mask_ratio`` of the utterance (the
  adaptive rule from SpecAugment's LibriSpeech recipe);
- masked cells are set to 0, which equals the feature mean after CMVN.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    freq_masks: int = 2
    freq_mask_width: int = 10  # max bins per mask (of the 40 mel bins)
    time_masks: int = 2
    time_mask_width: int = 50  # max frames per mask
    time_mask_ratio: float = 0.2  # per-mask width also capped at ratio·frames


def _interval_masks(rng, n_masks: int, widths_max, span, total: int, batch: int):
    """→ keep mask [B, total]: AND of ``n_masks`` random zero intervals.

    Each interval has width w ~ U{0..widths_max} (widths_max may be a
    per-row array) and start ~ U{0..span-w} (span may be per-row; cells
    at index ≥ span are never masked).
    """
    kw, ks = jax.random.split(rng)
    u_w = jax.random.uniform(kw, (batch, n_masks))
    u_s = jax.random.uniform(ks, (batch, n_masks))
    widths_max = jnp.broadcast_to(
        jnp.asarray(widths_max, jnp.float32).reshape(-1, 1), (batch, n_masks)
    )
    span = jnp.broadcast_to(
        jnp.asarray(span, jnp.float32).reshape(-1, 1), (batch, n_masks)
    )
    w = jnp.floor(u_w * (widths_max + 1.0))  # [B, M] in {0..widths_max}
    w = jnp.minimum(w, span)  # a misconfigured width can't exceed the span
    start = jnp.floor(u_s * (span - w + 1.0))  # uniform over {0..span-w}
    idx = jnp.arange(total, dtype=jnp.float32)  # [total]
    inside = (idx[None, None, :] >= start[..., None]) & (
        idx[None, None, :] < (start + w)[..., None]
    )  # [B, M, total]
    return ~jnp.any(inside, axis=1)  # [B, total] True = keep


def apply_specaugment(
    rng,
    feats: jnp.ndarray,  # [B, T, D], D = n_blocks × bins (fbank ‖ Δ ‖ ΔΔ)
    frame_lengths: jnp.ndarray,  # [B] valid frames
    cfg: SpecAugmentConfig,
    bins_per_block: int,
) -> jnp.ndarray:
    """Apply frequency + time masking; zero-fill (= post-CMVN mean)."""
    b, t, d = feats.shape
    assert d % bins_per_block == 0, (d, bins_per_block)
    n_blocks = d // bins_per_block
    k_f, k_t = jax.random.split(rng)

    keep = jnp.ones((b, t, n_blocks, bins_per_block), bool)
    if cfg.freq_masks > 0 and cfg.freq_mask_width > 0:
        keep_bins = _interval_masks(
            k_f, cfg.freq_masks,
            jnp.full((b,), cfg.freq_mask_width),
            jnp.full((b,), bins_per_block),
            bins_per_block, b,
        )  # [B, bins]
        keep &= keep_bins[:, None, None, :]
    if cfg.time_masks > 0 and cfg.time_mask_width > 0:
        n = frame_lengths.astype(jnp.float32)
        w_max = jnp.minimum(
            float(cfg.time_mask_width), jnp.floor(cfg.time_mask_ratio * n)
        )
        keep_frames = _interval_masks(
            k_t, cfg.time_masks, w_max, n, t, b
        )  # [B, T]
        keep &= keep_frames[:, :, None, None]
    return (feats.reshape(b, t, n_blocks, bins_per_block) * keep).reshape(
        b, t, d
    ).astype(feats.dtype)
