"""SpecAugment: mask-shape invariants and train-path integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from phones_las_tpu.frontend.specaugment import (
    SpecAugmentConfig,
    apply_specaugment,
)

B, T, BINS, BLOCKS = 4, 60, 10, 3
D = BINS * BLOCKS


def _feats():
    rs = np.random.RandomState(0)
    return jnp.asarray(rs.rand(B, T, D).astype(np.float32) + 1.0)  # all > 0


def test_disabled_is_identity():
    cfg = SpecAugmentConfig(freq_masks=0, time_masks=0)
    x = _feats()
    lens = jnp.full((B,), T, jnp.int32)
    y = apply_specaugment(jax.random.PRNGKey(0), x, lens, cfg, BINS)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_freq_masks_bounded_and_shared_across_blocks():
    cfg = SpecAugmentConfig(freq_masks=2, freq_mask_width=3, time_masks=0)
    x = _feats()
    lens = jnp.full((B,), T, jnp.int32)
    y = np.asarray(
        apply_specaugment(jax.random.PRNGKey(1), x, lens, cfg, BINS)
    ).reshape(B, T, BLOCKS, BINS)
    zero_bins = (y == 0).all(axis=1)  # [B, BLOCKS, BINS]
    for b in range(B):
        # identical bin mask in every delta block
        for blk in range(1, BLOCKS):
            np.testing.assert_array_equal(zero_bins[b, blk], zero_bins[b, 0])
        # at most masks × width bins masked
        assert zero_bins[b, 0].sum() <= cfg.freq_masks * cfg.freq_mask_width
    # over several draws, something actually gets masked
    total = sum(
        (
            np.asarray(
                apply_specaugment(jax.random.PRNGKey(s), x, lens, cfg, BINS)
            )
            == 0
        ).sum()
        for s in range(5)
    )
    assert total > 0


def test_time_masks_respect_length_and_ratio():
    cfg = SpecAugmentConfig(
        freq_masks=0, time_masks=1, time_mask_width=100, time_mask_ratio=0.25
    )
    lens = jnp.asarray([T, T // 2, 8, 4], jnp.int32)
    x = _feats()
    masked_any = np.zeros(B, bool)
    for s in range(10):
        y = np.asarray(
            apply_specaugment(jax.random.PRNGKey(s), x, lens, cfg, BINS)
        )
        zero_frames = (y == 0).all(axis=2)  # [B, T]
        for b in range(B):
            n = int(lens[b])
            # never masks beyond the valid range
            assert not zero_frames[b, n:].any()
            # per-mask width capped at ratio × length
            assert zero_frames[b].sum() <= int(cfg.time_mask_ratio * n)
            masked_any[b] |= zero_frames[b].any()
    assert masked_any[:2].all()  # long rows get masked at least once


def test_deterministic_under_same_key():
    cfg = SpecAugmentConfig()
    x = _feats()
    lens = jnp.full((B,), T, jnp.int32)
    a = apply_specaugment(jax.random.PRNGKey(7), x, lens, cfg, BINS)
    b = apply_specaugment(jax.random.PRNGKey(7), x, lens, cfg, BINS)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_encode_train_path_applies_specaugment():
    from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
    from phones_las_tpu.models.las import compute_loss, init_las

    base = LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=8),
        speller=SpellerConfig(
            vocab_size=12, embedding_dim=4, num_layers=1, units=8,
            memory_dim=16, attention_units=8, attention_layer_size=8,
        ),
    )
    sa = dataclasses.replace(
        base,
        specaugment=SpecAugmentConfig(time_masks=4, time_mask_width=50,
                                      time_mask_ratio=0.5),
    )
    params = init_las(jax.random.PRNGKey(0), base)
    rs = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray((rs.randn(2, 16000) * 1000).astype(np.float32)),
        "audio_lengths": jnp.asarray([16000, 12000], jnp.int32),
        "targets": jnp.asarray(rs.randint(4, 12, (2, 5)), jnp.int32),
        "target_lengths": jnp.asarray([5, 3], jnp.int32),
    }
    rng = jax.random.PRNGKey(3)
    loss_plain, _ = compute_loss(params, base, batch, train=True, rng=rng)
    loss_sa, _ = compute_loss(params, sa, batch, train=True, rng=rng)
    # augmentation actually perturbs the training loss…
    assert float(loss_plain) != float(loss_sa)
    # …but never touches eval/inference (train=False ignores the config)
    e_plain, _ = compute_loss(params, base, batch, train=False, rng=rng)
    e_sa, _ = compute_loss(params, sa, batch, train=False, rng=rng)
    assert float(e_plain) == float(e_sa)
