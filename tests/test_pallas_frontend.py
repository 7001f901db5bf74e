"""Fused Pallas front-end vs the pure-JAX reference implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from phones_las_tpu.frontend.features import FrontendConfig, extract_features, num_frames
from phones_las_tpu.frontend.pallas_frontend import extract_features_pallas


def _batch(lens, pad_to, seed=0):
    batch = np.zeros((len(lens), pad_to), np.float32)
    for i, n in enumerate(lens):
        batch[i, :n] = np.random.RandomState(seed + i).randn(n) * 2000
    return jnp.asarray(batch)


@pytest.mark.parametrize("feature_type", ["logmel", "mfcc"])
def test_pallas_matches_reference(feature_type):
    cfg = FrontendConfig(feature_type=feature_type, add_deltas=True)
    lens = [16000, 9000, 12345]
    x = _batch(lens, 16000)
    sl = jnp.asarray(lens)
    ref = np.asarray(extract_features(x, cfg, sample_lengths=sl))
    got = np.asarray(
        extract_features_pallas(x, cfg, sample_lengths=sl, interpret=True)
    )
    assert got.shape == ref.shape
    flens = [int(num_frames(n, cfg)) for n in lens]
    for i, fl in enumerate(flens):
        np.testing.assert_allclose(got[i, :fl], ref[i, :fl], rtol=1e-4, atol=1e-4)


def test_pallas_uneven_tile():
    cfg = FrontendConfig(add_deltas=False)
    x = _batch([50000], 50000)  # 311 frames: not a multiple of the 64 tile
    ref = np.asarray(extract_features(x, cfg))
    got = np.asarray(extract_features_pallas(x, cfg, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
