"""Front-end variants vs the oracle: window functions, MFCC without
energy, no-delta mode, and the bundled window shapes."""

import numpy as np
import pytest

import jax.numpy as jnp

from phones_las_tpu.frontend.features import FrontendConfig, extract_features
from tests import oracle_features as oracle


def _signal(n=12000, seed=0):
    return (np.random.RandomState(seed).randn(n) * 3000).astype(np.float64)


@pytest.mark.parametrize("window,np_fn", [
    ("hamming", np.hamming),
    ("hann", np.hanning),
])
def test_windowed_logmel_matches_oracle(window, np_fn):
    cfg = FrontendConfig(feature_type="logmel", add_deltas=False, window=window)
    sig = _signal()
    ref = oracle.logfbank(sig, winfunc=np_fn)
    got = np.asarray(extract_features(jnp.asarray(sig, jnp.float32), cfg))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-3)


def test_povey_window_shape():
    cfg = FrontendConfig(window="povey", add_deltas=False)
    # povey = hann^0.85; just assert it runs and differs from rect
    sig = _signal(seed=1)
    got = np.asarray(extract_features(jnp.asarray(sig, jnp.float32), cfg))
    rect = np.asarray(
        extract_features(jnp.asarray(sig, jnp.float32), FrontendConfig(add_deltas=False))
    )
    assert got.shape == rect.shape
    assert np.abs(got - rect).max() > 0.01


def test_mfcc_no_energy_no_lifter():
    cfg = FrontendConfig(
        feature_type="mfcc", add_deltas=False, append_energy=False, lifter=0
    )
    sig = _signal(seed=2)
    ref = oracle.mfcc(sig, append_energy=False, ceplifter=0)
    got = np.asarray(extract_features(jnp.asarray(sig, jnp.float32), cfg))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-3)


def test_no_deltas_dim():
    cfg = FrontendConfig(add_deltas=False)
    out = extract_features(jnp.zeros((2, 8000), jnp.float32), cfg)
    assert out.shape[-1] == 40
