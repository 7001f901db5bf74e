"""Golden-parity tests: JAX front-end vs the independent NumPy oracle.

SURVEY.md §5 item 1: feature tensors must match psf semantics within fp32
tolerance. The oracle (tests/oracle_features.py) implements the literal
rfft/loop formulation; the JAX path uses the DFT-matmul formulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phones_las_tpu.frontend import (
    FrontendConfig,
    extract_features,
    num_frames,
)
from tests import oracle_features as oracle


def _signal(n, seed=0):
    rng = np.random.RandomState(seed)
    # int16-ish PCM scaled like real speech
    return (rng.randn(n) * 3000).astype(np.float64)


@pytest.mark.parametrize("n_samples", [400, 1000, 16000, 16243])
def test_logmel_matches_oracle(n_samples):
    cfg = FrontendConfig(feature_type="logmel", add_deltas=False)
    sig = _signal(n_samples)
    ref = oracle.logfbank(sig)
    got = np.asarray(extract_features(jnp.asarray(sig, jnp.float32), cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)


def test_logmel_deltas_match_oracle():
    cfg = FrontendConfig(feature_type="logmel", add_deltas=True)
    sig = _signal(12345, seed=1)
    ref = oracle.full_frontend(sig, "logmel")
    got = np.asarray(extract_features(jnp.asarray(sig, jnp.float32), cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)


def test_mfcc_matches_oracle():
    cfg = FrontendConfig(feature_type="mfcc", add_deltas=True)
    sig = _signal(20000, seed=2)
    ref = oracle.full_frontend(sig, "mfcc")
    got = np.asarray(extract_features(jnp.asarray(sig, jnp.float32), cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-3)


def test_num_frames_psf_semantics():
    cfg = FrontendConfig()
    assert num_frames(100, cfg) == 1  # shorter than one window
    assert num_frames(400, cfg) == 1
    assert num_frames(401, cfg) == 2
    assert num_frames(560, cfg) == 2
    assert num_frames(561, cfg) == 3
    assert num_frames(16000, cfg) == 1 + int(np.ceil((16000 - 400) / 160))  # 99
    # traced version agrees
    lens = jnp.asarray([100, 400, 401, 560, 561, 16000])
    got = np.asarray(num_frames(lens, cfg))
    assert got.tolist() == [1, 1, 2, 2, 3, 99]


def test_batched_padded_matches_per_utterance():
    """Padded batch + frame_lengths must reproduce per-utterance features
    (incl. delta edges) on the true frames."""
    cfg = FrontendConfig(feature_type="logmel", add_deltas=True)
    lens = [9000, 16000, 12345]
    pad_to = 16000
    sigs = [_signal(n, seed=i) for i, n in enumerate(lens)]
    batch = np.zeros((len(lens), pad_to))
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
    flens = np.array([num_frames(n, cfg) for n in lens])

    got = np.asarray(
        extract_features(
            jnp.asarray(batch, jnp.float32), cfg,
            sample_lengths=jnp.asarray(lens),
        )
    )
    for i, s in enumerate(sigs):
        solo = np.asarray(extract_features(jnp.asarray(s, jnp.float32), cfg))
        np.testing.assert_allclose(
            got[i, : flens[i]], solo[: flens[i]], rtol=1e-5, atol=1e-5
        )


def test_jit_and_shapes():
    cfg = FrontendConfig()
    fn = jax.jit(lambda x: extract_features(x, cfg))
    out = fn(jnp.zeros((2, 16000), jnp.float32))
    assert out.shape == (2, 99, 120)
