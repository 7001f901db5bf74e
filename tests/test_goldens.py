"""Frozen golden fixtures (SURVEY.md §5.1): the JAX front-end must match
byte-stable .npz goldens generated once from the independent oracle —
guards against the oracle and the implementation drifting together."""

import os

import numpy as np
import jax.numpy as jnp

from phones_las_tpu.frontend import FrontendConfig, extract_features

_GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "frontend_golden.npz")


def test_frontend_matches_frozen_goldens():
    g = np.load(_GOLDEN)
    sig = jnp.asarray(g["signal"])
    for ft in ("logmel", "mfcc"):
        cfg = FrontendConfig(feature_type=ft, add_deltas=True)
        got = np.asarray(extract_features(sig, cfg))
        np.testing.assert_allclose(got, g[ft], rtol=3e-4, atol=3e-3, err_msg=ft)
