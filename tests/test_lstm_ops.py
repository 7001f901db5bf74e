"""LSTM recurrence: XLA-scan vs Pallas(interpret) parity, masking
semantics vs a literal NumPy loop, pyramid length math."""

import numpy as np
import jax
import jax.numpy as jnp

import pytest

from phones_las_tpu.ops import (
    init_lstm_params,
    lstm_layer,
    bilstm_layer,
    pyramid_reduce,
)

pytestmark = pytest.mark.slow


def _np_lstm(x, lens, p, forget_bias=1.0, reverse=False):
    """Literal per-example loop oracle with dynamic_rnn semantics."""
    b, t, d = x.shape
    u = p.wh.shape[0]
    wx, wh, bias = np.asarray(p.wx), np.asarray(p.wh), np.asarray(p.b)
    out = np.zeros((b, t, u), np.float32)
    hf = np.zeros((b, u), np.float32)
    cf = np.zeros((b, u), np.float32)
    sig = lambda z: 1 / (1 + np.exp(-z))
    for n in range(b):
        h = np.zeros(u, np.float32)
        c = np.zeros(u, np.float32)
        steps = range(lens[n] - 1, -1, -1) if reverse else range(lens[n])
        for tt in steps:
            gates = x[n, tt] @ wx + bias + h @ wh
            i, f, g, o = np.split(gates, 4)
            c = sig(f + forget_bias) * c + sig(i) * np.tanh(g)
            h = sig(o) * np.tanh(c)
            out[n, tt] = h
        hf[n], cf[n] = h, c
    return out, hf, cf


def test_xla_lstm_matches_numpy_oracle():
    rng = jax.random.PRNGKey(0)
    p = init_lstm_params(rng, 8, 16)
    x = np.random.RandomState(0).randn(3, 11, 8).astype(np.float32)
    lens = np.array([11, 7, 1])
    for reverse in (False, True):
        out, (h, c) = lstm_layer(p, jnp.asarray(x), jnp.asarray(lens), reverse=reverse)
        ref_out, ref_h, ref_c = _np_lstm(x, lens, p, reverse=reverse)
        np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), ref_h, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), ref_c, rtol=1e-5, atol=1e-5)


def test_pallas_matches_xla():
    rng = jax.random.PRNGKey(1)
    p = init_lstm_params(rng, 16, 32)
    x = np.random.RandomState(1).randn(4, 37, 16).astype(np.float32)
    lens = np.array([37, 20, 33, 5])
    for reverse in (False, True):
        out_x, (h_x, c_x) = lstm_layer(
            p, jnp.asarray(x), jnp.asarray(lens), reverse=reverse, implementation="xla"
        )
        out_p, (h_p, c_p) = lstm_layer(
            p, jnp.asarray(x), jnp.asarray(lens), reverse=reverse, implementation="pallas"
        )
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x), rtol=1e-5, atol=1e-5)


def test_bf16_recurrent_dot_mode():
    """The production-precision recurrent dot ('bf16'): close to the f32
    kernel (it IS lower precision — loose tolerance), grads finite, and
    precision=None resolves from the ambient matmul-precision scope."""
    from phones_las_tpu.ops.lstm import resolve_rnn_precision

    assert resolve_rnn_precision(None) == "highest"  # no ambient scope
    with jax.default_matmul_precision("default"):
        assert resolve_rnn_precision(None) == "bf16"
    with jax.default_matmul_precision("highest"):
        assert resolve_rnn_precision(None) == "highest"
    assert resolve_rnn_precision("bf16") == "bf16"  # explicit wins

    rng = jax.random.PRNGKey(7)
    p = init_lstm_params(rng, 16, 32)
    x = np.random.RandomState(7).randn(4, 37, 16).astype(np.float32)
    lens = jnp.asarray([37, 20, 33, 5])
    out_hi, _ = lstm_layer(
        p, jnp.asarray(x), lens, implementation="pallas", precision="highest"
    )
    out_bf, _ = lstm_layer(
        p, jnp.asarray(x), lens, implementation="pallas", precision="bf16"
    )
    dev = float(jnp.max(jnp.abs(out_bf - out_hi)))
    assert 0 < dev < 2e-2, dev  # differs (really bf16) but stays close

    def loss(params):
        o, _ = lstm_layer(
            params, jnp.asarray(x), lens, implementation="pallas",
            precision="bf16",
        )
        return jnp.sum(o * o)

    g = jax.grad(loss)(p)
    assert all(bool(jnp.isfinite(v).all()) for v in (g.wx, g.wh, g.b))


def test_bilstm_shapes_and_grad():
    rng = jax.random.PRNGKey(2)
    pf = init_lstm_params(rng, 8, 16)
    pb = init_lstm_params(jax.random.PRNGKey(3), 8, 16)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 10, 8), jnp.float32)
    lens = jnp.asarray([10, 6])
    out, _ = bilstm_layer(pf, pb, x, lens)
    assert out.shape == (2, 10, 32)
    # padded region must be zero in both directions
    assert np.abs(np.asarray(out[1, 6:])).max() == 0.0

    def loss(params):
        o, _ = bilstm_layer(params[0], params[1], x, lens)
        return jnp.sum(o**2)

    g = jax.grad(loss)((pf, pb))
    assert np.isfinite(np.asarray(g[0].wx)).all()


def test_pyramid_reduce():
    x = jnp.asarray(np.arange(2 * 6 * 4).reshape(2, 6, 4), jnp.float32)
    y, lens = pyramid_reduce(x, jnp.asarray([6, 3]))
    assert y.shape == (2, 3, 8)
    assert np.asarray(lens).tolist() == [3, 2]
    # pair concat: y[:, 0] == concat(x[:, 0], x[:, 1])
    np.testing.assert_array_equal(
        np.asarray(y[0, 0]), np.concatenate([np.asarray(x[0, 0]), np.asarray(x[0, 1])])
    )
    # odd T pads
    y2, l2 = pyramid_reduce(x[:, :5], jnp.asarray([5, 3]))
    assert y2.shape == (2, 3, 8)
    assert np.asarray(l2).tolist() == [3, 2]
