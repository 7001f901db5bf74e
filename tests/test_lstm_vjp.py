"""Custom-VJP Pallas LSTM: gradients match the XLA-scan autodiff path."""

import numpy as np
import jax
import jax.numpy as jnp

from phones_las_tpu.ops import init_lstm_params, lstm_layer

import pytest

pytestmark = pytest.mark.slow


def _setup(b=4, t=23, d=12, u=16, seed=0):
    p = init_lstm_params(jax.random.PRNGKey(seed), d, u)
    x = jnp.asarray(np.random.RandomState(seed).randn(b, t, d), jnp.float32)
    lens = jnp.asarray([t, t - 5, 7, 1])
    return p, x, lens


def _loss_fn(implementation, reverse):
    def loss(p, x, lens):
        out, (h, c) = lstm_layer(
            p, x, lens, reverse=reverse, implementation=implementation
        )
        # exercise all three outputs so dout, dhfin, dcfin are nonzero
        return (
            jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
            + 2.0 * jnp.sum(h * h)
            + jnp.sum(jnp.sin(c))
        )

    return loss


def test_pallas_vjp_matches_xla():
    p, x, lens = _setup()
    for reverse in (False, True):
        ref_loss = _loss_fn("xla", reverse)
        got_loss = _loss_fn("pallas", reverse)
        np.testing.assert_allclose(
            float(got_loss(p, x, lens)), float(ref_loss(p, x, lens)),
            rtol=1e-5, atol=1e-5,
        )
        g_ref = jax.grad(ref_loss, argnums=(0, 1))(p, x, lens)
        g_got = jax.grad(got_loss, argnums=(0, 1))(p, x, lens)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), rtol=2e-4, atol=2e-4
            )


def test_bidir_pallas_matches_xla_with_grads():
    from phones_las_tpu.ops import bilstm_layer, init_lstm_params

    pf = init_lstm_params(jax.random.PRNGKey(0), 12, 16)
    pb = init_lstm_params(jax.random.PRNGKey(1), 12, 16)
    x = jnp.asarray(np.random.RandomState(2).randn(4, 29, 12), jnp.float32)
    lens = jnp.asarray([29, 17, 8, 1])

    def loss(params, impl):
        out, ((hf, cf), (hb, cb)) = bilstm_layer(
            params[0], params[1], x, lens, implementation=impl
        )
        return jnp.sum(out**2) + jnp.sum(hf * cb) + jnp.sum(hb * cf)

    ref = float(loss((pf, pb), "xla"))
    got = float(loss((pf, pb), "pallas"))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    g_ref = jax.grad(lambda p: loss(p, "xla"))((pf, pb))
    g_got = jax.grad(lambda p: loss(p, "pallas"))((pf, pb))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-4)


def test_pallas_vjp_long_sequence_multiblock():
    """Sequence longer than one time-chunk exercises cross-block state
    and dWh accumulation."""
    p, _, _ = _setup(u=16)
    b, t, d = 4, 70, 12
    x = jnp.asarray(np.random.RandomState(1).randn(b, t, d), jnp.float32)
    lens = jnp.asarray([70, 64, 33, 9])
    for reverse in (False, True):
        g_ref = jax.grad(_loss_fn("xla", reverse))(p, x, lens)
        g_got = jax.grad(_loss_fn("pallas", reverse))(p, x, lens)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), rtol=5e-4, atol=5e-4
            )


def test_pallas_vjp_bf16_mode_close_to_f32():
    """bf16 recurrent-dot mode now also stores the carried-state residuals
    in bf16 (ops/lstm.py _make_lstm_fwd_res_kernel); gradients must stay
    close to the f32 XLA reference (loose tolerance — production mode)."""
    p, x, lens = _setup()

    def loss(impl, prec):
        def f(p, x, lens):
            out, (h, c) = lstm_layer(
                p, x, lens, implementation=impl, precision=prec
            )
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape))) + jnp.sum(h * h)
        return f

    g_ref = jax.grad(loss("xla", None))(p, x, lens)
    g_bf16 = jax.grad(loss("pallas", "bf16"))(p, x, lens)
    for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_bf16)):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        assert float(jnp.max(jnp.abs(a - b_))) / scale < 3e-2
