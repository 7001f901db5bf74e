"""All attention variants train (finite grads) and decode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
from phones_las_tpu.models.las import compute_loss, encode, init_las
from phones_las_tpu.decode import greedy_decode

pytestmark = pytest.mark.slow

V = 9


@pytest.mark.parametrize(
    "variant", ["bahdanau", "bahdanau_norm", "luong", "luong_scaled"]
)
def test_variant_trains_and_decodes(variant):
    cfg = LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=8),
        speller=SpellerConfig(
            vocab_size=V, embedding_dim=6, num_layers=1, units=8,
            memory_dim=16, attention_type=variant, attention_units=8,
            attention_layer_size=8,
        ),
    )
    params = init_las(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rs.randn(2, 1600) * 1000, jnp.float32),
        "audio_lengths": jnp.asarray([1600, 1100]),
        "targets": jnp.asarray(rs.randint(4, V, (2, 4)), jnp.int32),
        "target_lengths": jnp.asarray([4, 3]),
    }
    loss, _ = compute_loss(params, cfg, batch)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: compute_loss(p, cfg, batch)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    mem, _, mask = encode(params, cfg, batch["audio"], batch["audio_lengths"])
    toks, lens, _ = greedy_decode(params.speller, cfg.speller, mem, mask, 5)
    assert toks.shape == (2, 5)


def test_bahdanau_norm_trainable_gain():
    """TF normalize=True keeps a trainable scalar gain g (init sqrt(1/A))
    on the unit-normalized score vector; the score must scale linearly
    with g and g must receive gradient (it was silently dropped once —
    the rsqrt normalization cancels any scale folded into v's init)."""
    from phones_las_tpu.ops.attention import (
        attention_scores, init_attention_params, precompute_keys,
    )

    a = 8
    p = init_attention_params(jax.random.PRNGKey(0), "bahdanau_norm", a, 16, a)
    assert p.g is not None and p.g.ndim == 0
    np.testing.assert_allclose(float(p.g), float(np.sqrt(1.0 / a)), rtol=1e-6)

    rs = np.random.RandomState(1)
    memory = jnp.asarray(rs.randn(2, 5, 16), jnp.float32)
    query = jnp.asarray(rs.randn(2, a), jnp.float32)
    mask = jnp.ones((2, 5), jnp.float32)
    keys = precompute_keys(p, memory)

    def raw(g_scale):
        from phones_las_tpu.ops.attention import _raw_scores
        return _raw_scores(p._replace(g=p.g * g_scale), "bahdanau_norm",
                           query, keys)

    np.testing.assert_allclose(
        np.asarray(raw(2.0)), 2.0 * np.asarray(raw(1.0)), rtol=1e-5
    )
    grad_g = jax.grad(
        lambda g: jnp.sum(
            attention_scores(p._replace(g=g), "bahdanau_norm", query, keys,
                             mask) ** 2
        )
    )(p.g)
    assert float(jnp.abs(grad_g)) > 0
