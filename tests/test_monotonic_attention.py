"""Monotonic attention: parallel recursion vs literal oracle, and
end-to-end decode with *_monotonic variants."""

import numpy as np
import jax
import jax.numpy as jnp

from phones_las_tpu.ops.attention import monotonic_attention
from phones_las_tpu.models.speller import SpellerConfig, init_speller
from phones_las_tpu.models.las import compute_loss, LASConfig, ListenerConfig, init_las
from phones_las_tpu.decode import greedy_decode, beam_decode

import pytest

pytestmark = pytest.mark.slow

V, BOS, EOS = 8, 1, 2


def _oracle(p, prev):
    """α_i[j] = p[j] · Σ_{k≤j} α_{i-1}[k] · Π_{l=k}^{j-1}(1−p[l])"""
    t = p.shape[0]
    out = np.zeros(t)
    for j in range(t):
        s = 0.0
        for k in range(j + 1):
            prod = np.prod(1.0 - p[k:j]) if j > k else 1.0
            s += prev[k] * prod
        out[j] = p[j] * s
    return out


def test_recursion_matches_oracle():
    rng = np.random.RandomState(0)
    p = rng.uniform(0.05, 0.95, (3, 7))
    prev = rng.dirichlet(np.ones(7), size=3)
    got = np.asarray(monotonic_attention(jnp.asarray(p), jnp.asarray(prev)))
    for b in range(3):
        np.testing.assert_allclose(got[b], _oracle(p[b], prev[b]), rtol=1e-5, atol=1e-6)


def test_attention_mass_moves_monotonically():
    """Expected attended position is non-decreasing across steps."""
    rng = np.random.RandomState(1)
    t = 10
    align = np.zeros((1, t)); align[0, 0] = 1.0
    last_pos = 0.0
    for _ in range(5):
        p = jnp.asarray(rng.uniform(0.1, 0.9, (1, t)))
        align = np.asarray(monotonic_attention(p, jnp.asarray(align)))
        pos = (align[0] * np.arange(t)).sum() / max(align[0].sum(), 1e-9)
        assert pos >= last_pos - 1e-6
        last_pos = pos


def test_hard_monotonic_attention():
    from phones_las_tpu.ops.attention import hard_monotonic_attention

    choose = jnp.asarray([[0, 1, 0, 1, 1], [0, 0, 0, 0, 0], [1, 1, 0, 0, 1]],
                         jnp.float32)
    prev = jnp.asarray([[0, 1, 0, 0, 0], [1, 0, 0, 0, 0], [0, 0, 1, 0, 0]],
                       jnp.float32)
    got = np.asarray(hard_monotonic_attention(choose, prev))
    # row 0: prev at 1, first choose at j>=1 is 1
    np.testing.assert_array_equal(got[0], [0, 1, 0, 0, 0])
    # row 1: never chooses → all-zero attention
    np.testing.assert_array_equal(got[1], [0, 0, 0, 0, 0])
    # row 2: prev at 2, first choose at j>=2 is 4
    np.testing.assert_array_equal(got[2], [0, 0, 0, 0, 1])


def test_hard_mode_decodes():
    cfg = _cfg("bahdanau_monotonic")
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        speller=dataclasses.replace(cfg.speller, monotonic_mode="hard"),
    )
    params = init_las(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    audio = jnp.asarray(rs.randn(2, 1600) * 1000, jnp.float32)
    lens = jnp.asarray([1600, 1200])
    from phones_las_tpu.models.las import encode

    memory, _, mask = encode(params, cfg, audio, lens)
    toks, dlens, aligns = greedy_decode(
        params.speller, cfg.speller, memory, mask, 5, return_alignments=True
    )
    assert toks.shape == (2, 5)
    a = np.asarray(aligns)
    # hard attention: each step's alignment is one-hot or all-zero
    sums = a.sum(-1)
    assert np.all((np.abs(sums - 1) < 1e-6) | (sums < 1e-6))


def _cfg(attention_type):
    return LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=8),
        speller=SpellerConfig(
            vocab_size=V, embedding_dim=6, num_layers=1, units=8,
            memory_dim=16, attention_type=attention_type, attention_units=8,
            attention_layer_size=8, bos_id=BOS, eos_id=EOS,
        ),
    )


def test_monotonic_bias_shifts_hard_threshold():
    """--monotonic-bias is the decode-time calibration knob that made
    hard mode usable (docs/ACCURACY.md round-5 bias sweep): a large
    positive bias pushes every pre-sigmoid energy above the hard 0
    threshold (attend at the first admissible key), a large negative
    one below it (all-zero alignment)."""
    from phones_las_tpu.ops.attention import (
        attention_scores,
        init_attention_params,
    )

    rng = jax.random.PRNGKey(3)
    params = init_attention_params(rng, "bahdanau_monotonic", query_dim=8,
                                   memory_dim=16, attn_units=8)
    q = jax.random.normal(jax.random.PRNGKey(4), (2, 8))
    keys = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 8))
    mask = jnp.ones((2, 5))
    prev = jnp.zeros((2, 5)).at[:, 0].set(1.0)  # start of decode

    kw = dict(prev_align=prev, monotonic_mode="hard")
    hi = np.asarray(attention_scores(
        params, "bahdanau_monotonic", q, keys, mask,
        monotonic_bias=100.0, **kw,
    ))
    lo = np.asarray(attention_scores(
        params, "bahdanau_monotonic", q, keys, mask,
        monotonic_bias=-100.0, **kw,
    ))
    # +100: everything crosses the threshold -> attend exactly at the
    # previous position (first admissible key)
    np.testing.assert_array_equal(hi, np.asarray(prev))
    # -100: nothing crosses -> all-zero alignment
    np.testing.assert_array_equal(lo, np.zeros_like(lo))


def test_monotonic_variants_train_and_decode():
    rs = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rs.randn(2, 1600) * 1000, jnp.float32),
        "audio_lengths": jnp.asarray([1600, 1200]),
        "targets": jnp.asarray(rs.randint(3, V, (2, 4)), jnp.int32),
        "target_lengths": jnp.asarray([4, 3]),
    }
    for variant in ("bahdanau_monotonic", "luong_monotonic"):
        cfg = _cfg(variant)
        params = init_las(jax.random.PRNGKey(0), cfg)
        loss, aux = compute_loss(params, cfg, batch, train=True,
                                 rng=jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)), variant
        g = jax.grad(lambda p: compute_loss(p, cfg, batch, train=False)[0])(params)
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))

        from phones_las_tpu.models.las import encode

        memory, _, mask = encode(params, cfg, batch["audio"], batch["audio_lengths"])
        toks, lens, _ = greedy_decode(params.speller, cfg.speller, memory, mask, 5)
        assert toks.shape == (2, 5)
        res = beam_decode(params.speller, cfg.speller, memory, mask, 5, beam_width=2)
        assert res.tokens.shape == (2, 5)
