"""Fused Pallas greedy decoder vs the scan-based reference decoder."""

import numpy as np
import jax
import jax.numpy as jnp

from phones_las_tpu.decode import greedy_decode
from phones_las_tpu.decode.pallas_greedy import greedy_decode_fused, supports
from phones_las_tpu.models.speller import SpellerConfig, init_speller

V, BOS, EOS = 11, 1, 2


def _setup(num_layers=2, b=5, t=13, m=16):
    cfg = SpellerConfig(
        vocab_size=V, embedding_dim=8, num_layers=num_layers, units=16,
        memory_dim=m, attention_type="bahdanau", attention_units=16,
        attention_layer_size=16, bos_id=BOS, eos_id=EOS,
    )
    params = init_speller(jax.random.PRNGKey(0), cfg)
    mem = jnp.asarray(np.random.RandomState(0).randn(b, t, m), jnp.float32)
    lens = np.minimum(np.random.RandomState(1).randint(4, t + 1, b), t)
    mask = jnp.asarray((np.arange(t)[None, :] < lens[:, None]), jnp.float32)
    return cfg, params, mem, mask


def test_fused_matches_scan():
    cfg, params, mem, mask = _setup()
    assert supports(cfg)
    ref_toks, ref_lens, _ = greedy_decode(params, cfg, mem, mask, max_steps=9)
    got_toks, got_lens = greedy_decode_fused(
        params, cfg, mem, mask, max_steps=9, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_toks), np.asarray(ref_toks))
    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(ref_lens))


def test_fused_single_layer_and_batch_pad():
    cfg, params, mem, mask = _setup(num_layers=1, b=3)
    ref_toks, ref_lens, _ = greedy_decode(params, cfg, mem, mask, max_steps=6)
    got_toks, got_lens = greedy_decode_fused(
        params, cfg, mem, mask, max_steps=6, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_toks), np.asarray(ref_toks))
    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(ref_lens))


def test_unsupported_configs_detected():
    cfg = SpellerConfig(attention_type="luong")
    assert not supports(cfg)
    cfg = SpellerConfig(attention_type="bahdanau", attention_layer_size=0)
    assert not supports(cfg)
