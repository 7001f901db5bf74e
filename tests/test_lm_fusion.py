"""N-gram LM fit + shallow-fusion beam decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phones_las_tpu.decode import beam_decode
from phones_las_tpu.decode.lm import (
    fit_ngram_lm,
    lm_step_scores,
    load_lm,
    save_lm,
)
from phones_las_tpu.models.speller import SpellerConfig, init_speller

V, BOS, EOS = 8, 1, 2


def _tiny(seed=0):
    cfg = SpellerConfig(
        vocab_size=V, embedding_dim=6, num_layers=1, units=8, memory_dim=10,
        attention_type="bahdanau", attention_units=7, attention_layer_size=9,
        bos_id=BOS, eos_id=EOS,
    )
    return cfg, init_speller(jax.random.PRNGKey(seed), cfg)


def _memory(b=2, t=5):
    mem = jnp.asarray(np.random.RandomState(0).randn(b, t, 10), jnp.float32)
    mask = jnp.ones((b, t), jnp.float32)
    return mem, mask


def _corpus():
    # deterministic bigram structure: 4→5, 5→6, 6→<eos>
    return [np.asarray([4, 5, 6], np.int32) for _ in range(50)]


def test_fit_rows_are_distributions():
    for order in (2, 3):
        logp = fit_ngram_lm(_corpus(), V, BOS, EOS, order=order)
        assert logp.shape == ((V, V) if order == 2 else (V, V, V))
        sums = np.exp(logp).sum(axis=-1)
        np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-5)


def test_fit_learns_the_corpus_transitions():
    logp2 = fit_ngram_lm(_corpus(), V, BOS, EOS, order=2)
    assert logp2[BOS].argmax() == 4
    assert logp2[4].argmax() == 5
    assert logp2[5].argmax() == 6
    assert logp2[6].argmax() == EOS
    # unseen context falls back to the (corpus-shaped) unigram
    assert np.isfinite(logp2[7]).all()

    logp3 = fit_ngram_lm(_corpus(), V, BOS, EOS, order=3)
    assert logp3[4, 5].argmax() == 6
    assert logp3[BOS, BOS].argmax() == 4


def test_save_load_roundtrip(tmp_path):
    logp = fit_ngram_lm(_corpus(), V, BOS, EOS, order=3)
    path = str(tmp_path / "lm.npz")
    save_lm(path, logp, [f"t{i}" for i in range(V)])
    np.testing.assert_array_equal(load_lm(path), logp)


def test_lm_step_scores_indexing():
    logp3 = np.zeros((V, V, V), np.float32)
    logp3[3, 4, 5] = -7.0
    prev1 = jnp.asarray([[4, 0]], jnp.int32)
    prev2 = jnp.asarray([[3, 0]], jnp.int32)
    out = np.asarray(lm_step_scores(jnp.asarray(logp3), prev1, prev2))
    assert out.shape == (1, 2, V)
    assert out[0, 0, 5] == -7.0 and out[0, 1, 5] == 0.0


def test_zero_weight_is_exact_baseline():
    cfg, params = _tiny()
    mem, mask = _memory()
    lm = jnp.asarray(fit_ngram_lm(_corpus(), V, BOS, EOS, order=2))
    base = beam_decode(params, cfg, mem, mask, max_steps=6, beam_width=3)
    fused0 = beam_decode(
        params, cfg, mem, mask, max_steps=6, beam_width=3,
        lm_logp=lm, lm_weight=0.0,
    )
    np.testing.assert_array_equal(np.asarray(base.tokens), np.asarray(fused0.tokens))
    np.testing.assert_array_equal(np.asarray(base.scores), np.asarray(fused0.scores))


@pytest.mark.parametrize("order", [2, 3])
def test_strong_lm_steers_the_beam(order):
    cfg, params = _tiny()
    mem, mask = _memory()
    lm = jnp.asarray(fit_ngram_lm(_corpus(), V, BOS, EOS, order=order))
    res = beam_decode(
        params, cfg, mem, mask, max_steps=6, beam_width=4,
        lm_logp=lm, lm_weight=50.0,
    )
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    # with the LM dominating, every hypothesis is the corpus sequence
    for b in range(toks.shape[0]):
        assert lens[b] == 3
        np.testing.assert_array_equal(toks[b, :3], [4, 5, 6])
