"""Unit tests for the seq2seq G2P stack (models/g2p_model.py): loss
masking, serialization roundtrip, lexicon hygiene, NeuralG2P batching.
The accuracy gates live in test_g2p_coverage.py."""

import jax
import numpy as np

from phones_las_tpu.data.lexicon_en import (
    _GOLD_WORDS,
    expanded_lexicon,
    lexicon_phone_inventory,
)
from phones_las_tpu.data.vocab import Vocab
from phones_las_tpu.models.g2p_model import (
    G2PConfig,
    NeuralG2P,
    char_vocab,
    g2p_loss,
    init_g2p,
    predict,
    save_g2p,
    load_g2p,
    train_g2p,
)


def _tiny():
    cfg = G2PConfig(char_vocab_size=len(char_vocab()),
                    phone_vocab_size=12, char_embed_dim=8, units=8)
    return cfg, init_g2p(jax.random.PRNGKey(0), cfg)


def test_lexicon_hygiene():
    lex = expanded_lexicon()
    assert len(lex) > 2000
    # no gold leakage, ever
    assert not (_GOLD_WORDS & set(lex))
    # every phone has a binf feature row (so binf presets stay valid on
    # corpora prepared with the neural G2P)
    from phones_las_tpu.data.ipa import binf_matrix

    inv = lexicon_phone_inventory()
    m = np.asarray(binf_matrix(inv))
    assert (m.sum(1) > 0).all()
    # inflection machinery spot checks
    assert lex["walked"] == ("w", "ɔ", "k", "t")          # voiceless → t
    assert lex["played"] == ("p", "l", "eɪ", "d") if "played" in lex else True
    assert lex["stopping"] == ("s", "t", "ɑ", "p", "ɪ", "ŋ")  # CVC doubling
    assert lex["watches"][-2:] == ("ɪ", "z")               # sibilant → ɪz
    assert lex["carried"] == ("k", "ɛ", "ɹ", "i", "d")     # y → ied


def test_loss_is_finite_and_masked():
    cfg, params = _tiny()
    batch = {
        "chars": np.array([[5, 6, 7, 0], [5, 6, 0, 0]], np.int32),
        "char_lengths": np.array([3, 2], np.int32),
        "phones": np.array([[4, 5, 2, 2], [4, 2, 2, 2]], np.int32),
        "phone_lengths": np.array([3, 2], np.int32),
    }
    loss = g2p_loss(params, cfg, {k: np.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(loss))
    # padding rows beyond phone_lengths must not change the loss
    batch2 = dict(batch)
    batch2["phones"] = batch["phones"].copy()
    batch2["phones"][0, 3] = 9  # inside the masked tail
    loss2 = g2p_loss(params, cfg, batch2)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)


def test_save_load_roundtrip(tmp_path):
    cfg, params = _tiny()
    vc, vp = char_vocab(), Vocab(list("abcdefgh"))
    p = str(tmp_path / "m.npz")
    save_g2p(p, params, cfg, vc, vp)
    params2, cfg2, vc2, vp2 = load_g2p(p)
    assert cfg2 == cfg
    assert vc2.tokens == vc.tokens and vp2.tokens == vp.tokens
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out1 = predict(params, cfg, vc, vp, ["abc"], beam_width=2)
    out2 = predict(params2, cfg2, vc2, vp2, ["abc"], beam_width=2)
    assert out1 == out2


def test_train_g2p_learns_a_toy_mapping():
    # identity-ish toy: each char maps to one phone; 30 steps suffice
    words = ["ab", "ba", "aab", "bab", "abb", "aa", "bb", "ab'a"]
    lex = {w: tuple(c for c in w if c != "'") for w in words}
    params, cfg, vc, vp = train_g2p(
        lex, steps=60, batch_size=8, dev_fraction=0.0, label_smoothing=0.0)
    out = predict(params, cfg, vc, vp, ["ab", "ba"], beam_width=1)
    assert out == [["a", "b"], ["b", "a"]]


def test_neural_g2p_bundled_caching_and_handles():
    m = NeuralG2P.bundled()
    assert m.handles("hello") and not m.handles("42") and not m.handles("")
    out1 = m.lookup(["hello", "42"])
    assert "hello" in out1 and "42" not in out1
    # second call is served from cache (same object identity)
    out2 = m.lookup(["hello"])
    assert out2["hello"] == out1["hello"]
