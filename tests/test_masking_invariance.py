"""Masking invariance (SURVEY.md §5.2): loss, encoder outputs, and
decodes must be invariant to the *content* of padded positions."""

import numpy as np
import jax
import jax.numpy as jnp

from phones_las_tpu.models import (
    LASConfig,
    ListenerConfig,
    SpellerConfig,
    init_las,
    encode,
    compute_loss,
)
from phones_las_tpu.decode import greedy_decode

V = 10


def _cfg():
    return LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=8),
        speller=SpellerConfig(
            vocab_size=V, embedding_dim=6, num_layers=1, units=8,
            memory_dim=16, attention_units=8, attention_layer_size=8,
        ),
    )


def test_pad_content_invariance():
    cfg = _cfg()
    params = init_las(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    b, s, st = 2, 4800, 6
    audio = rs.randn(b, s).astype(np.float32) * 1000
    lens = np.array([4800, 3000])
    targets = rs.randint(4, V, (b, st)).astype(np.int32)
    tlens = np.array([st, 4])

    def run(audio, targets):
        batch = {
            "audio": jnp.asarray(audio),
            "audio_lengths": jnp.asarray(lens),
            "targets": jnp.asarray(targets),
            "target_lengths": jnp.asarray(tlens),
        }
        loss, aux = compute_loss(params, cfg, batch)
        mem, el, mask = encode(params, cfg, batch["audio"], batch["audio_lengths"])
        toks, dlens, _ = greedy_decode(params.speller, cfg.speller, mem, mask, 5)
        return float(loss), np.asarray(mem), np.asarray(toks), np.asarray(el)

    l1, m1, t1, e1 = run(audio, targets)

    # scribble over padded audio and padded targets
    audio2 = audio.copy()
    audio2[1, 3000:] = rs.randn(s - 3000) * 30000
    targets2 = targets.copy()
    targets2[1, 4:] = 9
    l2, m2, t2, e2 = run(audio2, targets2)

    assert l1 == l2
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(e1, e2)
    # encoder outputs identical at valid frames of the short row
    np.testing.assert_allclose(m1[1, : e1[1]], m2[1, : e1[1]], atol=1e-6)
