"""Cross-language transfer: encoder-only warm start across different
phone inventories (decoder shapes differ, listener transfers)."""

import numpy as np
import jax

from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
from phones_las_tpu.train.checkpoint import CheckpointManager, load_params_for_warm_start
from phones_las_tpu.train.state import TrainConfig, create_train_state


def _cfg(vocab_size):
    return LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=8),
        speller=SpellerConfig(
            vocab_size=vocab_size, embedding_dim=4, num_layers=1, units=8,
            memory_dim=16, attention_units=8, attention_layer_size=8,
        ),
    )


def test_encoder_warm_start_across_vocabs(tmp_path):
    wd = str(tmp_path / "src")
    src = create_train_state(jax.random.PRNGKey(0), _cfg(10), TrainConfig())
    src = src._replace(
        params=src.params._replace(cmvn_mean=src.params.cmvn_mean + 3.0)
    )
    mgr = CheckpointManager(wd, save_every=1)
    mgr.save(1, src, force=True)
    mgr.wait()
    mgr.close()

    # target run: DIFFERENT vocab (27) → decoder shapes differ
    tgt = create_train_state(jax.random.PRNGKey(7), _cfg(27), TrainConfig())
    out = load_params_for_warm_start(
        wd, tgt, scope="encoder", target_params=tgt.params
    )
    # listener == source, decoder untouched, cmvn transferred
    for a, b in zip(jax.tree.leaves(out.listener), jax.tree.leaves(src.params.listener)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(out.speller), jax.tree.leaves(tgt.params.speller)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out.cmvn_mean), 3.0)


def test_full_warm_start(tmp_path):
    wd = str(tmp_path / "src2")
    src = create_train_state(jax.random.PRNGKey(1), _cfg(10), TrainConfig())
    mgr = CheckpointManager(wd, save_every=1)
    mgr.save(1, src, force=True)
    mgr.wait()
    mgr.close()
    tgt = create_train_state(jax.random.PRNGKey(9), _cfg(10), TrainConfig())
    params = load_params_for_warm_start(wd, tgt)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(src.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
