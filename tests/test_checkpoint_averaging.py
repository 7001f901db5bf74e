"""Checkpoint averaging (``load_averaged_params``)."""

import jax
import numpy as np

from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
from phones_las_tpu.train.checkpoint import (
    CheckpointManager,
    load_averaged_params,
)
from phones_las_tpu.train.state import TrainConfig, create_train_state


def _cfg():
    return LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=8),
        speller=SpellerConfig(
            vocab_size=10, embedding_dim=4, num_layers=1, units=8,
            memory_dim=16, attention_units=8, attention_layer_size=8,
        ),
    )


def _save_states(wd, states):
    mgr = CheckpointManager(wd, save_every=1)
    for i, s in enumerate(states):
        mgr.save(i + 1, s, force=True)
    mgr.wait()
    mgr.close()


def test_average_of_k_is_the_leafwise_mean(tmp_path):
    wd = str(tmp_path / "run")
    base = create_train_state(jax.random.PRNGKey(0), _cfg(), TrainConfig())
    states = [
        base._replace(
            params=jax.tree.map(lambda a, s=shift: a + s, base.params),
            step=base.step + i,
        )
        for i, shift in enumerate([0.0, 1.0, 5.0])
    ]
    _save_states(wd, states)

    avg, used = load_averaged_params(wd, base, last_k=3)
    assert used == [1, 2, 3]
    want = jax.tree.map(lambda a: a + 2.0, base.params)  # mean of 0,1,5
    for a, b in zip(jax.tree.leaves(avg), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # K larger than the number of checkpoints → average what exists
    avg_all, used_all = load_averaged_params(wd, base, last_k=10)
    assert used_all == [1, 2, 3]

    # K=1 → exactly the newest checkpoint
    last, used_last = load_averaged_params(wd, base, last_k=1)
    assert used_last == [3]
    for a, b in zip(
        jax.tree.leaves(last), jax.tree.leaves(states[-1].params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
