"""Legacy-checkpoint migration: checkpoints written before
``AttentionParams.g`` (the trainable bahdanau_norm weight-norm gain)
existed must still restore — the missing leaf is default-filled rather
than failing orbax StandardRestore with a structure mismatch.
"""

from typing import NamedTuple

import jax
import numpy as np
import pytest

from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
from phones_las_tpu.train.checkpoint import CheckpointManager
from phones_las_tpu.train.state import TrainConfig, create_train_state


def _cfg():
    return LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=8),
        speller=SpellerConfig(
            vocab_size=10, embedding_dim=4, num_layers=1, units=8,
            memory_dim=16, attention_type="bahdanau_norm",
            attention_units=8, attention_layer_size=8,
        ),
    )


class _LegacyAttn(NamedTuple):
    """Pre-``g`` AttentionParams layout (5 fields, no gain)."""

    wq: object
    wk: object
    v: object
    b: object
    score_bias: object


def _strip_g(tree):
    """Simulate a pre-``g`` checkpoint: rebuild every AttentionParams as
    the legacy 5-field layout, so the on-disk dict has no ``g`` key."""

    def walk(node):
        if hasattr(node, "_fields"):
            kw = {f: walk(getattr(node, f)) for f in node._fields}
            if "g" in kw and "v" in kw:  # AttentionParams
                kw.pop("g")
                return _LegacyAttn(**kw)
            return type(node)(**kw)
        if isinstance(node, tuple):
            return tuple(walk(x) for x in node)
        return node

    return walk(tree)


def test_restore_fills_missing_weight_norm_gain(tmp_path):
    wd = str(tmp_path / "run")
    state = create_train_state(jax.random.PRNGKey(0), _cfg(), TrainConfig())
    assert state.params.speller.attention.g is not None

    legacy = _strip_g(state)
    mgr = CheckpointManager(wd, save_every=1)
    mgr.save(7, legacy, force=True)
    mgr.wait()

    restored, epoch = mgr.restore(state)
    mgr.close()
    assert epoch == 0

    # params.g default-filled with the init value sqrt(1/attn_units)
    g = restored.params.speller.attention.g
    np.testing.assert_allclose(
        np.asarray(g), np.sqrt(1.0 / 8), rtol=1e-6
    )
    # Adam moment mirrors default-filled with zeros
    adam = restored.opt_state[1]  # (clip, adam, schedule) chain
    np.testing.assert_allclose(np.asarray(adam.mu.speller.attention.g), 0.0)
    np.testing.assert_allclose(np.asarray(adam.nu.speller.attention.g), 0.0)
    # every other leaf survives untouched
    np.testing.assert_allclose(
        np.asarray(restored.params.speller.attention.v),
        np.asarray(state.params.speller.attention.v),
    )
    np.testing.assert_allclose(
        np.asarray(restored.step), np.asarray(state.step)
    )


class _BogusAttn(NamedTuple):
    """An attention layout missing a NON-migratable field (``wk``)."""

    wq: object
    v: object
    b: object
    score_bias: object
    g: object


def test_restore_still_fails_on_unknown_structure_gap(tmp_path):
    """Only ``g`` is migratable; any other missing field fails loudly."""
    wd = str(tmp_path / "run")
    state = create_train_state(jax.random.PRNGKey(0), _cfg(), TrainConfig())

    def drop_wk(node):
        if hasattr(node, "_fields"):
            kw = {f: drop_wk(getattr(node, f)) for f in node._fields}
            if "g" in kw and "v" in kw and "wk" in kw:
                kw.pop("wk")
                return _BogusAttn(**kw)
            return type(node)(**kw)
        if isinstance(node, tuple):
            return tuple(drop_wk(x) for x in node)
        return node

    mgr = CheckpointManager(wd, save_every=1)
    mgr.save(1, drop_wk(state), force=True)
    mgr.wait()
    with pytest.raises(Exception):
        mgr.restore(state)
    mgr.close()
