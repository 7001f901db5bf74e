"""Flat-npz artifact format (utils/param_io.py): exact roundtrip, config
fidelity, loud failure on structural mismatch."""

import dataclasses

import jax
import numpy as np
import pytest

from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
from phones_las_tpu.models.las import init_las
from phones_las_tpu.utils.param_io import load_params_npz, save_params_npz


def _cfg(units=16):
    return LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=units),
        speller=SpellerConfig(
            vocab_size=12, embedding_dim=8, num_layers=1, units=units,
            memory_dim=2 * units, attention_units=16, attention_layer_size=16,
        ),
        ctc_weight=0.3,  # exercises the ctc head leaves
    )


def test_roundtrip_exact(tmp_path):
    cfg = _cfg()
    params = init_las(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "m.npz")
    save_params_npz(path, params, cfg)
    params2, cfg2 = load_params_npz(path)
    assert cfg2 == cfg
    la, lb = jax.tree.leaves(params), jax.tree.leaves(params2)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_structural_mismatch_fails_loudly(tmp_path):
    cfg = _cfg()
    params = init_las(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "m.npz")
    save_params_npz(path, params, cfg)
    # tamper: claim a different shape in the stored config
    import json

    data = dict(np.load(path, allow_pickle=False))
    d = json.loads(bytes(data["__config__"].tobytes()).decode())
    d["listener"]["units"] = 32
    data["__config__"] = np.frombuffer(
        json.dumps(d).encode(), dtype=np.uint8)
    np.savez_compressed(path, **data)
    with pytest.raises(AssertionError):
        load_params_npz(path)


def test_multitask_and_sa_config_roundtrip(tmp_path):
    from phones_las_tpu.frontend.specaugment import SpecAugmentConfig

    cfg = dataclasses.replace(
        _cfg(),
        grapheme_speller=SpellerConfig(
            vocab_size=9, embedding_dim=8, num_layers=1, units=16,
            memory_dim=32, attention_units=16, attention_layer_size=16,
        ),
        specaugment=SpecAugmentConfig(),
    )
    params = init_las(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "m.npz")
    save_params_npz(path, params, cfg)
    _, cfg2 = load_params_npz(path)
    assert cfg2 == cfg
