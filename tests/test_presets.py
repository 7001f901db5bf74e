"""Preset binding: resolve_preset wires vocab sizes, binf codes, CMVN,
and special ids into each BASELINE.json config preset."""

import os

import numpy as np
import pytest

from phones_las_tpu.cli.common import resolve_preset, timit_score_fold
from phones_las_tpu.data.ipa import BINF_FEATURES
from phones_las_tpu.data.vocab import Vocab
from phones_las_tpu.frontend.cmvn import CmvnStats
from phones_las_tpu.utils.config import PRESETS


@pytest.fixture()
def data_dir(tmp_path):
    d = str(tmp_path)
    Vocab(["a", "ʃ", "i", "sil"]).save(os.path.join(d, "vocab.txt"))
    Vocab(list("abc") + ["<space>"]).save(os.path.join(d, "grapheme_vocab.txt"))
    stats = CmvnStats.zeros(120)
    stats.update(np.random.RandomState(0).randn(50, 120))
    stats.save(os.path.join(d, "cmvn.json"))
    return d


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_resolve_all_presets(name, data_dir):
    preset, vocab, gvocab, cmvn, codes = resolve_preset(
        name, data_dir, {"batch_size": 4, "num_steps": 7}
    )
    sp = preset.model.speller
    assert sp.vocab_size == len(vocab) == 8
    assert sp.bos_id == vocab.sos_id and sp.eos_id == vocab.eos_id
    assert sp.memory_dim == 2 * preset.model.listener.units
    assert preset.pipeline.batch_size == 4
    assert preset.train.num_steps == 7
    assert cmvn is not None and cmvn.count == 50
    if sp.binf_mode != "none":
        assert codes is not None and codes.shape == (len(vocab), len(BINF_FEATURES))
        assert sp.num_binf == len(BINF_FEATURES)
    g = preset.model.grapheme_speller
    if g is not None:
        assert g.vocab_size == len(gvocab)
        assert preset.pipeline.max_grapheme_len > 0


def test_model_hyperparameter_overrides(data_dir):
    preset, *_ = resolve_preset(
        "timit_multitask", data_dir,
        {
            "encoder_layers": 4, "encoder_units": 128, "decoder_units": 96,
            "attention_type": "luong", "attention_units": 96,
            "dropout": 0.3, "sampling_probability": 0.25,
            "multitask_weight": 0.7, "clip_norm": 1.0,
        },
    )
    m = preset.model
    assert m.listener.num_layers == 4 and m.listener.units == 128
    assert m.listener.dropout == 0.3
    assert m.speller.units == 96 and m.speller.attention_type == "luong"
    assert m.speller.attention_units == 96
    assert m.speller.sampling_probability == 0.25
    # encoder width change propagates to both heads' memory dims
    assert m.speller.memory_dim == 256
    assert m.grapheme_speller.memory_dim == 256
    assert m.multitask_weight == 0.7
    assert preset.train.clip_norm == 1.0

    with pytest.raises(ValueError, match="unknown config override"):
        resolve_preset("timit_phone_las", data_dir, {"bogus_key": 1})


def test_monotonic_overrides_route_to_speller(data_dir):
    preset, *_ = resolve_preset(
        "timit_phone_las", data_dir,
        {
            "attention_type": "bahdanau_monotonic",
            "monotonic_mode": "hard",
            "monotonic_noise": 3.0,
        },
    )
    sp = preset.model.speller
    assert sp.attention_type == "bahdanau_monotonic"
    assert sp.monotonic_mode == "hard"
    assert sp.monotonic_noise == 3.0


def test_timit_fold_ids(data_dir):
    vocab = Vocab(["a", "ʃ", "i", "sil"])
    fold = timit_score_fold(vocab, output_ipa=True)
    # ʒ→ʃ not in vocab (ʒ absent) — folds present only for in-vocab pairs;
    # q (ʔ) deletion requires ʔ in vocab, absent here
    for src, dst in fold.items():
        assert 0 <= src < len(vocab)
        assert dst is None or 0 <= dst < len(vocab)
