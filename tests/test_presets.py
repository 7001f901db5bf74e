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


def test_timit_fold_ids(data_dir):
    vocab = Vocab(["a", "ʃ", "i", "sil"])
    fold = timit_score_fold(vocab, output_ipa=True)
    # ʒ→ʃ not in vocab (ʒ absent) — folds present only for in-vocab pairs;
    # q (ʔ) deletion requires ʔ in vocab, absent here
    for src, dst in fold.items():
        assert 0 <= src < len(vocab)
        assert dst is None or 0 <= dst < len(vocab)
