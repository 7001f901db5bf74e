"""Corpus prep end-to-end on synthesized mini corpora: TIMIT (sphere),
LibriSpeech (FLAC via the test encoder), Common Voice (wav clips)."""

import os

import numpy as np
import pytest

from phones_las_tpu.data import audio_io
from phones_las_tpu.data.records import RecordReader
from phones_las_tpu.data.vocab import Vocab
from phones_las_tpu.data.timit import prepare_timit
from phones_las_tpu.data.librispeech import prepare_librispeech
from phones_las_tpu.data.common_voice import prepare_common_voice
from phones_las_tpu.frontend.cmvn import CmvnStats
from tests.flac_encoder import encode_flac
from tests.test_audio_io import _write_sphere


def _pcm(n=8000, seed=0):
    return (np.random.RandomState(seed).randn(n) * 2000).astype(np.int16)


def test_prepare_timit(tmp_path):
    root = tmp_path / "TIMIT"
    for split in ("TRAIN", "TEST"):
        d = root / split / "DR1" / "FABC0"
        d.mkdir(parents=True)
        for i, utt in enumerate(["SI1", "SX2", "SA1"]):
            _write_sphere(str(d / f"{utt}.WAV"), _pcm(seed=i))
            (d / f"{utt}.PHN").write_text(
                "0 1000 h#\n1000 3000 sh\n3000 5000 iy\n5000 8000 h#\n"
            )
            (d / f"{utt}.TXT").write_text("0 8000 She is.\n")
    out = tmp_path / "out"
    counts = prepare_timit(str(root), str(out), output_ipa=True, log=lambda *a: None)
    assert counts == {"train": 2, "test": 2}  # SA excluded
    vocab = Vocab.load(str(out / "vocab.txt"))
    r = RecordReader(str(out / "train.plu"))
    u = r[0]
    assert vocab.decode(u.targets) == ["sil", "ʃ", "i", "sil"]
    assert u.grapheme_targets is not None
    g = Vocab.load(str(out / "grapheme_vocab.txt"))
    assert g.decode(u.grapheme_targets) == ["s", "h", "e", "<space>", "i", "s"]
    stats = CmvnStats.load(str(out / "cmvn.json"))
    assert stats.count > 0 and np.isfinite(stats.mean).all()


def test_prepare_librispeech(tmp_path):
    if audio_io._native() is None:
        pytest.skip("no C++ compiler for FLAC")
    root = tmp_path / "LibriSpeech"
    d = root / "train-clean-100" / "19" / "198"
    d.mkdir(parents=True)
    trans = []
    for i in range(3):
        uid = f"19-198-{i:04d}"
        with open(d / f"{uid}.flac", "wb") as f:
            f.write(encode_flac(_pcm(seed=i), mode="fixed2"))
        trans.append(f"{uid} HELLO WORLD {i}")
    (d / "19-198.trans.txt").write_text("\n".join(trans) + "\n")
    out = tmp_path / "out"
    counts = prepare_librispeech(
        str(root), str(out), splits=("train-clean-100",), log=lambda *a: None
    )
    assert counts == {"train-clean-100": 3}
    vocab = Vocab.load(str(out / "vocab.txt"))
    r = RecordReader(str(out / "train-clean-100.plu"))
    assert vocab.decode(r[0].targets) == list("hello") + ["<space>"] + list("world")
    assert r[0].text == "HELLO WORLD 0"


def test_prepare_common_voice(tmp_path):
    root = tmp_path / "cv"
    for lang, sents in [("es", ["hola mundo", "buenos días"]), ("it", ["ciao"])]:
        d = root / lang / "clips"
        d.mkdir(parents=True)
        rows = ["client_id\tpath\tsentence"]
        for i, s in enumerate(sents):
            name = f"clip{i}.mp3"
            audio_io.write_wav(str(d / f"clip{i}.wav"), _pcm(seed=i))
            rows.append(f"c{i}\t{name}\t{s}")
        (root / lang / "validated.tsv").write_text("\n".join(rows) + "\n")
    out = tmp_path / "out"
    counts = prepare_common_voice(
        str(root), str(out), langs=["es", "it"], log=lambda *a: None
    )
    assert counts == {"es": 2, "it": 1}
    vocab = Vocab.load(str(out / "vocab.txt"))
    r = RecordReader(str(out / "es.plu"))
    # "hola mundo" → o l a m u n d o  (h silent in Spanish)
    assert vocab.decode(r[0].targets) == ["o", "l", "a", "m", "u", "n", "d", "o"]
    # shared vocab covers Italian affricate from "ciao"
    assert "tʃ" in vocab.tokens


def test_g2p_langs():
    from phones_las_tpu.data.g2p import text_to_ipa

    assert text_to_ipa("che", "it") == ["k", "e"]
    assert text_to_ipa("the cat", "en") == ["ð", "ə", "k", "æ", "t"]
    assert text_to_ipa("schön", "de") == ["ʃ", "ø", "n"]
