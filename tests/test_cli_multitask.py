"""Multitask CLI path: train with grapheme head, infer both heads."""

import os

import numpy as np

from phones_las_tpu.cli import infer as infer_cli
from phones_las_tpu.cli import train as train_cli
from phones_las_tpu.data.prep_common import finalize_split_dir
from phones_las_tpu.data.records import RecordWriter, Utterance
from phones_las_tpu.data.synthetic import synth_utterance
from phones_las_tpu.data.vocab import Vocab

import pytest

pytestmark = pytest.mark.slow


def _write_corpus(out, n=10):
    os.makedirs(out, exist_ok=True)
    vocab = Vocab([f"ph{i}" for i in range(5)])
    gvocab = Vocab(list("abcde"))
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        with RecordWriter(os.path.join(out, f"{split}.plu"), meta={"corpus": "synthetic"}) as w:
            for i in range(n):
                u = synth_utterance(rng, vocab, f"{split}-{i}")
                u.grapheme_targets = np.asarray(
                    gvocab.encode([gvocab.real_tokens[t % 5] for t in range(len(u.targets))]),
                    np.int32,
                )
                w.write(u)
    finalize_split_dir(out, vocab, grapheme_vocab=gvocab,
                       cmvn_from=os.path.join(out, "train.plu"),
                       meta={"corpus": "synthetic"})


def test_multitask_cli(tmp_path, capsys):
    data, wd = str(tmp_path / "d"), str(tmp_path / "w")
    _write_corpus(data)
    train_cli.main([
        "--preset", "timit_multitask", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "4",
    ])
    infer_cli.main(["--workdir", wd, "--data", os.path.join(data, "test.plu"),
                    "--batch-size", "4"])
    out1 = capsys.readouterr().out
    assert "PER=" in out1
    infer_cli.main(["--workdir", wd, "--data", os.path.join(data, "test.plu"),
                    "--batch-size", "4", "--head", "grapheme"])
    out2 = capsys.readouterr().out
    assert "PER=" in out2
