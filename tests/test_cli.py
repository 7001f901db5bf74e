"""CLI end-to-end: prepare synthetic → train 2 steps → infer with PER."""

import os

from phones_las_tpu.cli import infer as infer_cli
from phones_las_tpu.cli import prepare as prepare_cli
from phones_las_tpu.cli import train as train_cli

import pytest

pytestmark = pytest.mark.slow


def test_cli_roundtrip(tmp_path, capsys):
    data = str(tmp_path / "data")
    wd = str(tmp_path / "run")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "12", "--n-phones", "5"])
    assert os.path.exists(os.path.join(data, "cmvn.json"))

    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "4",
    ])
    assert os.path.exists(os.path.join(wd, "config.json"))

    aligns_dir = os.path.join(wd, "aligns")
    infer_cli.main(["--workdir", wd, "--data", os.path.join(data, "test.plu"),
                    "--batch-size", "4", "--dump-alignments", aligns_dir])
    out = capsys.readouterr().out
    assert "PER=" in out
    assert "synth-" in out
    import glob

    assert glob.glob(os.path.join(aligns_dir, "*.png"))


def test_cli_monotonic_hard_decode(tmp_path, capsys):
    """Train with *_monotonic attention, decode with the test-time hard
    mode via --monotonic-mode hard (TF mode='hard' parity): the override
    is decode-time only, so the checkpoint restores unchanged."""
    data = str(tmp_path / "data")
    wd = str(tmp_path / "run")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "12",
                      "--n-phones", "5"])
    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "4",
        "--attention-type", "bahdanau_monotonic",
        "--encoder-units", "16", "--decoder-units", "16",
        "--embedding-dim", "8", "--attention-units", "16",
    ])
    infer_cli.main(["--workdir", wd, "--data", os.path.join(data, "test.plu"),
                    "--batch-size", "4", "--monotonic-mode", "hard"])
    out = capsys.readouterr().out
    assert "PER=" in out


def test_transcribe_cli(tmp_path, capsys):
    import numpy as np

    from phones_las_tpu.cli import transcribe as transcribe_cli
    from phones_las_tpu.data.audio_io import write_wav

    data = str(tmp_path / "data")
    wd = str(tmp_path / "run")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "12", "--n-phones", "5"])
    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "4",
    ])

    rs = np.random.RandomState(0)
    wavs = []
    for i, n in enumerate((9000, 12000)):
        p = str(tmp_path / f"clip{i}.wav")
        write_wav(p, (rs.randn(n) * 2000).astype(np.int16))
        wavs.append(p)

    transcribe_cli.main(["--workdir", wd] + wavs)
    out = capsys.readouterr().out
    assert all(w in out for w in wavs) and out.count("\t") == 2

    # long-form path on a >window clip
    long_wav = str(tmp_path / "long.wav")
    write_wav(long_wav, (rs.randn(40000) * 2000).astype(np.int16))
    out_tsv = str(tmp_path / "hyp.tsv")
    transcribe_cli.main([
        "--workdir", wd, "--long-form", "--window-seconds", "1.5",
        "--overlap-seconds", "0.5", "--output", out_tsv, long_wav,
    ])
    line = open(out_tsv).read().strip()
    assert line.startswith(long_wav + "\t")
