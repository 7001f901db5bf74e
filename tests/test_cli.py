"""CLI end-to-end: prepare synthetic → train 2 steps → infer with PER."""

import os

from phones_las_tpu.cli import infer as infer_cli
from phones_las_tpu.cli import prepare as prepare_cli
from phones_las_tpu.cli import train as train_cli


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
