"""AOT export: the serialized StableHLO artifact reproduces the live
Transcriber's tokens without touching model code or the checkpoint."""

import os

import numpy as np
import pytest

from phones_las_tpu.api import Transcriber
from phones_las_tpu.cli import export as export_cli
from phones_las_tpu.cli import prepare as prepare_cli
from phones_las_tpu.cli import train as train_cli
from phones_las_tpu.export import ExportedTranscriber

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("export")
    data, wd = str(root / "d"), str(root / "w")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "10",
                      "--n-phones", "4"])
    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "4",
        "--encoder-layers", "2", "--encoder-units", "16",
        "--decoder-units", "16", "--embedding-dim", "8",
        "--attention-units", "16",
    ])
    return wd


def test_export_roundtrip(workdir, tmp_path):
    out = str(tmp_path / "exp")
    export_cli.main([
        "--workdir", workdir, "--out", out,
        "--batch-sizes", "2,4", "--pad-seconds", "1",
    ])
    assert os.path.exists(os.path.join(out, "export.json"))

    t = Transcriber(workdir)
    e = ExportedTranscriber(out)
    assert e.sample_rate == 16000

    rs = np.random.RandomState(0)
    clips = [
        (rs.randn(6000 + 1000 * i) * 2000).astype(np.int16) for i in range(3)
    ]
    live = t.transcribe_batch(clips)
    assert e.transcribe_batch(clips) == live
    # single clip lands on the b=2 program, same result
    assert e.transcribe(clips[0]) == live[0]
    # float input at PCM scale is quantized to int16 and still decodes
    assert isinstance(e.transcribe(clips[0].astype(np.float32)), list)

    # requests beyond every exported shape fail loudly, not silently
    with pytest.raises(AssertionError):
        e.transcribe_batch([clips[0]] * 5)
    with pytest.raises(AssertionError):
        e.transcribe((rs.randn(40000) * 2000).astype(np.int16))


def test_export_cross_platform(workdir, tmp_path):
    """A tpu+cpu artifact forces the XLA implementation (Pallas only
    lowers for TPU) and still calls correctly on the CPU backend."""
    from phones_las_tpu.export import export_model

    out = str(tmp_path / "exp_xp")
    meta = export_model(
        workdir, out, batch_sizes=[2], pad_seconds=[1.0],
        platforms=["tpu", "cpu"],
    )
    assert meta["platforms"] == ["tpu", "cpu"]
    rs = np.random.RandomState(2)
    clip = (rs.randn(9000) * 2000).astype(np.int16)
    assert (
        ExportedTranscriber(out).transcribe(clip)
        == Transcriber(workdir).transcribe(clip)
    )


def test_export_beam(workdir, tmp_path):
    out = str(tmp_path / "exp_beam")
    export_cli.main([
        "--workdir", workdir, "--out", out,
        "--batch-sizes", "2", "--pad-seconds", "1", "--beam-width", "2",
    ])
    rs = np.random.RandomState(1)
    clip = (rs.randn(9000) * 2000).astype(np.int16)
    live = Transcriber(workdir, beam_width=2).transcribe(clip)
    assert ExportedTranscriber(out).transcribe(clip) == live


def test_export_beam_with_lm(workdir, tmp_path):
    # the fused LM table is a trace constant → the artifact carries it
    import json

    from phones_las_tpu.cli import lm as lm_cli

    data = json.load(open(os.path.join(workdir, "config.json")))["data"]
    lm_path = str(tmp_path / "lm.npz")
    lm_cli.main(["--data", data, "--out", lm_path, "--order", "2"])

    out = str(tmp_path / "exp_lm")
    export_cli.main([
        "--workdir", workdir, "--out", out,
        "--batch-sizes", "2", "--pad-seconds", "1", "--beam-width", "2",
        "--lm", lm_path, "--lm-weight", "0.5",
    ])
    rs = np.random.RandomState(2)
    clip = (rs.randn(9000) * 2000).astype(np.int16)
    live = Transcriber(
        workdir, beam_width=2, lm=lm_path, lm_weight=0.5
    ).transcribe(clip)
    assert ExportedTranscriber(out).transcribe(clip) == live
