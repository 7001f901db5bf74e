"""Transcriber library API and beam evaluate."""

import os

import numpy as np
import pytest

from phones_las_tpu.api import Transcriber
from phones_las_tpu.cli import prepare as prepare_cli
from phones_las_tpu.cli import train as train_cli
from phones_las_tpu.data.audio_io import write_wav
from phones_las_tpu.data.pipeline import DataSource, PipelineConfig


@pytest.mark.slow
def test_transcriber_and_beam_eval(tmp_path):
    data, wd = str(tmp_path / "d"), str(tmp_path / "w")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "10", "--n-phones", "4"])
    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "4",
    ])

    t = Transcriber(wd)
    pcm = (np.random.RandomState(0).randn(9000) * 2000).astype(np.int16)
    toks = t.transcribe(pcm)
    assert isinstance(toks, list)

    wav = str(tmp_path / "a.wav")
    write_wav(wav, pcm)
    file_toks = t.transcribe_files([wav])
    assert file_toks[0] == toks

    tb = Transcriber(wd, beam_width=2)
    toks_b = tb.transcribe(pcm)
    assert isinstance(toks_b, list)

    # one-pass joint decoding requires a CTC-trained model
    import pytest

    with pytest.raises(AssertionError, match="ctc_weight"):
        Transcriber(wd, beam_width=2, ctc_joint=0.5)

    # wave dispatch: a batch larger than max_device_batch splits into
    # same-shape device programs (tail zero-padded) with identical output
    rs = np.random.RandomState(1)
    clips = [(rs.randn(6000 + 500 * i) * 2000).astype(np.int16) for i in range(5)]
    ref = Transcriber(wd).transcribe_batch(clips)
    tw = Transcriber(wd, max_device_batch=2)
    assert tw.transcribe_batch(clips) == ref and len(ref) == 5

    # beam evaluate path
    from phones_las_tpu.cli.common import resolve_preset
    from phones_las_tpu.train import Trainer

    preset, vocab, *_ = resolve_preset("timit_phone_las", data)
    import dataclasses

    pipe = dataclasses.replace(
        preset.pipeline, batch_size=4, shuffle=False, drop_remainder=False
    )
    src = DataSource([os.path.join(data, "test.plu")], pipe)
    tr = Trainer(preset.model, preset.train, workdir=wd)
    ev = tr.evaluate(src.epoch(0), max_steps=10, beam_width=2)
    assert 0.0 <= ev["per"] <= 2.0 and ev["ref_tokens"] > 0

    # forced alignment: one (token, time) per reference token, times
    # monotone-boundable within the utterance, string/id inputs agree
    ref_toks = vocab.decode(np.asarray(vocab.encode(["ph0", "ph1", "ph2"])))
    out = t.align(pcm, ref_toks)
    assert [tok for tok, _ in out] == ref_toks
    dur = len(pcm) / t.sample_rate
    for _, tm in out:
        assert 0.0 <= tm <= dur + 0.1
    out_ids = t.align(pcm, np.asarray(vocab.encode(ref_toks), np.int32))
    assert [tm for _, tm in out_ids] == [tm for _, tm in out]
