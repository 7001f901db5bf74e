"""Native C++ record reader vs the pure-Python fill: identical batches."""

import numpy as np
import pytest

from phones_las_tpu.data.pipeline import DataSource, PipelineConfig
from phones_las_tpu.data.records import RecordWriter, Utterance


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for f in range(2):
        p = str(tmp_path / f"part{f}.plu")
        with RecordWriter(p, meta={"sample_rate": 16000}) as w:
            for i in range(9):
                n = rng.randint(50, 400)
                w.write(
                    Utterance(
                        f"u{f}-{i}",
                        (rng.randn(n) * 1000).astype(np.int16),
                        rng.randint(4, 20, rng.randint(1, 12)).astype(np.int32),
                        grapheme_targets=rng.randint(4, 30, rng.randint(1, 9)).astype(np.int32),
                    )
                )
        paths.append(p)
    return paths


def test_native_matches_python(corpus):
    from phones_las_tpu.data.native_records import NativeRecordReader

    if not NativeRecordReader.available():
        pytest.skip("no C++ compiler")
    cfg = PipelineConfig(
        batch_size=4, buckets=(128, 256, 512), max_target_len=8,
        max_grapheme_len=6, drop_remainder=False, shuffle=True, seed=3,
    )
    nat = DataSource(corpus, cfg, use_native="auto")
    assert nat.native is not None
    py = DataSource(corpus, cfg, use_native="never")

    nb = list(nat.epoch(1))
    pb = list(py.epoch(1))
    assert len(nb) == len(pb) > 0
    for a, b in zip(nb, pb):
        assert a["utt_ids"] == b["utt_ids"]
        assert a["num_real"] == b["num_real"]
        for k in ("audio", "audio_lengths", "targets", "target_lengths",
                  "grapheme_targets", "grapheme_lengths"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_threaded_fill_matches_serial(corpus):
    from phones_las_tpu.data.native_records import NativeRecordReader

    if not NativeRecordReader.available():
        pytest.skip("no C++ compiler")
    r = NativeRecordReader(corpus[0])
    idx = np.asarray([0, 3, 8, 1, 1, 7], np.int64)
    b, s, l, g = len(idx), 512, 8, 6

    def fill(n_threads):
        audio = np.full((b, s), 7, np.int16)
        alen = np.zeros(b, np.int32)
        tgt = np.zeros((b, l), np.int32)
        tlen = np.zeros(b, np.int32)
        gra = np.zeros((b, g), np.int32)
        glen = np.zeros(b, np.int32)
        r.read_batch(idx, audio, alen, tgt, tlen, eos_id=2, pad_id=0,
                     graphemes=gra, grapheme_lengths=glen,
                     n_threads=n_threads)
        return audio, alen, tgt, tlen, gra, glen

    serial = fill(1)
    for nt in (2, 4, 16):  # 16 > batch exercises the clamp
        for a, b_ in zip(serial, fill(nt)):
            np.testing.assert_array_equal(a, b_)

    # errors surface from worker threads too
    bad = np.asarray([0, 10**6], np.int64)
    audio = np.zeros((2, s), np.int16)
    alen = np.zeros(2, np.int32)
    tgt = np.zeros((2, l), np.int32)
    tlen = np.zeros(2, np.int32)
    with pytest.raises(ValueError, match="bad record index"):
        r.read_batch(bad, audio, alen, tgt, tlen, eos_id=2, pad_id=0,
                     n_threads=4)
    r.close()


def test_native_lengths(corpus):
    from phones_las_tpu.data.native_records import NativeRecordReader
    from phones_las_tpu.data.records import RecordReader

    if not NativeRecordReader.available():
        pytest.skip("no C++ compiler")
    for p in corpus:
        np.testing.assert_array_equal(
            NativeRecordReader(p).lengths(), RecordReader(p).lengths()
        )
