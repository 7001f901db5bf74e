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


def test_native_lengths(corpus):
    from phones_las_tpu.data.native_records import NativeRecordReader
    from phones_las_tpu.data.records import RecordReader

    if not NativeRecordReader.available():
        pytest.skip("no C++ compiler")
    for p in corpus:
        np.testing.assert_array_equal(
            NativeRecordReader(p).lengths(), RecordReader(p).lengths()
        )
