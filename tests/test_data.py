"""Data layer tests: records round-trip, vocab, bucketing, binf/IPA maps."""

import numpy as np

from phones_las_tpu.data import (
    ARPABET_TO_IPA,
    BINF_FEATURES,
    RecordReader,
    RecordWriter,
    Utterance,
    Vocab,
    binf_matrix,
    fold_timit,
    phone_to_binf,
)
from phones_las_tpu.data.pipeline import DataSource, PipelineConfig


def test_records_roundtrip(tmp_path):
    path = str(tmp_path / "x.plu")
    utts = [
        Utterance("a", np.arange(100, dtype=np.int16), np.asarray([4, 5, 6], np.int32)),
        Utterance(
            "b", (np.ones(50) * -3).astype(np.int16), np.asarray([7], np.int32),
            grapheme_targets=np.asarray([8, 9], np.int32), text="hi",
        ),
    ]
    with RecordWriter(path, meta={"sample_rate": 16000}) as w:
        for u in utts:
            w.write(u)
    r = RecordReader(path)
    assert len(r) == 2 and r.meta["sample_rate"] == 16000
    got = r[1]
    assert got.utt_id == "b" and got.text == "hi"
    np.testing.assert_array_equal(got.audio, utts[1].audio)
    np.testing.assert_array_equal(got.grapheme_targets, [8, 9])
    np.testing.assert_array_equal(r.lengths(), [[100, 3, 0], [50, 1, 2]])


def test_vocab(tmp_path):
    v = Vocab(["a", "b", "c"])
    assert len(v) == 7 and v.encode(["b", "zz"]) == [5, v.unk_id]
    assert v.decode([5, v.eos_id, 4]) == ["b", "a"]
    p = str(tmp_path / "v.txt")
    v.save(p)
    assert Vocab.load(p).tokens == v.tokens


def test_bucketed_batching(tmp_path):
    cfg = PipelineConfig(
        batch_size=2, buckets=(100, 200), max_target_len=5,
        drop_remainder=False, shuffle=False,
    )
    path = str(tmp_path / "b.plu")
    with RecordWriter(path) as w:
        for i, n in enumerate([50, 150, 90, 250, 160]):
            w.write(
                Utterance(f"u{i}", np.zeros(n, np.int16), np.asarray([4] * 2, np.int32))
            )
    batches = list(DataSource([path], cfg, use_native="never").epoch(0))
    # 250 dropped (drop_too_long); bucket0: u0,u2 (full); bucket1: u1,u4 (full)
    assert len(batches) == 2
    shapes = sorted(b["audio"].shape for b in batches)
    assert shapes == [(2, 100), (2, 200)]
    b0 = [b for b in batches if b["audio"].shape[1] == 100][0]
    assert b0["utt_ids"] == ["u0", "u2"]
    assert b0["target_lengths"].tolist() == [3, 3]  # 2 phones + eos
    assert b0["targets"][0].tolist() == [4, 4, cfg.eos_id, 0, 0]


def test_binf_features_sanity():
    # every TIMIT phone maps to IPA and gets a non-degenerate feature vector
    ipa_phones = sorted(set(ARPABET_TO_IPA.values()))
    mat = binf_matrix(ipa_phones)
    assert mat.shape == (len(ipa_phones), len(BINF_FEATURES))
    sil = ipa_phones.index("sil")
    assert mat[sil].sum() == 1.0  # silence-only
    # voiced/voiceless pairs differ exactly in 'voice'
    fidx = {f: i for i, f in enumerate(BINF_FEATURES)}
    for a, c in [("b", "p"), ("d", "t"), ("z", "s"), ("ʒ", "ʃ"), ("ð", "θ")]:
        va, vc = binf_matrix([a])[0], binf_matrix([c])[0]
        diff = np.nonzero(va != vc)[0]
        assert diff.tolist() == [fidx["voiced"]], (a, c, [BINF_FEATURES[i] for i in diff])
    # vowels are syllabic sonorants
    v = binf_matrix(["i"])[0]
    assert v[fidx["vowel"]] and v[fidx["syllabic"]] and v[fidx["sonorant"]]
    # nasalized diacritic works
    assert "nasal" in phone_to_binf("ɾ̃")


def test_timit_fold():
    assert fold_timit(["ix", "q", "zh", "h#", "iy"]) == ["ih", "sh", "sil", "iy"]


def test_pipeline_producer_exception_propagates(tmp_path):
    """A crashed reader must not look like a completed epoch (the
    producer thread forwards its exception to the consumer)."""
    import pytest

    from phones_las_tpu.data.synthetic import write_synth_corpus

    path, vocab = write_synth_corpus(str(tmp_path / "t.plu"), n_utts=8)
    pipe = PipelineConfig(batch_size=4, buckets=(24000,), max_target_len=12,
                          eos_id=vocab.eos_id, pad_id=vocab.pad_id)
    src = DataSource([path], pipe)

    def boom(*a, **k):
        raise RuntimeError("reader exploded")

    src._fill_batch = boom
    with pytest.raises(RuntimeError, match="reader exploded"):
        list(src.epoch(0))


def test_pipeline_abandoned_epoch_cancels_producer(tmp_path):
    """Breaking out of an epoch mid-stream must not leave the producer
    blocked on the bounded queue forever."""
    import threading
    import time

    from phones_las_tpu.data.synthetic import write_synth_corpus

    path, vocab = write_synth_corpus(str(tmp_path / "t.plu"), n_utts=32)
    pipe = PipelineConfig(batch_size=2, buckets=(24000,), max_target_len=12,
                          eos_id=vocab.eos_id, pad_id=vocab.pad_id)
    src = DataSource([path], pipe)
    before = threading.active_count()
    it = src.epoch(0, prefetch=1)
    next(it)
    it.close()  # abandon mid-epoch → cancellation event fires
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
