"""Speech-like hard corpus (``data/speechlike.py``): determinism,
signal sanity, phonotactic structure, and pipeline ingestion."""

import collections

import numpy as np
import pytest

from phones_las_tpu.data.speechlike import (
    CONSONANTS,
    GLIDES,
    PHONE_SPECS,
    VOWELS,
    make_phonotactics,
    sample_sentence,
    speechlike_grapheme_inventory,
    speechlike_phone_inventory,
    synth_speech_utterance,
    write_speechlike_corpus,
)
from phones_las_tpu.data.vocab import Vocab


def _vocab():
    return Vocab(speechlike_phone_inventory())


def test_deterministic_given_seed(tmp_path):
    a = synth_speech_utterance(
        np.random.RandomState(7), _vocab(), "u", model=make_phonotactics()
    )
    b = synth_speech_utterance(
        np.random.RandomState(7), _vocab(), "u", model=make_phonotactics()
    )
    np.testing.assert_array_equal(a.audio, b.audio)
    np.testing.assert_array_equal(a.targets, b.targets)


def test_every_phone_is_ipa_with_binf_features():
    from phones_las_tpu.data.ipa import binf_matrix

    mat = binf_matrix(speechlike_phone_inventory())
    assert mat.shape[0] == len(PHONE_SPECS)
    # every phone gets a non-degenerate feature vector, and no two
    # phones collide (the binf head can in principle separate them)
    assert (mat.sum(1) > 0).all()
    assert len({tuple(r) for r in np.asarray(mat)}) == mat.shape[0]


def test_phonotactics_are_nonuniform_and_shared_across_seeds():
    model = make_phonotactics()
    rng = np.random.RandomState(0)
    counts = collections.Counter()
    for _ in range(1500):
        counts.update(sample_sentence(rng, model))
    # all phones reachable…
    assert set(counts) == set(PHONE_SPECS)
    # …but decidedly nonuniform (the LM-fusion precondition): the most
    # frequent phone is ≥3× the least frequent
    freq = np.array([counts[p] for p in PHONE_SPECS])
    assert freq.max() >= 3 * freq.min()
    # the model is a pure function of its seed (train/test share it)
    m2 = make_phonotactics()
    np.testing.assert_array_equal(model.onset_p, m2.onset_p)
    np.testing.assert_array_equal(model.nucleus_affinity, m2.nucleus_affinity)


def test_vowel_spectra_track_formants():
    """Vowel energy must land where each vowel's formants are: /i,u/ have
    low F1 (~270/300 Hz) vs /a/'s 850 Hz; /a,u/ have F1/F2 in 500–1100 Hz
    where /i/ has nothing; /i/'s F2 (2290 Hz) dominates 2–3 kHz."""
    vocab, model = _vocab(), make_phonotactics()

    def band_fracs(phone):
        rng = np.random.RandomState(3)
        u = synth_speech_utterance(
            rng, vocab, "x", model=model, phones=[phone] * 3,
            snr_db_range=(40.0, 40.0),
        )
        x = u.audio.astype(np.float64)
        mid = x[len(x) // 3:2 * len(x) // 3]
        spec = np.abs(np.fft.rfft(mid)) ** 2
        f = np.fft.rfftfreq(len(mid), 1.0 / 16000)
        tot = spec.sum()
        return tuple(
            float(spec[(f >= lo) & (f < hi)].sum() / tot)
            for lo, hi in ((0, 500), (500, 1100), (2000, 3000))
        )

    i, a, u = band_fracs("i"), band_fracs("a"), band_fracs("u")
    assert i[0] > 10 * a[0] and u[0] > 10 * a[0], (i, a, u)  # F1 low vs high
    assert a[1] > 10 * i[1] and u[1] > 10 * i[1], (i, a, u)  # mid band
    assert i[2] > 1.5 * a[2] and i[2] > 1.5 * u[2], (i, a, u)  # /i/ F2


def test_fricatives_separate_by_band():
    vocab, model = _vocab(), make_phonotactics()

    def hf_ratio(phone):
        rng = np.random.RandomState(5)
        u = synth_speech_utterance(
            rng, vocab, "x", model=model, phones=[phone] * 3,
            snr_db_range=(40.0, 40.0),
        )
        x = u.audio.astype(np.float64)
        spec = np.abs(np.fft.rfft(x)) ** 2
        f = np.fft.rfftfreq(len(x), 1.0 / 16000)
        return float(spec[f > 4000].sum() / spec.sum())

    assert hf_ratio("s") > hf_ratio("ʃ") > hf_ratio("m")


def test_snr_and_speaker_variation_change_audio():
    vocab, model = _vocab(), make_phonotactics()
    rng = np.random.RandomState(11)
    seq = ["t", "a", "s", "i"]
    u1 = synth_speech_utterance(rng, vocab, "a", model=model, phones=seq)
    u2 = synth_speech_utterance(rng, vocab, "b", model=model, phones=seq)
    assert u1.num_samples != u2.num_samples or not np.array_equal(
        u1.audio, u2.audio
    )


def test_corpus_roundtrip_through_pipeline(tmp_path):
    from phones_las_tpu.data.records import RecordReader

    path = str(tmp_path / "train.plu")
    _, vocab = write_speechlike_corpus(path, n_utts=6, seed=0)
    utts = list(RecordReader(path))
    assert len(utts) == 6
    for u in utts:
        assert u.audio.dtype == np.int16 and u.num_samples > 1600
        assert 0 < len(u.targets) and u.text
        assert vocab.decode(u.targets) == u.text.split()


def test_grapheme_targets_use_transliteration(tmp_path):
    path = str(tmp_path / "g.plu")
    from phones_las_tpu.data.records import RecordReader

    write_speechlike_corpus(path, n_utts=3, seed=2, graphemes=True)
    gvocab = Vocab(speechlike_grapheme_inventory())
    u = next(iter(RecordReader(path)))
    decoded = "".join(gvocab.decode(u.grapheme_targets))
    want = "|".join(PHONE_SPECS[p].translit for p in u.text.split())
    assert decoded == want


def test_word_error_stats():
    """WER over word-break-separated token streams: substitutions and
    deletions count whole words; identical streams score 0."""
    import numpy as np

    from phones_las_tpu.train.metrics import word_error_stats

    SEP = 9
    ref = np.array([[1, 2, SEP, 3, 4, SEP, 5, 0]])
    rl = np.array([7])
    # identical
    d, n = word_error_stats(ref, rl, ref, rl, SEP)
    assert (d, n) == (0, 3)
    # one word substituted ([3,4] -> [3,7]), one deleted
    hyp = np.array([[1, 2, SEP, 3, 7, 0, 0, 0]])
    d, n = word_error_stats(hyp, np.array([5]), ref, rl, SEP)
    assert (d, n) == (2, 3)
    # leading/trailing/double separators produce no empty words
    hyp2 = np.array([[SEP, 1, 2, SEP, SEP, 3, 4, SEP]])
    ref2 = np.array([[1, 2, SEP, 3, 4, 0, 0, 0]])
    d, n = word_error_stats(hyp2, np.array([8]), ref2, np.array([5]), SEP)
    assert (d, n) == (0, 2)


def test_sentence_mode_pauses_are_silent_and_unlabeled():
    """word_syllables groups syllables into words separated by PAUSE
    markers; pauses synthesize as near-silence and never appear in
    targets/text, and utterances reach the long (multi-second) regime."""
    import numpy as np

    from phones_las_tpu.data.speechlike import (
        PAUSE,
        make_phonotactics,
        sample_sentence,
        synth_speech_utterance,
        speechlike_phone_inventory,
    )
    from phones_las_tpu.data.vocab import Vocab

    model = make_phonotactics()
    rng = np.random.RandomState(7)
    seq = sample_sentence(rng, model, (30, 40), word_syllables=(2, 4))
    assert seq.count(PAUSE) >= 3
    # words are 2-4 syllables -> pauses are separated, never adjacent
    assert all(a != PAUSE or b != PAUSE for a, b in zip(seq, seq[1:]))

    vocab = Vocab(speechlike_phone_inventory())
    u = synth_speech_utterance(
        rng, vocab, "sent-0", model=model, n_syllables_range=(30, 40),
        word_syllables=(2, 4), snr_db_range=(30.0, 30.0),
    )
    assert PAUSE not in u.text.split()
    assert len(u.targets) == len(u.text.split())
    assert len(u.audio) / 16000.0 > 5.0  # long-utterance regime

    # the same explicit phone list with a pause inserted produces the
    # same label sequence and a quiet gap: pauses are audio-only
    u2 = synth_speech_utterance(
        rng, vocab, "sent-1", model=model,
        phones=["a", "s", PAUSE, "o"], snr_db_range=(60.0, 60.0),
    )
    assert u2.text == "a s o"
