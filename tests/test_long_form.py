"""Long-form (sliding-window) transcription: merge semantics + an
end-to-end stitch on a trained tone model.

The reference is utterance-scoped (SURVEY.md §4.3: one decode per
TFRecord utterance); ``Transcriber.transcribe_long`` extends that to
arbitrarily long recordings via overlapping windows stitched at
attention-derived token timestamps.
"""

import numpy as np

from phones_las_tpu.api import Transcriber, merge_window_hypotheses
from phones_las_tpu.cli import prepare as prepare_cli
from phones_las_tpu.cli import train as train_cli
from phones_las_tpu.data.synthetic import synth_utterance
from phones_las_tpu.data.vocab import Vocab
from phones_las_tpu.train.metrics import _edit_distance

import pytest

pytestmark = pytest.mark.slow


def _per(hyp, ref):
    ids = {t: i for i, t in enumerate(sorted(set(hyp) | set(ref)))}
    return _edit_distance([ids[t] for t in hyp], [ids[t] for t in ref]) / len(ref)


def test_merge_window_hypotheses_cuts_at_overlap_midpoints():
    # windows: [0, 100), [80, 180), [160, 260); overlap 20
    # midpoints: 90 and 170 — each token comes from exactly one window
    per_window = [
        (np.array([1, 2, 3]), np.array([10.0, 50.0, 95.0])),   # 95 ≥ 90 → win 1's turf
        (np.array([4, 5, 6]), np.array([85.0, 120.0, 175.0])),  # keeps [90, 170) only
        (np.array([7, 8]), np.array([165.0, 200.0])),           # keeps ≥ 170 only
    ]
    merged = merge_window_hypotheses(per_window, [0, 80, 160], 20)
    assert merged == [1, 2, 5, 8]


def test_merge_single_window_passthrough():
    per_window = [(np.array([9, 9, 2]), np.array([1.0, 2.0, 3.0]))]
    assert merge_window_hypotheses(per_window, [0], 10) == [9, 9, 2]


def test_long_form_end_to_end(tmp_path):
    """Train the tone model on up-to-19-phone utterances (≈0.2–3 s), then
    stitch a ~11 s stream of 100 phones from 2.5 s windows and require the
    merged hypothesis to be close to the true phone sequence. A broken
    timestamp mapping or cut rule duplicates/drops tokens at every window
    boundary and fails the threshold immediately."""
    data, wd = str(tmp_path / "d"), str(tmp_path / "w")
    prepare_cli.main([
        "synthetic", "--out", data, "--n-utts", "256", "--n-phones", "6",
        "--max-phones-per-utt", "20",
    ])
    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "700", "--batch-size", "16", "--learning-rate", "2e-3",
        "--encoder-layers", "2", "--encoder-units", "64",
        "--decoder-units", "64", "--embedding-dim", "16",
        "--attention-units", "64", "--eval-every", "1000000000",
    ])

    t = Transcriber(wd)
    vocab = Vocab([f"ph{i}" for i in range(6)])
    utt = synth_utterance(
        np.random.RandomState(7), vocab, "long-0",
        n_phones_range=(100, 101),
    )
    ref = vocab.decode(utt.targets)
    assert len(ref) == 100

    # window sized so per-window token counts stay inside the training
    # distribution (≤19 targets ≈ ≤2 s of tones)
    hyp = t.transcribe_long(
        utt.audio, window_seconds=1.5, overlap_seconds=0.6
    )
    per = _per(hyp, ref)
    assert per <= 0.25, f"long-form PER {per:.3f}\nhyp={hyp}\nref={ref}"

    # beam-mode long form: peaks backtraced along the winning beam path
    tb = Transcriber(wd, beam_width=4)
    hyp_b = tb.transcribe_long(
        utt.audio, window_seconds=1.5, overlap_seconds=0.6
    )
    per_b = _per(hyp_b, ref)
    assert per_b <= 0.25, f"beam long-form PER {per_b:.3f}"

    # legacy fixed-stride mode (segmentation="overlap", the timestamp
    # stitch) must keep working for pause-free audio
    hyp_o = t.transcribe_long(
        utt.audio, window_seconds=1.5, overlap_seconds=0.6,
        segmentation="overlap",
    )
    per_o = _per(hyp_o, ref)
    assert per_o <= 0.25, f"overlap-mode long-form PER {per_o:.3f}"

    # short input falls through to the single-utterance path
    short = utt.audio[:8000]
    assert t.transcribe_long(short) == t.transcribe(short)
