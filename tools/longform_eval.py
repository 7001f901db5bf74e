"""Long-form stitching PER on fresh speechlike streams.

Synthesizes N continuous streams of ~``--stream-syllables`` syllables
(~60 s+ each at the long-corpus word/pause settings) from the same
phonotactic language as the training corpus, runs
``Transcriber.transcribe_long`` over each, and reports the stitched PER
against the true phone sequence — the end-to-end check that windowed
decode + attention-timestamp stitching holds up at realistic utterance
lengths (docs/ACCURACY.md "Long utterances").

    python tools/longform_eval.py --workdir _runs/long_base \
        --streams 4 --stream-syllables 170 --window 8 --overlap 2
"""
import argparse

import numpy as np

from phones_las_tpu.api import Transcriber
from phones_las_tpu.data.speechlike import (
    make_phonotactics,
    speechlike_phone_inventory,
    synth_speech_utterance,
)
from phones_las_tpu.data.vocab import Vocab
from phones_las_tpu.train.metrics import _edit_distance


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--streams", type=int, default=4)
    p.add_argument("--stream-syllables", type=int, default=170)
    p.add_argument("--words", type=int, nargs=2, default=(1, 3))
    p.add_argument("--seed", type=int, default=31)
    p.add_argument("--phonotactics-seed", type=int, default=1234)
    p.add_argument("--window", type=float, default=None,
                   help="segment seconds (default: auto from the "
                        "model's training buckets, pause mode)")
    p.add_argument("--overlap", type=float, default=2.0)
    p.add_argument("--snr-db", type=float, nargs=2, default=(8.0, 30.0))
    p.add_argument("--segmentation", choices=("pause", "overlap"),
                   default="pause")
    p.add_argument("--adapt-cmvn", action="store_true",
                   help="per-stream CMVN (speaker adaptation)")
    p.add_argument("--beam-width", type=int, default=None)
    p.add_argument("--ctc-joint", type=float, default=None)
    args = p.parse_args()

    vocab = Vocab(speechlike_phone_inventory())
    model = make_phonotactics(args.phonotactics_seed)
    rng = np.random.RandomState(args.seed)
    t = Transcriber(args.workdir, beam_width=args.beam_width,
                    ctc_joint=args.ctc_joint)

    errs = tokens = 0
    total_audio = 0.0
    for i in range(args.streams):
        u = synth_speech_utterance(
            rng, vocab, f"stream-{i}", model=model,
            n_syllables_range=(args.stream_syllables, args.stream_syllables),
            word_syllables=tuple(args.words),
            snr_db_range=tuple(args.snr_db),
        )
        ref = vocab.decode(u.targets)
        hyp = t.transcribe_long(
            u.audio, window_seconds=args.window,
            overlap_seconds=args.overlap, segmentation=args.segmentation,
            adapt_cmvn=args.adapt_cmvn,
        )
        ids = {tok: j for j, tok in enumerate(vocab.tokens)}
        e = _edit_distance([ids[x] for x in hyp], [ids[x] for x in ref])
        errs += e
        tokens += len(ref)
        total_audio += len(u.audio) / 16000.0
        print(f"stream {i}: {len(u.audio)/16000.0:.1f}s audio, "
              f"{len(ref)} ref tokens, {len(hyp)} hyp, PER {e/len(ref):.4f}")
    print(f"TOTAL: {args.streams} streams, {total_audio:.0f}s audio, "
          f"{tokens} tokens, stitched PER {errs/tokens:.4f}")


if __name__ == "__main__":
    main()
