"""Transcribe audio FILES with a trained model (library-API front door).

The reference's ``infer.py`` consumes preprocessed TFRecords only
(SURVEY.md §4.3); this CLI goes straight from audio files (wav / flac /
sphere / mp3 — the native decoders in ``csrc/``) to transcripts, with an
optional long-form mode for recordings far beyond utterance length
(pause-snapped segmentation, or sliding window + attention-timestamp
stitch — ``api.transcribe_long``).

    python -m phones_las_tpu.cli.transcribe --workdir runs/timit a.wav b.flac
    python -m phones_las_tpu.cli.transcribe --workdir runs/ls --long-form lecture.mp3
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from phones_las_tpu.cli.common import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("files", nargs="+", help="audio files (wav/flac/sphere/mp3)")
    p.add_argument("--workdir", required=True)
    p.add_argument("--beam-width", type=int, default=None,
                   help="override the run's beam width (0 = greedy)")
    p.add_argument("--length-penalty", type=float, default=0.0)
    p.add_argument("--head", default="phone", choices=["phone", "grapheme"])
    p.add_argument("--long-form", action="store_true",
                   help="sliding-window transcription for recordings longer "
                        "than an utterance")
    p.add_argument("--window-seconds", type=float, default=None,
                   help="long-form segment size; default: sized to the "
                        "model's training bucket lengths (pause mode) "
                        "or 20 s (overlap mode)")
    p.add_argument("--overlap-seconds", type=float, default=2.0,
                   help="overlap (segmentation=overlap) or the pause "
                        "search half-width (segmentation=pause)")
    p.add_argument("--segmentation", default="pause",
                   choices=["pause", "overlap"],
                   help="long-form window placement: snap boundaries to "
                        "pauses (energy minima; accuracy-preserving) or "
                        "fixed-stride overlapping windows with timestamp "
                        "stitching")
    p.add_argument("--max-tokens-per-second", type=float, default=25.0,
                   help="long-form per-window decode cap = window × this")
    p.add_argument("--adapt-cmvn", action="store_true",
                   help="long-form only: normalize features with the "
                        "stream's own mean/std instead of the corpus "
                        "CMVN (per-speaker adaptation; docs/ACCURACY.md "
                        "long-form residual)")
    p.add_argument("--output", default=None, help="write TSV here instead of stdout")
    p.add_argument("--implementation", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--average-checkpoints", type=int, default=1, metavar="K",
                   help="decode with the mean of the newest K checkpoints")
    p.add_argument("--lm", default=None, metavar="LM.npz",
                   help="shallow-fusion n-gram LM (beam decoding only)")
    p.add_argument("--lm-weight", type=float, default=0.3)
    p.add_argument("--ctc-joint", type=float, default=None, metavar="ALPHA",
                   help="one-pass joint CTC-attention beam decoding "
                        "(score = ALPHA*attn + (1-ALPHA)*ctc prefix)")
    args = p.parse_args(argv)

    import sys

    import numpy as np

    from phones_las_tpu.api import Transcriber
    from phones_las_tpu.data.audio_io import read_audio

    t = Transcriber(
        args.workdir, beam_width=args.beam_width,
        length_penalty=args.length_penalty, head=args.head,
        implementation=args.implementation,
        average_checkpoints=args.average_checkpoints,
        lm=args.lm, lm_weight=args.lm_weight, ctc_joint=args.ctc_joint,
    )

    if args.long_form:
        results = []
        for path in args.files:
            pcm, _ = read_audio(path, target_rate=t.sample_rate)
            results.append(t.transcribe_long(
                np.asarray(pcm), window_seconds=args.window_seconds,
                overlap_seconds=args.overlap_seconds,
                max_tokens_per_second=args.max_tokens_per_second,
                segmentation=args.segmentation,
                adapt_cmvn=args.adapt_cmvn,
            ))
    else:
        results = t.transcribe_files(args.files)

    out = open(args.output, "w") if args.output else sys.stdout
    for path, toks in zip(args.files, results):
        print(f"{path}\t{' '.join(toks)}", file=out)
    if args.output:
        out.close()


if __name__ == "__main__":
    main()
