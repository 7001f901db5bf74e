"""G2P CLI: train / apply the seq2seq grapheme→phoneme model.

    # train on the bundled expanded lexicon (optionally + your own)
    python -m phones_las_tpu.cli.g2p train --out runs/g2p_en.npz

    # apply: words (or a text file) → IPA
    python -m phones_las_tpu.cli.g2p apply --model runs/g2p_en.npz hello world

The trained model plugs into corpus prep via ``prepare librispeech/
common_voice --g2p-model`` and into ``data.g2p.text_to_ipa(model=...)``;
words it can't handle (digits, foreign characters) keep the rule-table
fallback. No reference equivalent (the reference shells out to an
external phonemizer — SURVEY.md §2).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from phones_las_tpu.cli.common import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("train", help="train on the bundled expanded lexicon")
    tr.add_argument("--out", required=True, help="output .npz model path")
    tr.add_argument("--steps", type=int, default=1200)
    tr.add_argument("--batch-size", type=int, default=256)
    tr.add_argument("--learning-rate", type=float, default=2e-3)
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--extra-lexicon", default=None,
                    help="extra training pairs: 'word: p h o n e s' lines")

    ap = sub.add_parser("apply", help="words → IPA")
    ap.add_argument("--model", required=True)
    ap.add_argument("--beam-width", type=int, default=4)
    ap.add_argument("--text", default=None, help="file of words/sentences")
    ap.add_argument("words", nargs="*")

    args = p.parse_args(argv)

    if args.cmd == "train":
        from phones_las_tpu.data.lexicon_en import expanded_lexicon
        from phones_las_tpu.models.g2p_model import save_g2p, train_g2p

        lex = expanded_lexicon()
        if args.extra_lexicon:
            from phones_las_tpu.models.g2p_model import G2P_CHARS

            allowed = set(G2P_CHARS)
            with open(args.extra_lexicon) as f:
                for lineno, line in enumerate(f, 1):
                    word, _, phones = line.partition(":")
                    # lookups key on normalize_text output (lowercased);
                    # store the same form or the pair never matches
                    word = word.strip().lower()
                    if not phones.split() or not word:
                        continue
                    bad = set(word) - allowed
                    if bad:
                        print(f"--extra-lexicon:{lineno}: skipping "
                              f"{word!r} (chars outside the G2P "
                              f"alphabet: {sorted(bad)})")
                        continue
                    lex[word] = tuple(phones.split())
        params, cfg, vc, vp = train_g2p(
            lex, steps=args.steps, batch_size=args.batch_size,
            learning_rate=args.learning_rate, seed=args.seed,
            log_every=max(args.steps // 10, 1),
        )
        save_g2p(args.out, params, cfg, vc, vp)
        print(f"{args.out}: trained on {len(lex)} pairs, "
              f"{len(vp)} phone tokens")
    else:
        from phones_las_tpu.data.g2p import normalize_text
        from phones_las_tpu.models.g2p_model import NeuralG2P

        model = NeuralG2P(args.model, beam_width=args.beam_width)
        words = list(args.words)
        if args.text:
            with open(args.text) as f:
                for line in f:
                    words += normalize_text(line)
        out = model.lookup(words)
        for w in words:
            print(f"{w}\t{' '.join(out.get(w, ['<no-model-coverage>']))}")


if __name__ == "__main__":
    main()
