"""PER + derailment breakdown for an infer TSV against its test records.

Long-utterance LAS decodes fail by *derailing* — the attention loses
its place and the decoder emits insertion loops until the step cap.
This splits the PER into that failure mode vs the well-behaved rest
(docs/ACCURACY.md "Long utterances").

    python tools/decode_stats.py --tsv _runs/L_base_greedy.tsv \
        --records _runs/long_data/test.plu [--cap 84]
"""
import argparse

from phones_las_tpu.data.records import RecordReader
from phones_las_tpu.data.speechlike import speechlike_phone_inventory
from phones_las_tpu.data.vocab import Vocab
from phones_las_tpu.train.metrics import _edit_distance


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True)
    p.add_argument("--records", required=True)
    p.add_argument("--cap", type=int, default=None,
                   help="decode step cap used by infer (hyps of exactly "
                        "this length count as derailed)")
    p.add_argument("--slack", type=int, default=15,
                   help="hyp len ≥ ref len + slack counts as derailed")
    args = p.parse_args()

    vocab = Vocab(speechlike_phone_inventory())
    ids = {t: i for i, t in enumerate(vocab.tokens)}
    refs = {u.utt_id: vocab.decode(u.targets) for u in RecordReader(args.records)}

    n = derailed = errs = toks = errs_ok = toks_ok = 0
    for line in open(args.tsv):
        if line.startswith("#"):
            continue
        uid, _, hyp_s = line.rstrip("\n").partition("\t")
        hyp = hyp_s.split() if hyp_s else []
        ref = refs[uid]
        e = _edit_distance([ids[x] for x in hyp], [ids[x] for x in ref])
        errs += e
        toks += len(ref)
        n += 1
        if len(hyp) >= len(ref) + args.slack or (args.cap and len(hyp) == args.cap):
            derailed += 1
        else:
            errs_ok += e
            toks_ok += len(ref)
    print(f"utts={n} derailed={derailed} ({derailed/n:.1%})")
    print(f"PER {errs/toks:.4f}; PER excluding derailed "
          f"{errs_ok/toks_ok if toks_ok else float('nan'):.4f}")


if __name__ == "__main__":
    main()
