"""LibriSpeech corpus preparation.

Reference: ``process_librispeech.py`` (SURVEY.md §2) — walk
``<root>/<split>/<speaker>/<chapter>/``, read ``*.trans.txt`` transcript
lists and FLAC audio (native decoder), emit char targets (configs[2]) or
best-effort lexicon/G2P phone targets.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

from phones_las_tpu.data.g2p import text_to_ipa
from phones_las_tpu.data.prep_common import finalize_split_dir, write_corpus_split
from phones_las_tpu.data.vocab import Vocab
from phones_las_tpu.frontend.features import FrontendConfig

_CHARS = list("abcdefghijklmnopqrstuvwxyz'") + ["<space>"]


def text_to_chars(text: str) -> List[str]:
    words = []
    for w in text.lower().split():
        kept = [ch for ch in w if ch.isalpha() or ch == "'"]
        if kept:
            words.append(kept)
    out: List[str] = []
    for i, w in enumerate(words):
        if i:
            out.append("<space>")
        out.extend(w)
    return out


def iter_librispeech_split(root: str, split: str) -> Iterator[Tuple[str, str, str]]:
    """→ (utt_id, flac_path, transcript)."""
    split_dir = os.path.join(root, split)
    assert os.path.isdir(split_dir), f"missing {split_dir}"
    for dirpath, _, files in sorted(os.walk(split_dir)):
        for fn in sorted(files):
            if not fn.endswith(".trans.txt"):
                continue
            with open(os.path.join(dirpath, fn)) as f:
                for line in f:
                    utt_id, _, text = line.strip().partition(" ")
                    if not text:
                        continue
                    flac = os.path.join(dirpath, utt_id + ".flac")
                    if os.path.exists(flac):
                        yield utt_id, flac, text


def _ipa_phone_inventory() -> List[str]:
    from phones_las_tpu.data.g2p import _EN_LEXICON, _EN_RULES  # noqa

    phones = set()
    for ps in _EN_LEXICON.values():
        phones.update(ps)
    for _, ps in _EN_RULES:
        phones.update(ps)
    return sorted(phones)


def prepare_librispeech(
    root: str,
    out_dir: str,
    *,
    splits: Tuple[str, ...] = ("train-clean-100", "dev-clean", "test-clean"),
    targets: str = "char",  # 'char' | 'phone'
    frontend_cfg: Optional[FrontendConfig] = None,
    cmvn_max_utts: Optional[int] = 500,
    g2p_model: Optional[str] = None,
    log=print,
) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    model = None
    if g2p_model and targets == "phone":
        from phones_las_tpu.models.g2p_model import NeuralG2P

        model = (NeuralG2P.bundled() if g2p_model == "bundled"
                 else NeuralG2P(g2p_model))
    if targets == "char":
        vocab = Vocab(_CHARS)
    else:
        inv = set(_ipa_phone_inventory())
        if model is not None:  # the seq2seq may emit phones rules don't
            inv.update(model.vocab_p.real_tokens)
        vocab = Vocab(sorted(inv))
    grapheme_vocab = Vocab(_CHARS)

    counts = {}
    train_split = None
    for split in splits:
        def items():
            for utt_id, flac, text in iter_librispeech_split(root, split):
                if targets == "char":
                    tokens = text_to_chars(text)
                else:
                    tokens = text_to_ipa(text, "en", model=model)
                yield utt_id, flac, tokens, text_to_chars(text), text

        out_path = os.path.join(out_dir, split.replace("/", "_") + ".plu")
        counts[split] = write_corpus_split(
            out_path, items(), vocab, grapheme_vocab,
            meta={"corpus": "librispeech", "split": split, "targets": targets,
                  "sample_rate": 16000},
            log=log,
        )
        if train_split is None and split.startswith("train"):
            train_split = out_path
        log(f"librispeech {split}: {counts[split]} utterances")

    finalize_split_dir(
        out_dir, vocab, grapheme_vocab=grapheme_vocab,
        cmvn_from=train_split,
        frontend_cfg=frontend_cfg,
        cmvn_max_utts=cmvn_max_utts,
        meta={"corpus": "librispeech", "counts": counts, "targets": targets},
    )
    return counts
