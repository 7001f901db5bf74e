"""Shared corpus-preparation machinery.

Reference equivalent: the per-corpus prep scripts' common tail
(SURVEY.md §4.5) — serialize utterances, emit vocab, accumulate global
CMVN stats. CMVN here is computed *with the device front-end itself*
(the same jit-compiled feature kernel used at train time), so the stats
match training numerics exactly instead of trusting a separate offline
implementation.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from phones_las_tpu.data.records import RecordReader, RecordWriter, Utterance
from phones_las_tpu.data.vocab import Vocab
from phones_las_tpu.frontend.cmvn import CmvnStats
from phones_las_tpu.frontend.features import FrontendConfig, extract_features, num_frames


def write_corpus_split(
    out_path: str,
    items: Iterable[Tuple[str, str, List[str], Optional[List[str]], str]],
    vocab: Vocab,
    grapheme_vocab: Optional[Vocab] = None,
    *,
    read_audio: Optional[Callable] = None,
    meta: Optional[dict] = None,
    expected_rate: int = 16000,
    log_every: int = 500,
    log=print,
) -> int:
    """items: (utt_id, audio_path, tokens, grapheme_tokens|None, text).
    Returns number of utterances written."""
    if read_audio is None:
        from phones_las_tpu.data.audio_io import read_audio
    n = 0
    skipped = 0
    with RecordWriter(out_path, meta=meta) as w:
        for utt_id, path, tokens, graphemes, text in items:
            # other-rate streams (e.g. 48 kHz Common Voice mp3s) are
            # resampled by the native polyphase resampler
            try:
                audio, rate = read_audio(path, target_rate=expected_rate)
            except ValueError as e:
                # one corrupt clip must not abort a corpus-scale prep
                # run — but a missing decoder/resampler fails EVERY clip
                # and must abort (silently writing an empty split with
                # exit code 0 is worse than the old hard error)
                if "native decoder" in str(e) or "resampler" in str(e):
                    raise
                skipped += 1
                log(f"  skipping undecodable clip: {e}")
                continue
            if rate != expected_rate:
                raise ValueError(f"{path}: sample rate {rate} != {expected_rate}")
            w.write(
                Utterance(
                    utt_id,
                    audio,
                    np.asarray(vocab.encode(tokens), np.int32),
                    (
                        np.asarray(grapheme_vocab.encode(graphemes), np.int32)
                        if grapheme_vocab is not None and graphemes is not None
                        else None
                    ),
                    text,
                )
            )
            n += 1
            if log_every and n % log_every == 0:
                log(f"  {out_path}: {n} utterances")
    if skipped:
        log(f"  {out_path}: skipped {skipped} undecodable clip(s)")
        if n == 0:
            raise ValueError(
                f"{out_path}: every clip failed to decode ({skipped} "
                "skipped) — systemic decode problem, not corrupt data"
            )
    return n


def compute_cmvn(
    record_path: str,
    frontend_cfg: FrontendConfig,
    *,
    max_utts: Optional[int] = 500,
    pad_quantum: int = 32000,
) -> CmvnStats:
    """Global per-dim feature stats via the on-device front-end. Sample
    lengths are padded to multiples of ``pad_quantum`` so jit compiles a
    bounded number of shapes.

    ``max_utts=None`` streams the *entire* corpus (exact Σx/Σx² global
    CMVN, the reference's semantics — SURVEY.md §4.5); the default caps
    the pass at 500 utterances, a close approximation for corpora at
    TIMIT scale and a documented one above it."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def feats_fn(audio, length, n):
        f = extract_features(
            audio[None], frontend_cfg, sample_lengths=length[None], n_frames=n
        )
        return f[0]

    reader = RecordReader(record_path)
    dim = frontend_cfg.base_dim * (3 if frontend_cfg.add_deltas else 1)
    stats = CmvnStats.zeros(dim)
    take = len(reader) if max_utts is None else min(len(reader), max_utts)
    for i in range(take):
        u = reader[i]
        s = u.num_samples
        padded = ((s + pad_quantum - 1) // pad_quantum) * pad_quantum
        audio = np.zeros(padded, np.float32)
        audio[:s] = u.audio
        n = num_frames(padded, frontend_cfg)
        f = np.asarray(feats_fn(jnp.asarray(audio), jnp.asarray(s), n))
        stats.update(f, length=int(num_frames(s, frontend_cfg)))
    return stats


def finalize_split_dir(
    out_dir: str,
    vocab: Vocab,
    *,
    grapheme_vocab: Optional[Vocab] = None,
    cmvn_from: Optional[str] = None,
    frontend_cfg: Optional[FrontendConfig] = None,
    meta: Optional[dict] = None,
    cmvn_max_utts: Optional[int] = 500,
) -> None:
    """Write vocab/grapheme_vocab/cmvn/meta files next to the records."""
    vocab.save(os.path.join(out_dir, "vocab.txt"))
    if grapheme_vocab is not None:
        grapheme_vocab.save(os.path.join(out_dir, "grapheme_vocab.txt"))
    if cmvn_from is not None:
        cfg = frontend_cfg or FrontendConfig()
        stats = compute_cmvn(cmvn_from, cfg, max_utts=cmvn_max_utts)
        stats.save(os.path.join(out_dir, "cmvn.json"))
    if meta is not None:
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
