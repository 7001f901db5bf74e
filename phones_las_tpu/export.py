"""AOT model export: freeze a trained run into self-contained StableHLO
artifacts for serving.

The reference's deployment story is "ship the checkpoint directory and
re-run the Estimator code" (SURVEY.md §6 checkpoint row) — inference is
coupled to the exact model code that trained it. This module decouples
them the XLA-native way: the full inference function (device-resident
front-end → pBLSTM encoder → greedy/beam decode) is traced once per
serving shape and serialized with ``jax.export``, with the trained
parameters embedded as constants. The artifact is a versioned,
code-drift-proof unit — a future serving binary only needs
``ExportedTranscriber`` (deserialize + call + vocab table), never the
model definition, config system, or checkpoint format.

    python -m phones_las_tpu.cli.export --workdir runs/ls --out runs/ls/export
    ...
    t = ExportedTranscriber("runs/ls/export")
    t.transcribe_batch([pcm_int16])        # same tokens as Transcriber

Artifacts are exported per (batch, pad_samples) serving shape; the
loader picks the smallest exported shape that fits a request and
zero-pads into it (the same static-shape discipline as the live
``Transcriber``). Pass ``platforms=["tpu", "cpu"]`` to produce one
artifact servable on both.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_META_NAME = "export.json"


def export_model(
    workdir: str,
    out_dir: str,
    *,
    batch_sizes: Sequence[int] = (1, 8, 64),
    pad_seconds: Sequence[float] = (10.0,),
    beam_width: Optional[int] = None,
    head: str = "phone",
    platforms: Optional[Sequence[str]] = None,
    implementation: str = "auto",
    average_checkpoints: int = 1,
    lm: Optional[str] = None,
    lm_weight: float = 0.3,
) -> dict:
    """Trace + serialize the inference program for each serving shape.

    Returns the metadata dict (also written to ``<out_dir>/export.json``).
    Multi-platform artifacts (``platforms`` beyond tpu) force the XLA
    implementation: the Pallas kernels only lower for TPU.
    """
    import jax
    from jax import export as jexport

    from phones_las_tpu.api import Transcriber

    if implementation == "auto" and platforms and set(platforms) != {"tpu"}:
        implementation = "xla"
    # averaged params and the fused LM table both become trace constants,
    # so the artifact carries them with no extra format support
    t = Transcriber(
        workdir, beam_width=beam_width, head=head,
        implementation=implementation,
        average_checkpoints=average_checkpoints, lm=lm, lm_weight=lm_weight,
    )
    sr = t.sample_rate
    os.makedirs(out_dir, exist_ok=True)

    entries = []
    for secs in pad_seconds:
        pad = int(round(secs * sr))
        for b in sorted(batch_sizes):
            base_fn = t._infer_fn(pad, b)
            params = t.params

            @jax.jit
            def fn(audio, lengths):
                # params close over the trace → serialized as constants:
                # the artifact is self-contained (weights + program)
                return base_fn(params, audio, lengths)

            args = (
                jax.ShapeDtypeStruct((b, pad), np.int16),
                jax.ShapeDtypeStruct((b,), np.int32),
            )
            exp = jexport.export(fn, platforms=platforms)(*args)
            name = f"infer_b{b}_t{pad}.shlo"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize())
            entries.append({"batch": b, "pad_samples": pad, "file": name})

    meta = {
        "format": 1,
        "workdir": os.path.abspath(workdir),
        "sample_rate": sr,
        "head": head,
        "beam_width": t.beam,
        "tokens": list(t.vocab.tokens),
        "platforms": list(platforms) if platforms else None,
        "entries": entries,
    }
    with open(os.path.join(out_dir, _META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedTranscriber:
    """Serve from an export directory — no model code, config, or
    checkpoint involved; just deserialized XLA programs + the vocab."""

    def __init__(self, export_dir: str):
        meta = json.load(open(os.path.join(export_dir, _META_NAME)))
        assert meta.get("format") == 1, f"unknown export format: {meta}"
        self.meta = meta
        self.sample_rate = meta["sample_rate"]
        self.tokens: List[str] = meta["tokens"]
        self._dir = export_dir
        # (batch, pad) → lazily deserialized Exported
        self._fns: Dict[Tuple[int, int], object] = {}
        self._shapes = sorted(
            (e["batch"], e["pad_samples"], e["file"]) for e in meta["entries"]
        )

    def _pick(self, n: int, samples: int) -> Tuple[int, int, str]:
        """Smallest exported (batch, pad) that fits; batch-first so a
        single long request doesn't land on the widest batch program."""
        fitting = [
            (b, p, f) for b, p, f in self._shapes if b >= n and p >= samples
        ]
        assert fitting, (
            f"no exported shape fits batch={n}, samples={samples}; "
            f"have {[(b, p) for b, p, _ in self._shapes]}"
        )
        return min(fitting, key=lambda e: (e[0], e[1]))

    def _fn(self, b: int, pad: int, fname: str):
        key = (b, pad)
        if key not in self._fns:
            from jax import export as jexport

            data = open(os.path.join(self._dir, fname), "rb").read()
            self._fns[key] = jexport.deserialize(data)
        return self._fns[key]

    @staticmethod
    def _to_int16(a: np.ndarray) -> np.ndarray:
        a = np.asarray(a)
        if a.dtype == np.int16:
            return a
        # the library convention is PCM-scale values regardless of dtype
        # (api.Transcriber ships float inputs at the same scale)
        return np.clip(np.round(a), -32768, 32767).astype(np.int16)

    def transcribe_batch(self, audio: Sequence[np.ndarray]) -> List[List[str]]:
        lens = [int(np.asarray(a).shape[0]) for a in audio]
        b, pad, fname = self._pick(len(audio), max(lens))
        wav = np.zeros((b, pad), np.int16)
        for i, a in enumerate(audio):
            wav[i, : lens[i]] = self._to_int16(a)
        wav_lens = np.zeros((b,), np.int32)
        wav_lens[: len(audio)] = lens
        toks, out_lens = self._fn(b, pad, fname).call(wav, wav_lens)
        toks, out_lens = np.asarray(toks), np.asarray(out_lens)
        specials = set(self.tokens[:4])  # <pad>/<sos>/<eos>/<unk>
        return [
            [
                self.tokens[tid]
                for tid in toks[i][: out_lens[i]]
                if self.tokens[tid] not in specials
            ]
            for i in range(len(audio))
        ]

    def transcribe(self, audio: np.ndarray) -> List[str]:
        return self.transcribe_batch([audio])[0]
