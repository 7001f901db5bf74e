"""Shared CLI wiring: resolve a preset against a prepared data dir."""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

from phones_las_tpu.data.ipa import BINF_FEATURES, TIMIT_FOLD_39, binf_matrix
from phones_las_tpu.data.vocab import Vocab
from phones_las_tpu.frontend.cmvn import CmvnStats
from phones_las_tpu.models.las import LASConfig, LASParams
from phones_las_tpu.utils.config import Preset, get_preset


def honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS=cpu ...cli...`` actually mean CPU: some PJRT
    plugins (the tunneled-TPU one in this image) register themselves
    regardless of the env var, so the CLIs re-assert it through
    ``jax.config`` (which wins) before any backend initializes. No-op when
    the var is unset or a backend is already live."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def load_data_dir(data_dir: str):
    vocab = Vocab.load(os.path.join(data_dir, "vocab.txt"))
    gpath = os.path.join(data_dir, "grapheme_vocab.txt")
    grapheme_vocab = Vocab.load(gpath) if os.path.exists(gpath) else None
    cpath = os.path.join(data_dir, "cmvn.json")
    cmvn = CmvnStats.load(cpath) if os.path.exists(cpath) else None
    return vocab, grapheme_vocab, cmvn


def resolve_preset(
    name: str, data_dir: str, overrides: Optional[Dict] = None
) -> Tuple[Preset, Vocab, Optional[Vocab], Optional[CmvnStats], Optional[np.ndarray]]:
    """Bind a named preset to the actual vocab sizes / binf codes / CMVN
    of a prepared data dir."""
    vocab, grapheme_vocab, cmvn = load_data_dir(data_dir)
    preset = get_preset(name)
    model = preset.model
    speller = dataclasses.replace(
        model.speller,
        vocab_size=len(vocab),
        bos_id=vocab.sos_id,
        eos_id=vocab.eos_id,
        memory_dim=2 * model.listener.units,
    )
    binf_codes = None
    if speller.binf_mode != "none":
        binf_codes = binf_matrix(vocab.tokens)
        speller = dataclasses.replace(speller, num_binf=len(BINF_FEATURES))
    g_speller = model.grapheme_speller
    if g_speller is not None:
        assert grapheme_vocab is not None, "preset needs grapheme_vocab.txt"
        g_speller = dataclasses.replace(
            g_speller,
            vocab_size=len(grapheme_vocab),
            bos_id=grapheme_vocab.sos_id,
            eos_id=grapheme_vocab.eos_id,
            memory_dim=2 * model.listener.units,
        )
    model = dataclasses.replace(model, speller=speller, grapheme_speller=g_speller)
    pipeline = dataclasses.replace(
        preset.pipeline,
        eos_id=vocab.eos_id,
        pad_id=vocab.pad_id,
        max_grapheme_len=preset.pipeline.max_grapheme_len if g_speller else 0,
    )
    train = preset.train
    # reference flag semantics (SURVEY §6 config row): encoder_/decoder_-
    # prefixed keys route into the listener/speller sub-configs
    _listener_keys = {"encoder_layers": "num_layers", "encoder_units": "units",
                      "dropout": "dropout"}
    _speller_keys = {"decoder_layers": "num_layers", "decoder_units": "units",
                     "embedding_dim": "embedding_dim",
                     "attention_type": "attention_type",
                     "attention_units": "attention_units",
                     "attention_layer_size": "attention_layer_size",
                     "sampling_probability": "sampling_probability",
                     "monotonic_mode": "monotonic_mode",
                     "monotonic_noise": "monotonic_noise",
                     "monotonic_bias": "monotonic_bias"}
    for k, v in (overrides or {}).items():
        if v is None:
            continue
        if k == "specaugment":
            from phones_las_tpu.frontend.specaugment import SpecAugmentConfig

            sa = (
                v if isinstance(v, SpecAugmentConfig)
                else SpecAugmentConfig(**(v if isinstance(v, dict) else {}))
            )
            model = dataclasses.replace(model, specaugment=sa)
        elif k == "frontend_precision":
            model = dataclasses.replace(
                model,
                frontend=dataclasses.replace(model.frontend, precision=v),
            )
        elif k in _listener_keys:
            model = dataclasses.replace(
                model,
                listener=dataclasses.replace(
                    model.listener, **{_listener_keys[k]: v}
                ),
            )
        elif k in _speller_keys:
            model = dataclasses.replace(
                model,
                speller=dataclasses.replace(model.speller, **{_speller_keys[k]: v}),
            )
        elif hasattr(train, k):
            train = dataclasses.replace(train, **{k: v})
        elif hasattr(pipeline, k):
            pipeline = dataclasses.replace(pipeline, **{k: v})
        elif hasattr(model, k):
            model = dataclasses.replace(model, **{k: v})
        else:
            raise ValueError(f"unknown config override {k!r}")
    if any(
        (overrides or {}).get(k) is not None
        for k in ("encoder_layers", "encoder_units")
    ):
        # keep dependent dims consistent when the encoder width changes
        model = dataclasses.replace(
            model,
            speller=dataclasses.replace(
                model.speller, memory_dim=2 * model.listener.units
            ),
            grapheme_speller=(
                None if model.grapheme_speller is None else dataclasses.replace(
                    model.grapheme_speller, memory_dim=2 * model.listener.units
                )
            ),
        )
    preset = dataclasses.replace(
        preset, model=model, pipeline=pipeline, train=train
    )
    return preset, vocab, grapheme_vocab, cmvn, binf_codes


def apply_cmvn_to_params(params: LASParams, cmvn: Optional[CmvnStats]) -> LASParams:
    if cmvn is None:
        return params
    import jax.numpy as jnp

    return params._replace(
        cmvn_mean=jnp.asarray(cmvn.mean, jnp.float32),
        cmvn_std=jnp.asarray(cmvn.std, jnp.float32),
    )


def timit_score_fold(vocab: Vocab, output_ipa: bool) -> Dict[int, Optional[int]]:
    """Lee&Hon 61→39 fold as an id→id map for scoring (SURVEY.md App A).
    For IPA vocabs the fold is expressed through the ARPAbet→IPA map."""
    from phones_las_tpu.data.ipa import ARPABET_TO_IPA

    fold: Dict[int, Optional[int]] = {}
    for src, dst in TIMIT_FOLD_39.items():
        s = ARPABET_TO_IPA.get(src, src) if output_ipa else src
        d = (ARPABET_TO_IPA.get(dst, dst) if output_ipa else dst) if dst else None
        if s in vocab and (d is None or d in vocab):
            fold[vocab.encode([s])[0]] = (
                None if d is None else vocab.encode([d])[0]
            )
    return fold
