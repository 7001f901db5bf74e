"""Flat-npz (de)serialization of a trained LAS model: params + config in
one self-contained file.

The orbax checkpoint directory is the training-time format (resumable,
sharded, async — ``train/checkpoint.py``); this is the *artifact*
format: a single committable .npz whose structure cannot drift from the
code because loading rebuilds the pytree from ``init_las(cfg)`` and
fills leaves by tree path. Used by the bench's correctness row
(``bench.py::bench_accuracy``) and handy for shipping small models the
way ``assets/g2p_en.npz`` ships the G2P. The reference has no artifact
format at all (SURVEY.md §6 checkpoint row: "ship the checkpoint dir
and re-run the Estimator").
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import numpy as np


def _cfg_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def config_from_dict(d: dict):
    """Rebuild a ``LASConfig`` from ``dataclasses.asdict`` output."""
    from phones_las_tpu.frontend.features import FrontendConfig
    from phones_las_tpu.frontend.specaugment import SpecAugmentConfig
    from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig

    d = dict(d)
    d["frontend"] = FrontendConfig(**d["frontend"])
    d["listener"] = ListenerConfig(**d["listener"])
    d["speller"] = SpellerConfig(**d["speller"])
    if d.get("grapheme_speller"):
        d["grapheme_speller"] = SpellerConfig(**d["grapheme_speller"])
    if d.get("specaugment"):
        d["specaugment"] = SpecAugmentConfig(**d["specaugment"])
    return LASConfig(**d)


def _flatten(params) -> dict:
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = jax.tree_util.keystr(path)
        assert key not in out, key
        out[key] = np.asarray(leaf)
    return out


def save_params_npz(path: str, params, cfg, extras: dict = None) -> None:
    """``extras`` (optional, JSON-serializable) rides along as
    ``__extras__`` — decode-side metadata the model config doesn't carry
    (vocab tokens, training bucket lengths, target cap), enough for
    ``Transcriber.from_artifact`` to serve from the file alone."""
    flat = _flatten(params)
    flat["__config__"] = np.frombuffer(
        json.dumps(_cfg_to_dict(cfg)).encode(), dtype=np.uint8
    )
    if extras is not None:
        flat["__extras__"] = np.frombuffer(
            json.dumps(extras).encode(), dtype=np.uint8
        )
    np.savez_compressed(path, **flat)


def load_params_npz(path: str) -> Tuple[object, object]:
    """→ (LASParams, LASConfig). Leaves are matched by tree path against
    a freshly initialized model of the stored config, so a structural
    mismatch fails loudly instead of mis-grafting."""
    params, cfg, _ = load_artifact(path)
    return params, cfg


def load_artifact(path: str) -> Tuple[object, object, dict]:
    """→ (LASParams, LASConfig, extras dict — empty when absent)."""
    import jax

    from phones_las_tpu.models.las import init_las

    data = np.load(path, allow_pickle=False)
    cfg = config_from_dict(
        json.loads(bytes(data["__config__"].tobytes()).decode())
    )
    extras = (
        json.loads(bytes(data["__extras__"].tobytes()).decode())
        if "__extras__" in data else {}
    )
    template = init_las(jax.random.PRNGKey(0), cfg)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    filled = []
    for tpath, tleaf in leaves:
        key = jax.tree_util.keystr(tpath)
        assert key in data, f"{path}: missing leaf {key}"
        arr = data[key]
        assert arr.shape == tleaf.shape, (key, arr.shape, tleaf.shape)
        filled.append(arr.astype(tleaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, filled), cfg, extras
