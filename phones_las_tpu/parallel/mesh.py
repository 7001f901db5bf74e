"""Mesh construction and sharding rules.

Design (scaling-book recipe): pick a mesh, annotate shardings on params
and batch, let XLA insert collectives over ICI.

  * batch axes ('data'): audio, lengths, targets — pure DP; gradient
    psum is emitted automatically by GSPMD when the loss averages over
    the global batch.
  * parameter axes ('model'): the 4U gate dim of LSTM kernels, vocab/
    output dims of projections, attention feature dims. With
    ``model=1`` (all reference-scale configs) these are fully
    replicated; the annotations only become collectives when the axis
    is widened.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phones_las_tpu.models.las import LASParams
from phones_las_tpu.models.speller import SpellerParams
from phones_las_tpu.models.listener import ListenerParams
from phones_las_tpu.ops.lstm import LSTMParams
from phones_las_tpu.ops.attention import AttentionParams


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _lstm_spec() -> LSTMParams:
    # wx [D, 4U], wh [U, 4U], b [4U]: shard the gate dim over 'model'
    return LSTMParams(wx=P(None, "model"), wh=P(None, "model"), b=P("model"))


def _attention_spec(p: AttentionParams) -> AttentionParams:
    return AttentionParams(
        wq=None if p.wq is None else P(None, "model"),
        wk=P(None, "model"),
        v=None if p.v is None else (P() if p.v.ndim == 0 else P("model")),
        b=None if p.b is None else P("model"),
        score_bias=None if p.score_bias is None else P(),
        g=None if p.g is None else P(),
    )


def _speller_spec(p: SpellerParams) -> SpellerParams:
    return SpellerParams(
        # replicated on purpose (unlike out_w, which shards over 'model'):
        # the embedding gather indexes the vocab axis, so sharding either
        # axis would turn every decode step's lookup into a collective;
        # at vocab≲1e3 × dim≲512 replication is cheaper than the gather.
        embedding=P(None, None),
        cells=tuple(_lstm_spec() for _ in p.cells),
        attention=_attention_spec(p.attention),
        attention_layer=None if p.attention_layer is None else P(None, "model"),
        out_w=P(None, "model"),
        out_b=P("model"),
        binf_w=None if p.binf_w is None else P(None, "model"),
        binf_b=None if p.binf_b is None else P("model"),
        binf_codes=None if p.binf_codes is None else P(None, None),
    )


def param_sharding_rules(params: LASParams) -> LASParams:
    """PartitionSpec pytree matching a LASParams pytree."""
    return LASParams(
        listener=ListenerParams(
            layers=tuple(
                (_lstm_spec(), _lstm_spec()) for _ in params.listener.layers
            )
        ),
        speller=_speller_spec(params.speller),
        grapheme_speller=(
            None
            if params.grapheme_speller is None
            else _speller_spec(params.grapheme_speller)
        ),
        cmvn_mean=P(None),
        cmvn_std=P(None),
        ctc_w=None if params.ctc_w is None else P(None, "model"),
        ctc_b=None if params.ctc_b is None else P("model"),
    )


_BATCH_SPECS = {
    "audio": P("data", None),
    "audio_lengths": P("data"),
    "targets": P("data", None),
    "target_lengths": P("data"),
    "grapheme_targets": P("data", None),
    "grapheme_lengths": P("data"),
}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the batch axis over 'data'."""
    out = {}
    for k, v in batch.items():
        if k not in _BATCH_SPECS:
            continue
        out[k] = jax.device_put(
            jnp.asarray(v), NamedSharding(mesh, _BATCH_SPECS[k])
        )
    return out


def batch_specs(batch_keys) -> dict:
    return {k: _BATCH_SPECS[k] for k in batch_keys if k in _BATCH_SPECS}


def _compatible_spec(x, spec: P, mesh: Mesh) -> P:
    """Drop axis names from a PartitionSpec on dims the array can't split
    evenly (e.g. an odd vocab over model=2): those dims fall back to
    replication instead of erroring. Arbitrary vocab/feature sizes must
    not dictate the mesh shape."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None:
            out.append(None)
            continue
        size = mesh.shape[axis]
        out.append(axis if x.shape[i] % size == 0 else None)
    return P(*out)


def shard_params(params: LASParams, mesh: Mesh) -> LASParams:
    specs = param_sharding_rules(params)

    def put(x, s):
        if x is None:
            return None
        return jax.device_put(
            x, NamedSharding(mesh, _compatible_spec(x, s, mesh))
        )

    return jax.tree.map(
        put, params, specs, is_leaf=lambda x: x is None,
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
