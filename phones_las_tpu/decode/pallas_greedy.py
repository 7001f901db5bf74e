"""Fully-fused Pallas greedy decoder.

The scan-based greedy loop re-reads attention keys and encoder memory
from HBM every step (~50 MB × steps for a 64×10 s batch — decode is
memory-bandwidth-bound). This kernel keeps the decode loop VMEM-resident:
grid = (B/8 batch groups, decode steps). The TPU grid is sequential, so
per-group decoder state (token, finished, attention vector, LSTM h/c)
persists in VMEM scratch across the step dimension, and the keys/memory/
weight blocks keep the same block index across steps — Pallas fetches
them once per group and they stay resident. Embedding lookup is a
one-hot matmul (V is small); a finished-group predicate skips all step
compute once every row has emitted <eos> (real utterances finish long
before the static cap).

Supported shape (callers fall back to the XLA scan otherwise):
bahdanau attention, attention_layer present, learned embeddings.

Measured niche (docs/PERF.md): batch groups run *sequentially* on the
single TPU core, so at large batch the XLA scan decoder (which streams
keys/memory from HBM for the whole batch each step) wins — 4.7 ms vs
13.3 ms at B=64. At B≤8 (one group — low-latency single-stream serving)
the fused kernel is the faster path (3.0 ms vs 3.1 ms and no per-step
HLO overhead); ``Transcriber`` dispatches to it there.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phones_las_tpu.models.speller import SpellerConfig, SpellerParams
from phones_las_tpu.ops.attention import precompute_keys

_HI = jax.lax.Precision.HIGHEST
_ROWS = 8
_NEG = -1e9


def supports(cfg: SpellerConfig) -> bool:
    return (
        cfg.attention_type == "bahdanau"
        and cfg.attention_layer_size > 0
        and cfg.binf_mode in ("none", "head")
    )


def _kernel(cfg: SpellerConfig, n_cells: int):
    def kernel(
        keys_ref, mem_ref, mask_ref,  # [R,T,A], [R,T,M], [R,T]
        emb_ref, wq_ref, v_ref, attn_ref, outw_ref, outb_ref,  # weights
        *rest,
    ):
        cell_refs = rest[: 3 * n_cells]  # (wx, wh, b) per cell
        tok_out_ref = rest[3 * n_cells]  # [1, 1, R, 1] int32 this step
        tok_scr, fin_scr, attn_scr = rest[3 * n_cells + 1 : 3 * n_cells + 4]
        state_scr = rest[3 * n_cells + 4 :]  # h/c per cell [R, U]

        s = pl.program_id(1)
        r = keys_ref.shape[0]

        @pl.when(s == 0)
        def _():
            tok_scr[...] = jnp.full_like(tok_scr, cfg.bos_id)
            fin_scr[...] = jnp.zeros_like(fin_scr)
            attn_scr[...] = jnp.zeros_like(attn_scr)
            for st in state_scr:
                st[...] = jnp.zeros_like(st)

        tok_out_ref[0, 0, :, :] = jnp.full((r, 1), cfg.eos_id, jnp.int32)

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )

        @pl.when(jnp.sum(fin_scr[...]) < r)
        def _():
            token = tok_scr[...]  # [R, 1] int32
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (r, cfg.vocab_size), 1)
                == token
            ).astype(jnp.float32)
            x = jnp.concatenate([dot(onehot, emb_ref[...]), attn_scr[...]], axis=-1)
            cell_out = None
            hs = []
            for l in range(n_cells):
                wx, wh, b = (
                    cell_refs[3 * l], cell_refs[3 * l + 1], cell_refs[3 * l + 2]
                )
                h, c = state_scr[2 * l][...], state_scr[2 * l + 1][...]
                gates = dot(x, wx[...]) + b[...][None, :] + dot(h, wh[...])
                gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(gf + 1.0) * c + jax.nn.sigmoid(gi) * jnp.tanh(gg)
                h = jax.nn.sigmoid(go) * jnp.tanh(c)
                state_scr[2 * l][...] = h
                state_scr[2 * l + 1][...] = c
                x = h
            cell_out = x
            q = dot(cell_out, wq_ref[...])  # [R, A]
            act = jnp.tanh(keys_ref[...] + q[:, None, :])
            mask = mask_ref[...]
            scores = (
                jnp.sum(act * v_ref[...][None, None, :], axis=-1)
                + (1.0 - mask) * _NEG
            )
            smax = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - smax) * mask
            probs = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
            ctx = jnp.sum(probs[:, :, None] * mem_ref[...], axis=1)  # [R, M]
            attn_vec = dot(
                jnp.concatenate([cell_out, ctx], axis=-1), attn_ref[...]
            )
            attn_scr[...] = attn_vec
            logits = dot(attn_vec, outw_ref[...]) + outb_ref[...][None, :]
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            fin = fin_scr[...]
            nxt = jnp.where(fin > 0, cfg.eos_id, nxt)
            tok_scr[...] = nxt
            fin_scr[...] = jnp.maximum(
                fin, (nxt == cfg.eos_id).astype(jnp.float32)
            )
            tok_out_ref[0, 0, :, :] = nxt

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps", "interpret"))
def greedy_decode_fused(
    params: SpellerParams,
    cfg: SpellerConfig,
    memory: jnp.ndarray,  # [B, T, M]
    enc_mask: jnp.ndarray,  # [B, T]
    max_steps: int,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (tokens [B, max_steps] <eos>-padded, lengths [B]). Matches
    ``greedy_decode`` output for supported configs (asserted in tests)."""
    assert supports(cfg), "unsupported config for the fused greedy kernel"
    b, t, m = memory.shape
    keys = precompute_keys(params.attention, memory)
    a = keys.shape[-1]

    b_pad = ((b + _ROWS - 1) // _ROWS) * _ROWS
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0), (0, 0))
        memory = jnp.pad(memory, pad)
        keys = jnp.pad(keys, pad)
        enc_mask = jnp.pad(enc_mask, ((0, b_pad - b), (0, 0)))
    n_groups = b_pad // _ROWS

    n_cells = len(params.cells)
    weights = [
        params.embedding.astype(jnp.float32),
        params.attention.wq, params.attention.v,
        params.attention_layer, params.out_w, params.out_b,
    ]
    for cell in params.cells:
        weights += [cell.wx, cell.wh, cell.b]

    grp3 = lambda g, s: (g, 0, 0)
    grp2 = lambda g, s: (g, 0)

    w_specs = [
        pl.BlockSpec(
            w.shape, (lambda g, s, nd=w.ndim: tuple(0 for _ in range(nd))),
            memory_space=pltpu.VMEM,
        )
        for w in weights
    ]

    scratch = [
        pltpu.VMEM((_ROWS, 1), jnp.int32),      # token
        pltpu.VMEM((_ROWS, 1), jnp.float32),    # finished
        pltpu.VMEM((_ROWS, cfg.attn_vec_dim), jnp.float32),  # attn vector
    ]
    for _ in range(2 * n_cells):
        scratch.append(pltpu.VMEM((_ROWS, cfg.units), jnp.float32))

    tokens4 = pl.pallas_call(
        _kernel(cfg, n_cells),
        grid=(n_groups, max_steps),
        in_specs=[
            pl.BlockSpec((_ROWS, t, a), grp3, memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, t, m), grp3, memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, t), grp2, memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec(
            (1, 1, _ROWS, 1), lambda g, s: (g, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_groups, max_steps, _ROWS, 1), jnp.int32
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(keys, memory, enc_mask, *weights)

    tokens = (
        tokens4[..., 0].transpose(0, 2, 1).reshape(b_pad, max_steps)[:b]
    )
    lengths = jnp.sum(jnp.cumsum(tokens == cfg.eos_id, axis=1) == 0, axis=1)
    return tokens, lengths.astype(jnp.int32)
