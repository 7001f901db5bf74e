"""Fully-fused Pallas greedy decoder.

The scan-based greedy loop re-reads attention keys and encoder memory
from HBM every step (~50 MB × steps for a 64×10 s batch — the decode is
memory-bandwidth-bound). This kernel makes the whole decode loop
VMEM-resident: grid = (B/8,) batch groups; each program holds its 8
rows' keys [8, T, A] + memory [8, T, M] (~6 MB at T≈250 post-pyramid)
plus all decoder weights (~3 MB) in VMEM and runs every decode step
inside one ``fori_loop`` — zero HBM traffic per step. Embedding lookup
is a one-hot matmul (V is small); an all-rows-finished predicate skips
the remaining steps' compute entirely (real utterances finish long
before the static cap).

Supported shape (falls back to the XLA scan otherwise — asserted by the
caller): bahdanau attention, attention_layer present, binf_mode 'none'
or 'head' (head ignored at decode), learned embeddings.
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


def _kernel(cfg: SpellerConfig, max_steps: int, n_cells: int):
    def kernel(
        keys_ref, mem_ref, mask_ref,  # [R,T,A], [R,T,M], [R,T]
        emb_ref, wq_ref, v_ref, attn_ref, outw_ref, outb_ref,  # weights
        *cell_and_out_refs,
    ):
        cell_refs = cell_and_out_refs[: 3 * n_cells]  # (wx, wh, b) per cell
        tokens_ref = cell_and_out_refs[3 * n_cells]

        r = keys_ref.shape[0]
        u = cfg.units
        mask = mask_ref[...]  # [R, T]
        neg = (1.0 - mask) * _NEG

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )

        def step_math(token, attn_vec, states):
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (r, cfg.vocab_size), 1)
                == token[:, None]
            ).astype(jnp.float32)
            x = jnp.concatenate([dot(onehot, emb_ref[...]), attn_vec], axis=-1)
            new_states = []
            for l in range(n_cells):
                wx, wh, b = (
                    cell_refs[3 * l], cell_refs[3 * l + 1], cell_refs[3 * l + 2]
                )
                h, c = states[2 * l], states[2 * l + 1]
                gates = dot(x, wx[...]) + b[...][None, :] + dot(h, wh[...])
                gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(gf + 1.0) * c + jax.nn.sigmoid(gi) * jnp.tanh(gg)
                h = jax.nn.sigmoid(go) * jnp.tanh(c)
                new_states += [h, c]
                x = h
            cell_out = x
            q = dot(cell_out, wq_ref[...])  # [R, A]
            act = jnp.tanh(keys_ref[...] + q[:, None, :])
            scores = jnp.sum(act * v_ref[...][None, None, :], axis=-1) + neg
            smax = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - smax) * mask
            probs = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
            ctx = jnp.sum(probs[:, :, None] * mem_ref[...], axis=1)  # [R, M]
            attn_vec = dot(jnp.concatenate([cell_out, ctx], axis=-1), attn_ref[...])
            logits = dot(attn_vec, outw_ref[...]) + outb_ref[...][None, :]
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return nxt, attn_vec, new_states

        def body(t, carry):
            token, finished, attn_vec, tokens, states = carry

            def live(_):
                nxt, new_attn, new_states = step_math(token, attn_vec, states)
                nxt = jnp.where(finished, cfg.eos_id, nxt)
                new_fin = finished | (nxt == cfg.eos_id)
                return nxt, new_fin, new_attn, new_states

            def done(_):
                return (
                    jnp.full_like(token, cfg.eos_id), finished, attn_vec, states
                )

            nxt, new_fin, new_attn, new_states = jax.lax.cond(
                jnp.all(finished), done, live, None
            )
            tokens = jax.lax.dynamic_update_slice(
                tokens, nxt[:, None], (0, t)
            )
            return nxt, new_fin, new_attn, tokens, new_states

        token0 = jnp.full((r,), cfg.bos_id, jnp.int32)
        fin0 = jnp.zeros((r,), bool)
        attn0 = jnp.zeros((r, cfg.attn_vec_dim), jnp.float32)
        toks0 = jnp.full((r, max_steps), cfg.eos_id, jnp.int32)
        states0 = []
        for _ in range(n_cells):
            states0 += [jnp.zeros((r, u), jnp.float32)] * 2
        _, _, _, tokens, _ = jax.lax.fori_loop(
            0, max_steps, body, (token0, fin0, attn0, toks0, states0)
        )
        tokens_ref[...] = tokens

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

    grp3 = lambda g: (g, 0, 0)
    grp2 = lambda g: (g, 0)
    fix = lambda g: tuple(0 for _ in range(2))

    w_specs = []
    for w in weights:
        nd = w.ndim
        w_specs.append(
            pl.BlockSpec(w.shape, (lambda g, nd=nd: tuple(0 for _ in range(nd))),
                         memory_space=pltpu.VMEM)
        )

    tokens = pl.pallas_call(
        _kernel(cfg, max_steps, n_cells),
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((_ROWS, t, a), grp3, memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, t, m), grp3, memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, t), grp2, memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec(
            (_ROWS, max_steps), grp2, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, max_steps), jnp.int32),
        interpret=interpret,
    )(keys, memory, enc_mask, *weights)

    tokens = tokens[:b]
    lengths = jnp.sum(jnp.cumsum(tokens == cfg.eos_id, axis=1) == 0, axis=1)
    return tokens, lengths.astype(jnp.int32)
