"""Speller: attention decoder over the listener's output.

Reference shape (SURVEY.md §3 Speller row): token embedding →
Bahdanau/Luong attention wrapped around a multi-layer LSTM (TF1
``AttentionWrapper`` semantics: cell input is ``[embedding; previous
attention vector]``; the attention vector is a linear projection of
``[cell_output; context]``); output projection to the vocab. Training
uses teacher forcing with optional scheduled sampling
(``ScheduledEmbeddingTrainingHelper``-style per-step Bernoulli mixing);
eval/predict use the greedy/beam loops in ``phones_las_tpu.decode``.

Everything here is a pure function of (params, carry, inputs) so the same
``speller_step`` body serves the teacher-forced scan, the greedy loop,
and the vectorized beam search without re-tracing different code paths.

Binf output modes (SURVEY.md §3 Binf machinery):
  * ``binf_head``   — auxiliary sigmoid head on the attention vector [D];
  * ``binf_logits`` — output projection into binf space, phone logits
    recovered through the static phone-code matrix [M];
  * ``binf_embedding`` — token embeddings derived from phone codes [M].
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from phones_las_tpu.ops.attention import (
    AttentionParams,
    attention_context,
    attention_scores,
    init_attention_params,
    precompute_keys,
)
from phones_las_tpu.ops.lstm import (
    LSTMParams,
    init_lstm_params,
    resolve_rnn_precision,
)

_HI = jax.lax.Precision.HIGHEST


def _recurrent_dot(h: jnp.ndarray, wh: jnp.ndarray) -> jnp.ndarray:
    """The decoder cell's h·Wh dot, honoring the ambient matmul-precision
    scope the same way the encoder's Pallas recurrence does
    (``ops.lstm.resolve_rnn_precision``): parity mode (the CLI default, or
    no scope) keeps the 6-pass f32 MXU dot; production mode
    (``--precision default``) runs one bf16×bf16→f32 pass with f32
    accumulation and cell state. The ambient value is part of jit's trace
    context, so both modes get their own compiled step."""
    if resolve_rnn_precision(None) == "bf16":
        return jnp.dot(
            h.astype(jnp.bfloat16), wh.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.matmul(h, wh, precision=_HI)


@dataclasses.dataclass(frozen=True)
class SpellerConfig:
    vocab_size: int = 50
    embedding_dim: int = 128
    num_layers: int = 1
    units: int = 256
    memory_dim: int = 512  # listener output dim (2 × encoder units)
    attention_type: str = "bahdanau"  # see ops.attention variants
    attention_units: int = 256
    # sigmoid noise for *_monotonic attention during training (TF
    # sigmoid_noise; 1.0 encourages discrete attend/skip decisions)
    monotonic_noise: float = 1.0
    # decode-time monotonic mode: 'parallel' (soft recursion, TF default)
    # or 'hard' (deterministic attend-first decisions; training always
    # uses 'parallel')
    monotonic_mode: str = "parallel"
    # decode-time pre-sigmoid energy bias for *_monotonic attention
    # (hard-mode calibration; 0 = trained operating point)
    monotonic_bias: float = 0.0
    attention_layer_size: int = 256  # 0 → raw [cell_out; context] as attn vector
    sampling_probability: float = 0.0
    bos_id: int = 1
    eos_id: int = 2
    # binary phonological features ("binf"):
    num_binf: int = 0  # 0 → no binf machinery
    binf_mode: str = "none"  # 'none' | 'head' | 'logits' | 'embedding'

    @property
    def attn_vec_dim(self) -> int:
        if self.attention_layer_size > 0:
            return self.attention_layer_size
        return self.units + self.memory_dim


class SpellerParams(NamedTuple):
    embedding: jnp.ndarray  # [V, E] (or [num_binf, E] proj for binf_embedding)
    cells: Tuple[LSTMParams, ...]
    attention: AttentionParams
    attention_layer: Optional[jnp.ndarray]  # [units + memory_dim, attn_layer_size]
    out_w: jnp.ndarray  # [attn_vec_dim, V] (or [attn_vec_dim, num_binf] for binf_logits)
    out_b: jnp.ndarray
    binf_w: Optional[jnp.ndarray]  # auxiliary binf head [attn_vec_dim, num_binf]
    binf_b: Optional[jnp.ndarray]
    # static phone → binf code matrix [V, num_binf]; non-trainable, carried
    # in params so the whole model stays one pytree.
    binf_codes: Optional[jnp.ndarray]


def _glorot(key, shape, dtype=jnp.float32):
    s = jnp.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, dtype, -s, s)


def init_speller(
    key,
    cfg: SpellerConfig,
    binf_codes: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> SpellerParams:
    keys = jax.random.split(key, 6 + cfg.num_layers)
    if cfg.binf_mode == "embedding":
        assert binf_codes is not None and cfg.num_binf > 0
        embedding = _glorot(keys[0], (cfg.num_binf, cfg.embedding_dim), dtype)
    else:
        embedding = jax.random.normal(keys[0], (cfg.vocab_size, cfg.embedding_dim), dtype)

    cells = []
    in_dim = cfg.embedding_dim + cfg.attn_vec_dim
    for l in range(cfg.num_layers):
        cells.append(init_lstm_params(keys[1 + l], in_dim, cfg.units, dtype))
        in_dim = cfg.units

    attention = init_attention_params(
        keys[-4],
        cfg.attention_type,
        query_dim=cfg.units,
        memory_dim=cfg.memory_dim,
        attn_units=cfg.attention_units,
        dtype=dtype,
    )
    attn_layer = (
        _glorot(keys[-3], (cfg.units + cfg.memory_dim, cfg.attention_layer_size), dtype)
        if cfg.attention_layer_size > 0
        else None
    )
    out_dim = cfg.num_binf if cfg.binf_mode == "logits" else cfg.vocab_size
    out_w = _glorot(keys[-2], (cfg.attn_vec_dim, out_dim), dtype)
    out_b = jnp.zeros((out_dim,), dtype)
    if cfg.binf_mode == "head":
        assert cfg.num_binf > 0
        binf_w = _glorot(keys[-1], (cfg.attn_vec_dim, cfg.num_binf), dtype)
        binf_b = jnp.zeros((cfg.num_binf,), dtype)
    else:
        binf_w = binf_b = None
    codes = None
    if cfg.binf_mode != "none":
        assert binf_codes is not None, f"binf_mode={cfg.binf_mode} needs binf_codes"
        codes = jnp.asarray(binf_codes, dtype)
    return SpellerParams(
        embedding, tuple(cells), attention, attn_layer, out_w, out_b, binf_w, binf_b, codes
    )


class SpellerCarry(NamedTuple):
    states: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]  # per layer (h, c)
    attn_vec: jnp.ndarray  # [B, attn_vec_dim]
    alignment: jnp.ndarray  # [B, T_enc] previous attention distribution


def init_speller_carry(
    cfg: SpellerConfig, batch: int, enc_len: int = 1, dtype=jnp.float32
) -> SpellerCarry:
    # decoder state stays f32 even over a bf16 memory (production mode
    # streams the encoder output bf16): speller_step's cell/attention
    # math runs f32, so a low-precision carry would break scan typing
    dtype = jnp.promote_types(dtype, jnp.float32)
    states = tuple(
        (jnp.zeros((batch, cfg.units), dtype), jnp.zeros((batch, cfg.units), dtype))
        for _ in range(cfg.num_layers)
    )
    if cfg.attention_type.endswith("_monotonic"):
        # TF monotonic initial alignment: dirac at the first frame
        align = jnp.zeros((batch, enc_len), dtype).at[:, 0].set(1.0)
    else:
        align = jnp.zeros((batch, enc_len), dtype)
    return SpellerCarry(states, jnp.zeros((batch, cfg.attn_vec_dim), dtype), align)


def embed_tokens(params: SpellerParams, cfg: SpellerConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Token ids → embeddings; binf_embedding mode goes through the code
    matrix (unseen-phone transfer: new phones only need new codes)."""
    if cfg.binf_mode == "embedding":
        return params.binf_codes[tokens] @ params.embedding
    return params.embedding[tokens]


def speller_step(
    params: SpellerParams,
    cfg: SpellerConfig,
    carry: SpellerCarry,
    token_emb: jnp.ndarray,  # [B, E]
    keys: jnp.ndarray,  # [B, Tenc, A] precomputed attention keys
    memory: jnp.ndarray,  # [B, Tenc, M] listener outputs
    enc_mask: jnp.ndarray,  # [B, Tenc]
    forget_bias: float = 1.0,
    noise_rng: Optional[jax.Array] = None,
    sigmoid_noise: float = 0.0,
    monotonic_mode: Optional[str] = None,  # None → cfg.monotonic_mode
):
    """One decode step → (carry', logits [B, V], extras dict).

    extras: 'probs' (attention alignments, for the diagonal-alignment
    summary images), 'binf_logits' when a binf mode is active.
    """
    x = jnp.concatenate([token_emb, carry.attn_vec], axis=-1)
    new_states = []
    for (h, c), cell in zip(carry.states, params.cells):
        gates = x @ cell.wx + cell.b + _recurrent_dot(h, cell.wh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        new_states.append((h, c))
        x = h
    cell_out = x

    probs = attention_scores(
        params.attention, cfg.attention_type, cell_out, keys, enc_mask,
        prev_align=carry.alignment, sigmoid_noise=sigmoid_noise,
        noise_rng=noise_rng,
        monotonic_mode=monotonic_mode or cfg.monotonic_mode,
        monotonic_bias=cfg.monotonic_bias,
    )
    ctx = attention_context(probs, memory)
    combined = jnp.concatenate([cell_out, ctx], axis=-1)
    attn_vec = combined @ params.attention_layer if params.attention_layer is not None else combined

    raw = attn_vec @ params.out_w + params.out_b
    extras = {"probs": probs}
    if cfg.binf_mode == "logits":
        # raw are binf-space logits; phone score = code-match against the
        # static phone-code matrix → enables transfer to unseen phones.
        extras["binf_logits"] = raw
        logits = raw @ params.binf_codes.T
    else:
        logits = raw
        if cfg.binf_mode == "head":
            extras["binf_logits"] = attn_vec @ params.binf_w + params.binf_b
    return SpellerCarry(tuple(new_states), attn_vec, probs), logits, extras


def teacher_forced_decode(
    params: SpellerParams,
    cfg: SpellerConfig,
    decoder_inputs: jnp.ndarray,  # [B, S] token ids, row 0 = <sos>
    memory: jnp.ndarray,
    enc_mask: jnp.ndarray,
    *,
    sampling_rng: Optional[jax.Array] = None,
    sampling_probability: Optional[jnp.ndarray] = None,
):
    """Teacher-forced (optionally scheduled-sampling) pass.

    → (logits [B, S, V], attention probs [B, S, Tenc], binf logits or None).
    With ``cfg.sampling_probability > 0`` and a ``sampling_rng``, each
    step's input token is, per batch element, the sampled token from the
    previous step's logits with that probability (TF
    ``ScheduledEmbeddingTrainingHelper`` semantics).
    ``sampling_probability`` optionally overrides the config value with a
    traced scalar (scheduled-sampling ramps).
    """
    b, s = decoder_inputs.shape
    keys = precompute_keys(params.attention, memory)
    carry0 = init_speller_carry(cfg, b, memory.shape[1], memory.dtype)
    sp = (
        sampling_probability
        if sampling_probability is not None
        else cfg.sampling_probability
    )
    # Gate on the *effective* probability: a traced override counts even if
    # the static cfg value is 0 (otherwise an override >0 would silently
    # no-op when cfg.sampling_probability == 0).
    use_ss = sampling_rng is not None and (
        sampling_probability is not None or cfg.sampling_probability > 0.0
    )
    use_rng = sampling_rng is not None
    monotonic = cfg.attention_type.endswith("_monotonic")

    inputs_tm = jnp.transpose(decoder_inputs, (1, 0))  # [S, B]

    def step(loop_carry, inp):
        carry, prev_sampled = loop_carry
        token, rng = inp
        rng_b = rng_c = rng_n = None
        if use_rng:
            rng_b, rng_c, rng_n = jax.random.split(rng, 3)
        if use_ss:
            take_sample = jax.random.bernoulli(rng_b, sp, (b,)) & (
                prev_sampled >= 0
            )
            token = jnp.where(take_sample, jnp.maximum(prev_sampled, 0), token)
        emb = embed_tokens(params, cfg, token)
        carry, logits, extras = speller_step(
            params, cfg, carry, emb, keys, memory, enc_mask,
            noise_rng=rng_n if (monotonic and use_rng) else None,
            sigmoid_noise=cfg.monotonic_noise if monotonic else 0.0,
            monotonic_mode="parallel",  # training/teacher forcing
        )
        if use_ss:
            sampled = jax.random.categorical(rng_c, logits, axis=-1)
        else:
            sampled = jnp.full((b,), -1, jnp.int32)
        out = (logits, extras["probs"], extras.get("binf_logits", jnp.zeros((b, 0))))
        return (carry, sampled), out

    rngs = (
        jax.random.split(sampling_rng, s)
        if use_rng
        else jnp.zeros((s, 2), jnp.uint32)
    )
    init = (carry0, jnp.full((b,), -1, jnp.int32))
    # Rematerialize the step in the VJP: without this, scan saves every
    # step's attention internals (the [B, Tenc, A] tanh tensor alone is
    # ~3 MB/step here) as residuals — hundreds of MB of HBM traffic that
    # made the speller's backward ~6x its forward. Recomputing the step is
    # cheaper than streaming the residuals (measured on v5e, B=32 x 8 s:
    # full train step 27.1 -> 20.7 ms production, 46.5 -> 40.6 parity).
    step = jax.checkpoint(step, policy=jax.checkpoint_policies.nothing_saveable)
    (_, _), (logits_tm, probs_tm, binf_tm) = jax.lax.scan(step, init, (inputs_tm, rngs))
    logits = jnp.transpose(logits_tm, (1, 0, 2))
    probs = jnp.transpose(probs_tm, (1, 0, 2))
    binf = jnp.transpose(binf_tm, (1, 0, 2)) if binf_tm.shape[-1] else None
    return logits, probs, binf
