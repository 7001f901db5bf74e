"""Full LAS model: front-end + listener + (multitask) spellers + losses.

Replaces the reference's ``las_model_fn`` (SURVEY.md §3 model_fn row):
masked sequence cross-entropy over phone targets, optional weighted
grapheme-head loss (multitask), optional binf sigmoid cross-entropy, all
computed inside one jit-compiled function. Mode divergence (train / eval
/ predict) lives in ``phones_las_tpu.train`` and ``phones_las_tpu.decode``
— the model itself is mode-agnostic, as in the reference (§2 note).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from phones_las_tpu.frontend.features import FrontendConfig, extract_features, num_frames
from phones_las_tpu.frontend.cmvn import apply_cmvn
from phones_las_tpu.frontend.specaugment import SpecAugmentConfig, apply_specaugment
from phones_las_tpu.models.listener import (
    ListenerConfig,
    ListenerParams,
    init_listener,
    listen,
)
from phones_las_tpu.models.speller import (
    SpellerConfig,
    SpellerParams,
    init_speller,
    teacher_forced_decode,
)
from phones_las_tpu.ops.masking import length_mask


@dataclasses.dataclass(frozen=True)
class LASConfig:
    frontend: FrontendConfig = dataclasses.field(default_factory=FrontendConfig)
    listener: ListenerConfig = dataclasses.field(default_factory=ListenerConfig)
    speller: SpellerConfig = dataclasses.field(default_factory=SpellerConfig)
    # multitask grapheme head (reference configs[1]); None → single task
    grapheme_speller: Optional[SpellerConfig] = None
    multitask_weight: float = 0.5  # loss = w·phone + (1-w)·grapheme
    binf_weight: float = 1.0  # weight of the auxiliary binf sigmoid CE
    # train-time spectrogram augmentation (beyond-parity; the reference
    # has none). Applied on device inside the jitted train step, after
    # CMVN, before the listener. None → off.
    specaugment: Optional[SpecAugmentConfig] = None
    # VTLP-style frequency-axis warp augmentation (frontend/freq_warp.py):
    # per-utterance α ~ U[1−W, 1+W] channel resampling on the log-mel
    # axis. 0 → off. Requires feature_type='logmel'.
    freq_warp: float = 0.0
    # joint CTC-attention training (beyond-parity; Watanabe et al. 2017,
    # standard in modern LAS toolkits): loss = (1-λ)·attention + λ·CTC
    # over a linear CTC head on the encoder output. The blank label is
    # the vocab's <pad> id (0), which never occurs as a real target.
    # 0 → no CTC head.
    ctc_weight: float = 0.0
    # uniform label smoothing ε on the attention CE losses (0 = off)
    label_smoothing: float = 0.0
    # whether model input is raw PCM (device-resident front-end) or
    # precomputed features (reference-style ingestion path)
    input_is_pcm: bool = True
    cmvn: bool = True
    # default MXU precision for model matmuls (encoder x-projection,
    # attention, output heads): 'highest' reproduces the reference's f32
    # numerics (greedy-decode parity north star); 'default' (bf16) trades
    # parity for speed. Explicit HIGHEST ops (recurrence) are unaffected.
    matmul_precision: str = "highest"


class LASParams(NamedTuple):
    listener: ListenerParams
    speller: SpellerParams
    grapheme_speller: Optional[SpellerParams]
    # CMVN stats as device arrays (non-trainable; zero-mean/unit-std until set)
    cmvn_mean: jnp.ndarray
    cmvn_std: jnp.ndarray
    # linear CTC head on the encoder output (ctc_weight > 0); None leaves
    # keep the pytree structure of pre-CTC checkpoints
    ctc_w: Optional[jnp.ndarray] = None  # [memory_dim, V]
    ctc_b: Optional[jnp.ndarray] = None  # [V]


def init_las(
    key,
    cfg: LASConfig,
    binf_codes: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> LASParams:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    listener_p = init_listener(k1, cfg.listener, dtype)
    speller_p = init_speller(k2, cfg.speller, binf_codes=binf_codes, dtype=dtype)
    grapheme_p = (
        init_speller(k3, cfg.grapheme_speller, dtype=dtype)
        if cfg.grapheme_speller is not None
        else None
    )
    ctc_w = ctc_b = None
    if cfg.ctc_weight > 0.0:
        m, v = cfg.listener.output_dim, cfg.speller.vocab_size
        s = jnp.sqrt(6.0 / (m + v))
        ctc_w = jax.random.uniform(k4, (m, v), dtype, -s, s)
        ctc_b = jnp.zeros((v,), dtype)
    d = cfg.listener.input_dim
    return LASParams(
        listener=listener_p,
        speller=speller_p,
        grapheme_speller=grapheme_p,
        cmvn_mean=jnp.zeros((d,), dtype),
        cmvn_std=jnp.ones((d,), dtype),
        ctc_w=ctc_w,
        ctc_b=ctc_b,
    )


def trainable_filter(params: LASParams):
    """Pytree mask: True for trainable leaves (CMVN stats and static binf
    codes are data, not weights)."""
    speller_mask = jax.tree.map(lambda _: True, params.speller)._replace(
        binf_codes=(False if params.speller.binf_codes is not None else None)
    )
    g = params.grapheme_speller
    g_mask = (
        jax.tree.map(lambda _: True, g)._replace(
            binf_codes=(False if g.binf_codes is not None else None)
        )
        if g is not None
        else None
    )
    return LASParams(
        listener=jax.tree.map(lambda _: True, params.listener),
        speller=speller_mask,
        grapheme_speller=g_mask,
        cmvn_mean=False,
        cmvn_std=False,
        ctc_w=None if params.ctc_w is None else True,
        ctc_b=None if params.ctc_b is None else True,
    )


def featurize(
    params: LASParams,
    cfg: LASConfig,
    audio: jnp.ndarray,  # [B, S] PCM float (or [B, T, D] features)
    audio_lengths: jnp.ndarray,  # samples (or frames)
    *,
    implementation: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-resident front-end + CMVN → (features, frame lengths)."""
    if cfg.input_is_pcm:
        if implementation == "pallas" and audio.ndim == 2:
            from phones_las_tpu.frontend.pallas_frontend import (
                extract_features_pallas,
            )

            feats = extract_features_pallas(
                audio, cfg.frontend, sample_lengths=audio_lengths
            )
        else:
            feats = extract_features(
                audio, cfg.frontend, sample_lengths=audio_lengths
            )
        flens = num_frames(audio_lengths, cfg.frontend)
    else:
        feats, flens = audio, audio_lengths
    if cfg.cmvn:
        feats = apply_cmvn(feats, params.cmvn_mean, params.cmvn_std)
    return feats, flens


def encode(
    params: LASParams,
    cfg: LASConfig,
    audio: jnp.ndarray,
    audio_lengths: jnp.ndarray,
    *,
    train: bool = False,
    dropout_rng=None,
    implementation: str = "xla",
):
    """Front-end + listener → (memory [B, T', M], enc_lengths, enc_mask)."""
    feats, flens = featurize(
        params, cfg, audio, audio_lengths, implementation=implementation
    )
    if train and cfg.freq_warp and dropout_rng is not None:
        if cfg.frontend.feature_type != "logmel":
            raise ValueError(
                "freq_warp warps the log-mel channel axis; it is not a "
                f"spectral warp for feature_type={cfg.frontend.feature_type!r}"
            )
        from phones_las_tpu.frontend.freq_warp import apply_freq_warp

        blocks = 3 if cfg.frontend.add_deltas else 1
        feats = apply_freq_warp(
            jax.random.fold_in(dropout_rng, 0x3F), feats,
            cfg.freq_warp, feats.shape[-1] // blocks,
        )
    if train and cfg.specaugment is not None and dropout_rng is not None:
        blocks = 3 if cfg.frontend.add_deltas else 1
        feats = apply_specaugment(
            jax.random.fold_in(dropout_rng, 0x5A), feats, flens,
            cfg.specaugment, feats.shape[-1] // blocks,
        )
    memory, enc_lens = listen(
        params.listener,
        cfg.listener,
        feats,
        flens,
        train=train,
        dropout_rng=dropout_rng,
        implementation=implementation,
    )
    enc_mask = length_mask(enc_lens, memory.shape[1], memory.dtype)
    return memory, enc_lens, enc_mask


def masked_ce_loss(
    logits: jnp.ndarray,  # [B, S, V]
    targets: jnp.ndarray,  # [B, S]
    target_mask: jnp.ndarray,  # [B, S]
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """tf.contrib.seq2seq.sequence_loss semantics: mean CE over valid
    target positions (average_across_timesteps and _batch).
    ``label_smoothing`` ε mixes the one-hot target with the uniform
    distribution (beyond-parity; the reference's loss is unsmoothed)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        uniform = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * uniform
    denom = jnp.maximum(jnp.sum(target_mask), 1.0)
    return jnp.sum(nll * target_mask) / denom


def binf_sigmoid_loss(
    binf_logits: jnp.ndarray,  # [B, S, F]
    targets: jnp.ndarray,  # [B, S] phone ids
    codes: jnp.ndarray,  # [V, F] static phone→binf map
    target_mask: jnp.ndarray,  # [B, S]
) -> jnp.ndarray:
    """Sigmoid CE of the binf head against each target phone's code."""
    y = codes[targets]  # [B, S, F]
    z = binf_logits
    per = jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    per = jnp.mean(per, axis=-1)
    denom = jnp.maximum(jnp.sum(target_mask), 1.0)
    return jnp.sum(per * target_mask) / denom


def ctc_head_loss(
    params: LASParams,
    cfg: LASConfig,
    memory: jnp.ndarray,  # [B, T', M] encoder output
    enc_mask: jnp.ndarray,  # [B, T']
    targets: jnp.ndarray,  # [B, S] phone ids ending in <eos>
    target_lengths: jnp.ndarray,  # [B] counting the <eos>
) -> jnp.ndarray:
    """CTC loss of the encoder head against the targets WITHOUT their
    <eos> (an attention-decoder artifact, not an acoustic label).
    Blank = <pad> (id 0), never a real target. Per-sequence losses are
    normalized by label length so the scale matches the attention CE.
    Rows whose transcript is empty (only <eos>) carry no acoustic labels
    and are weighted out of the loss entirely."""
    logits = memory @ params.ctc_w + params.ctc_b  # [B, T', V]
    s = targets.shape[1]
    valid = (target_lengths > 1).astype(jnp.float32)  # ≥1 real label
    label_lens = jnp.maximum(target_lengths - 1, 1)  # drop <eos>
    label_pad = (
        jnp.arange(s)[None, :] >= label_lens[:, None]
    ).astype(jnp.float32)
    import optax

    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32),
        1.0 - enc_mask.astype(jnp.float32),
        targets,
        label_pad,
        blank_id=0,
    )
    per_seq = per_seq * valid / label_lens.astype(jnp.float32)
    return jnp.sum(per_seq) / jnp.maximum(jnp.sum(valid), 1.0)


def _shift_right(targets: jnp.ndarray, bos_id: int) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.full_like(targets[:, :1], bos_id), targets[:, :-1]], axis=1
    )


def compute_loss(
    params: LASParams,
    cfg: LASConfig,
    batch: dict,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    implementation: str = "xla",
    encoded: Optional[Tuple] = None,
    sampling_probability: Optional[jnp.ndarray] = None,
):
    """Full forward + losses. Pass ``encoded=(memory, enc_lens, enc_mask)``
    to reuse an existing encoder pass (eval computes loss and decodes
    from the same memory).

    ``batch`` keys: 'audio' [B,S] + 'audio_lengths' [B] (or features if
    ``input_is_pcm=False``); 'targets' [B,St] phone ids ending in <eos>;
    'target_lengths' [B] counting the <eos>; optionally
    'grapheme_targets'/'grapheme_lengths' for the multitask head.

    Returns (loss, aux) where aux carries per-head losses, logits, and
    attention alignments for summaries.
    """
    dropout_rng = sampling_rng = g_sampling_rng = None
    if rng is not None:
        dropout_rng, sampling_rng, g_sampling_rng = jax.random.split(rng, 3)

    if encoded is not None:
        memory, enc_lens, enc_mask = encoded
    else:
        memory, enc_lens, enc_mask = encode(
            params, cfg, batch["audio"], batch["audio_lengths"],
            train=train, dropout_rng=dropout_rng, implementation=implementation,
        )

    targets = batch["targets"]
    t_mask = length_mask(batch["target_lengths"], targets.shape[1], memory.dtype)
    dec_in = _shift_right(targets, cfg.speller.bos_id)
    logits, attn_probs, binf_logits = teacher_forced_decode(
        params.speller, cfg.speller, dec_in, memory, enc_mask,
        sampling_rng=sampling_rng if train else None,
        sampling_probability=sampling_probability,
    )
    phone_loss = masked_ce_loss(
        logits, targets, t_mask,
        label_smoothing=cfg.label_smoothing if train else 0.0,
    )
    aux = {
        "phone_loss": phone_loss,
        "logits": logits,
        "attention": attn_probs,
        "enc_lengths": enc_lens,
    }
    loss = phone_loss

    if cfg.ctc_weight > 0.0:
        cl = ctc_head_loss(
            params, cfg, memory, enc_mask, targets,
            batch["target_lengths"],
        )
        aux["ctc_loss"] = cl
        loss = (1.0 - cfg.ctc_weight) * loss + cfg.ctc_weight * cl

    if cfg.speller.binf_mode == "head" and binf_logits is not None:
        bl = binf_sigmoid_loss(
            binf_logits, targets, params.speller.binf_codes, t_mask
        )
        aux["binf_loss"] = bl
        loss = loss + cfg.binf_weight * bl

    if params.grapheme_speller is not None:
        g_targets = batch["grapheme_targets"]
        g_mask = length_mask(
            batch["grapheme_lengths"], g_targets.shape[1], memory.dtype
        )
        g_in = _shift_right(g_targets, cfg.grapheme_speller.bos_id)
        g_logits, _, _ = teacher_forced_decode(
            params.grapheme_speller, cfg.grapheme_speller, g_in, memory, enc_mask,
            sampling_rng=g_sampling_rng if train else None,
            sampling_probability=sampling_probability,
        )
        g_loss = masked_ce_loss(
            g_logits, g_targets, g_mask,
            label_smoothing=cfg.label_smoothing if train else 0.0,
        )
        aux["grapheme_loss"] = g_loss
        w = cfg.multitask_weight
        loss = w * loss + (1.0 - w) * g_loss

    aux["loss"] = loss
    return loss, aux
