"""Pure-JAX audio feature front-end with python_speech_features semantics.

Reference behavior being matched (SURVEY.md §4.5, Appendix A): the
reference's offline prep scripts call ``python_speech_features``
``logfbank``/``mfcc`` with 16 kHz input, 25 ms window / 10 ms hop,
preemphasis 0.97, NFFT 512, HTK mel scale, followed by ``delta`` /
``delta(delta)`` stacking → ``[T, 3*D]``. We reproduce those exact
numerics *on device*:

  * framing: ``num_frames = 1 + ceil((n - win) / hop)`` for ``n > win``
    else 1, signal zero-padded to fill the last frame;
  * preemphasis applied to the whole signal before framing
    (``y[0] = x[0]``, ``y[t] = x[t] - 0.97 x[t-1]``);
  * power spectrum ``(1/NFFT) |rfft(frames, NFFT)|²``;
  * mel filterbank built on *integer FFT-bin edges*
    (``bin = floor((NFFT+1) * hz2bin)``) exactly as psf does;
  * log floor at float64 eps (psf replaces exact zeros with eps; we floor,
    which is identical for non-negative power values below eps);
  * MFCC: ortho DCT-II, 13 ceps, lifter 22, c0 optionally replaced by
    log total frame energy;
  * deltas: window N=2, edge padding, denominator ``2*sum(d²) = 10``.

TPU mapping: the STFT is expressed as a single strided convolution
(equivalently one MXU matmul of framed signal against a real DFT basis),
so the whole front-end is conv → square/add → matmul → log → small conv,
all fusable by XLA. A hand-fused Pallas variant lives in
``pallas_frontend.py``; both are golden-tested against an independent
NumPy oracle in ``tests/``.

All functions are shape-static and jit-safe; batched inputs carry a
per-utterance sample count so padded tails can be masked downstream.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LOG_FLOOR = float(np.finfo(np.float64).eps)  # psf replaces 0 with float64 eps


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Static configuration of the feature front-end.

    Defaults mirror the reference pipeline: 40-dim log-mel fbank + Δ + ΔΔ
    (BASELINE.json configs[0]); ``feature_type='mfcc'`` selects the
    13-coefficient MFCC variant.
    """

    sample_rate: int = 16000
    win_ms: float = 25.0
    hop_ms: float = 10.0
    preemphasis: float = 0.97
    nfft: int = 512
    feature_type: str = "logmel"  # 'logmel' | 'mfcc'
    num_mel: int = 40
    low_hz: float = 0.0
    high_hz: Optional[float] = None  # defaults to sample_rate / 2
    num_ceps: int = 13
    lifter: int = 22
    append_energy: bool = True
    window: str = "rect"  # psf default winfunc is all-ones
    add_deltas: bool = True
    delta_width: int = 2
    # MXU precision of the DFT/mel/DCT matmuls: 'highest' (6-pass f32,
    # required for the fp32-parity north star; rel err vs f64 oracle
    # 1.8e-5 measured on TPU) or 'high' (3-pass bf16 — explicit Dekker
    # split in the Pallas kernel since Mosaic lowers only DEFAULT/HIGHEST;
    # 1.26x faster, rel err 8.7e-4 — fine for training/production).
    # 'default' (1-pass bf16) measures 16% rel err: do not use here.
    precision: str = "highest"

    @property
    def win_samples(self) -> int:
        # psf uses round-half-away via `int(round_half_up(...))`; for
        # 16 kHz/25 ms/10 ms these are exactly 400/160.
        return int(math.floor(self.win_ms * self.sample_rate / 1000.0 + 0.5))

    @property
    def hop_samples(self) -> int:
        return int(math.floor(self.hop_ms * self.sample_rate / 1000.0 + 0.5))

    @property
    def num_bins(self) -> int:
        return self.nfft // 2 + 1

    @property
    def base_dim(self) -> int:
        return self.num_ceps if self.feature_type == "mfcc" else self.num_mel


def feature_dim(cfg: FrontendConfig) -> int:
    """Final per-frame feature dimension (with delta stacking)."""
    return cfg.base_dim * (3 if cfg.add_deltas else 1)


def num_frames(n_samples: int, cfg: FrontendConfig):
    """psf framing count: 1 + ceil((n - win)/hop) for n > win, else 1.

    Works on Python ints (static) and on traced int arrays (per-utterance
    lengths inside jit).
    """
    win, hop = cfg.win_samples, cfg.hop_samples
    if isinstance(n_samples, (int, np.integer)):
        if n_samples <= win:
            return 1
        return 1 + int(math.ceil((n_samples - win) / hop))
    n = jnp.asarray(n_samples)
    extra = jnp.maximum(n - win, 0)
    return 1 + (extra + hop - 1) // hop


def frames_for_samples(n_samples: int, cfg: FrontendConfig) -> int:
    """Static frame count for a padded signal buffer of ``n_samples``."""
    return num_frames(int(n_samples), cfg)


def _window_vector(cfg: FrontendConfig) -> np.ndarray:
    n = cfg.win_samples
    if cfg.window == "rect":
        return np.ones(n, dtype=np.float64)
    if cfg.window == "hamming":
        return np.hamming(n)
    if cfg.window == "hann":
        return np.hanning(n)
    if cfg.window == "povey":
        return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))) ** 0.85
    raise ValueError(f"unknown window {cfg.window!r}")


@functools.lru_cache(maxsize=None)
def _mel_filterbank_np(
    nfft: int, num_mel: int, sample_rate: int, low_hz: float, high_hz: float
) -> np.ndarray:
    """psf-exact mel filterbank, shape [num_bins, num_mel].

    psf builds triangles over *integer* FFT-bin edges
    (``bin = floor((NFFT+1) * mel2hz(melpoints) / rate)``); matching this
    bin quantization is required for fp32 feature parity.
    """

    def hz2mel(hz):
        return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)

    def mel2hz(mel):
        return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)

    low_mel, high_mel = hz2mel(low_hz), hz2mel(high_hz)
    melpoints = np.linspace(low_mel, high_mel, num_mel + 2)
    bins = np.floor((nfft + 1) * mel2hz(melpoints) / sample_rate).astype(np.int64)

    fbank = np.zeros((num_mel, nfft // 2 + 1), dtype=np.float64)
    for j in range(num_mel):
        for i in range(int(bins[j]), int(bins[j + 1])):
            fbank[j, i] = (i - bins[j]) / max(bins[j + 1] - bins[j], 1)
        for i in range(int(bins[j + 1]), int(bins[j + 2])):
            fbank[j, i] = (bins[j + 2] - i) / max(bins[j + 2] - bins[j + 1], 1)
    return fbank.T.copy()  # [num_bins, num_mel]


def mel_filterbank(cfg: FrontendConfig) -> np.ndarray:
    high = cfg.high_hz if cfg.high_hz is not None else cfg.sample_rate / 2.0
    return _mel_filterbank_np(cfg.nfft, cfg.num_mel, cfg.sample_rate, cfg.low_hz, float(high))


@functools.lru_cache(maxsize=None)
def _dft_matrices_np(win: int, nfft: int, window: str, win_ms_key: Tuple) -> Tuple[np.ndarray, np.ndarray]:
    del win_ms_key
    k = np.arange(nfft // 2 + 1, dtype=np.float64)
    i = np.arange(win, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(i, k) / nfft  # [win, bins]
    cos_m, sin_m = np.cos(ang), -np.sin(ang)
    return cos_m, sin_m


def dft_matrices(cfg: FrontendConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases with the window folded in, each [win, num_bins].

    ``power[t, k] = ((x_t·cos_k)² + (x_t·sin_k)²) / NFFT`` reproduces
    ``(1/NFFT)|rfft(frames·w, NFFT)|²`` exactly (zero-padding win→nfft is
    implicit: basis rows only cover the first ``win`` samples).
    """
    cos_m, sin_m = _dft_matrices_np(cfg.win_samples, cfg.nfft, cfg.window, ())
    w = _window_vector(cfg)[:, None]
    return (cos_m * w), (sin_m * w)


@functools.lru_cache(maxsize=None)
def _dct_lifter_np(num_mel: int, num_ceps: int, lifter: int) -> Tuple[np.ndarray, np.ndarray]:
    """Ortho DCT-II matrix [num_mel, num_ceps] and lifter vector [num_ceps]."""
    n = np.arange(num_mel, dtype=np.float64)
    k = np.arange(num_ceps, dtype=np.float64)
    dct = np.cos(np.pi * np.outer(n + 0.5, k) / num_mel)  # [num_mel, num_ceps]
    dct *= np.sqrt(2.0 / num_mel)
    dct[:, 0] *= 1.0 / np.sqrt(2.0)
    if lifter > 0:
        lift = 1.0 + (lifter / 2.0) * np.sin(np.pi * k / lifter)
    else:
        lift = np.ones_like(k)
    return dct, lift


def preemphasize(x: jnp.ndarray, coef: float) -> jnp.ndarray:
    """psf sigproc.preemphasis over the last axis: y[0]=x[0]."""
    if coef == 0.0:
        return x
    return jnp.concatenate([x[..., :1], x[..., 1:] - coef * x[..., :-1]], axis=-1)


def frame_signal(x: jnp.ndarray, cfg: FrontendConfig, n_frames: int) -> jnp.ndarray:
    """Frame [..., S] → [..., n_frames, win] with zero pad past the buffer."""
    win, hop = cfg.win_samples, cfg.hop_samples
    needed = (n_frames - 1) * hop + win
    pad = needed - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    return x[..., idx]


# Parity-critical matmuls default to HIGHEST precision: on TPU the
# default is bf16 MXU passes (~1e-2 relative error — measured 13x rel
# err on the DFT projection), which violates the fp32-parity north star.
_HI = jax.lax.Precision.HIGHEST


def mxu_precision(cfg: FrontendConfig):
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[cfg.precision]


def power_spectrum(frames: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """[..., T, win] → [..., T, num_bins] via two MXU matmuls."""
    cos_m, sin_m = dft_matrices(cfg)
    basis = jnp.asarray(np.concatenate([cos_m, sin_m], axis=1), dtype=frames.dtype)
    proj = jnp.matmul(frames, basis, precision=mxu_precision(cfg))  # [..., T, 2*bins]
    re, im = jnp.split(proj, 2, axis=-1)
    return (re * re + im * im) / cfg.nfft


def _deltas(feat: jnp.ndarray, n: int) -> jnp.ndarray:
    """psf delta: edge-padded, denominator 2*Σd²; over axis -2 (time)."""
    denom = 2.0 * sum(d * d for d in range(1, n + 1))
    pad_cfg = [(0, 0)] * feat.ndim
    pad_cfg[-2] = (n, n)
    padded = jnp.pad(feat, pad_cfg, mode="edge")
    t = feat.shape[-2]
    out = jnp.zeros_like(feat)
    for d in range(1, n + 1):
        fwd = jax.lax.slice_in_dim(padded, n + d, n + d + t, axis=-2)
        bwd = jax.lax.slice_in_dim(padded, n - d, n - d + t, axis=-2)
        out = out + d * (fwd - bwd)
    return out / denom


def _clamp_to_length(feat: jnp.ndarray, frame_lengths: jnp.ndarray) -> jnp.ndarray:
    """Replace frames past each utterance's true length with its last true
    frame, so edge-padded deltas match per-utterance (unbatched) extraction
    bit-for-bit. ``feat`` is [..., T, D]; ``frame_lengths`` broadcasts over
    the leading axes."""
    t = feat.shape[-2]
    pos = jnp.arange(t)
    last = jnp.maximum(frame_lengths - 1, 0)[..., None]  # [..., 1]
    idx = jnp.minimum(pos, last)  # [..., T]
    return jnp.take_along_axis(feat, idx[..., None], axis=-2)


def postprocess(
    logmel: jnp.ndarray,  # [..., T, num_mel]
    energy: Optional[jnp.ndarray],  # [..., T] raw power sum (MFCC c0 only)
    cfg: FrontendConfig,
    frame_lengths: Optional[jnp.ndarray] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Shared post-spectrum tail (pure-JAX and Pallas paths): MFCC
    DCT/lifter/energy-c0, per-utterance tail clamping, Δ/ΔΔ stacking."""
    if cfg.feature_type == "logmel":
        base = logmel
    elif cfg.feature_type == "mfcc":
        dct, lift = _dct_lifter_np(cfg.num_mel, cfg.num_ceps, cfg.lifter)
        ceps = jnp.matmul(
            logmel, jnp.asarray(dct, dtype=dtype), precision=mxu_precision(cfg)
        )
        ceps = ceps * jnp.asarray(lift, dtype=dtype)
        if cfg.append_energy:
            assert energy is not None, "MFCC c0 needs the frame energy"
            log_e = jnp.log(jnp.maximum(energy, _LOG_FLOOR))
            ceps = jnp.concatenate([log_e[..., None], ceps[..., 1:]], axis=-1)
        base = ceps
    else:
        raise ValueError(f"unknown feature_type {cfg.feature_type!r}")

    if frame_lengths is not None:
        base = _clamp_to_length(base, frame_lengths)
    if not cfg.add_deltas:
        return base
    d1 = _deltas(base, cfg.delta_width)
    if frame_lengths is not None:
        # re-clamp between delta passes: otherwise ΔΔ near a true end sees
        # Δ values computed from the clamped tail instead of psf's
        # edge-padded Δ, breaking parity on the last `delta_width` frames.
        d1 = _clamp_to_length(d1, frame_lengths)
    d2 = _deltas(d1, cfg.delta_width)
    return jnp.concatenate([base, d1, d2], axis=-1)


def extract_features(
    signal: jnp.ndarray,
    cfg: FrontendConfig,
    *,
    n_frames: Optional[int] = None,
    sample_lengths: Optional[jnp.ndarray] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Full front-end: PCM [..., S] float → features [..., T, feature_dim].

    ``n_frames`` fixes the static output length (defaults to the frame
    count of the padded buffer). For batched padded input, pass
    ``sample_lengths`` (true PCM samples per row, broadcasting over leading
    axes). Two padded-batch artifacts are then corrected so true frames
    bit-match per-utterance extraction: (a) preemphasis leaks
    ``-coef·x[len-1]`` into the first padding sample, so the preemphasized
    signal is re-zeroed past the true length; (b) delta edge-padding must
    see each utterance's true final frame, so frames past
    ``num_frames(len)`` are clamped to it before the delta stack. Frames
    past the true frame count must still be masked downstream.
    """
    if n_frames is None:
        n_frames = frames_for_samples(signal.shape[-1], cfg)
    frame_lengths = None
    x = signal.astype(dtype)
    x = preemphasize(x, cfg.preemphasis)
    if sample_lengths is not None:
        sample_lengths = jnp.asarray(sample_lengths)
        pos = jnp.arange(x.shape[-1])
        x = jnp.where(pos < sample_lengths[..., None], x, 0)
        frame_lengths = num_frames(sample_lengths, cfg)
    frames = frame_signal(x, cfg, n_frames)
    pspec = power_spectrum(frames, cfg)

    fb = jnp.asarray(mel_filterbank(cfg), dtype=dtype)
    mel = jnp.matmul(pspec, fb, precision=mxu_precision(cfg))
    logmel = jnp.log(jnp.maximum(mel, _LOG_FLOOR))
    needs_energy = cfg.feature_type == "mfcc" and cfg.append_energy
    energy = jnp.sum(pspec, axis=-1) if needs_energy else None
    return postprocess(logmel, energy, cfg, frame_lengths, dtype=dtype)
