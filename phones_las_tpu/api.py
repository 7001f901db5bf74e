"""High-level library API: load a trained run and transcribe audio.

The reference exposes only CLIs; this adds the library-level entry a
production user expects — point at a workdir, get phone/grapheme
sequences for wav/flac/sphere files or raw PCM arrays.

Example::

    from phones_las_tpu.api import Transcriber

    t = Transcriber("runs/timit")
    print(t.transcribe_files(["sa1.wav"]))           # [['sil', 'ʃ', ...]]
    print(t.transcribe(pcm_int16_array))             # single utterance
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _smoothed_energy(audio: np.ndarray, frame: int, smooth: int) -> np.ndarray:
    """Per-frame RMS energy, mean-smoothed over ``smooth`` frames.

    The smoothing is edge-adaptive (mean over the neighbors that exist),
    so interior frames get identical values whether the array is a whole
    recording or a streaming buffer slice — the property the offline and
    streaming segmenters rely on to pick identical cuts.
    """
    nf = audio.shape[0] // frame
    x = audio[: nf * frame].astype(np.float64).reshape(nf, frame)
    e = np.sqrt((x * x).mean(axis=1))
    if smooth > 1 and nf > 0:
        c = np.concatenate([[0.0], np.cumsum(e)])
        half = smooth // 2
        lo = np.maximum(np.arange(nf) - half, 0)
        hi = np.minimum(np.arange(nf) + half + 1, nf)
        e = (c[hi] - c[lo]) / (hi - lo)
    return e


class PauseSegmenter:
    """Cut-point rule for pause-snapped long-form segmentation.

    Nominal cuts sit every ``window_samples``; each is snapped to the
    center of the *longest low-energy run* of the smoothed short-time
    energy within ±``search_samples`` of its nominal position — i.e.
    into the widest pause, not merely the quietest instant. Segments
    then start and end in silence, like the utterances the model was
    trained on; the long-form stitching cliff (docs/ACCURACY.md) was
    caused by fixed-stride windows starting mid-word, which derails whole
    window decodes (measured 17.9% within-window PER vs 1.6% batch on the
    same checkpoint, tools/longform_debug.py). Run *length* is the
    criterion (rather than the energy argmin) because near-silent
    stretches inside words — plosive closures run 30–55 ms — can tie
    the noise floor of a real inter-word pause (60–180 ms+); an argmin
    picker cuts mid-word inside a stop closure whenever noise
    fluctuation favors it. The energy threshold separating "quiet" from
    "speech" is computed from the search region alone (min + 25% of the
    min→median spread), never from whole-buffer statistics, so the
    offline and streaming passes agree by construction.

    Framing is absolute (frame k covers samples ``[k·f, (k+1)·f)`` of the
    *recording*, not of the buffer), so a streaming session that only
    ever sees a suffix of the audio picks the same cuts as the offline
    pass, provided it holds back ``margin`` samples of lookahead past the
    search region (the smoothing neighborhood).
    """

    def __init__(self, sample_rate: int, window_samples: int,
                 search_samples: int, *, frame_seconds: float = 0.010,
                 smooth_frames: int = 5):
        if not 0 < search_samples < window_samples // 2:
            raise ValueError(
                f"need 0 < search ({search_samples}) < window/2 "
                f"({window_samples // 2})"
            )
        self.f = max(1, int(frame_seconds * sample_rate))
        self.win = int(window_samples)
        self.search = int(search_samples)
        self.smooth = int(smooth_frames)
        # lookahead a streaming caller must have past target+search
        # before the cut is final (right smoothing neighborhood)
        self.margin = (self.smooth // 2 + 1) * self.f
        # longest segment two snapped cuts can produce (prev snapped
        # -search, next snapped +search) — the decode pad length
        self.max_segment = self.win + 2 * self.search

    def next_cut(self, audio: np.ndarray, base: int, prev_cut: int,
                 total: int, ended: bool) -> Optional[int]:
        """Next absolute cut after ``prev_cut``, or None.

        ``audio`` is the buffer covering absolute samples
        ``[base, base + len(audio))`` with ``base % f == 0`` and
        ``base <= prev_cut``; ``total`` is the stream length so far.
        None means: need more audio (``ended=False``), or the remainder
        is the final tail segment (``ended=True``).
        """
        assert base % self.f == 0 and base <= prev_cut, (base, prev_cut)
        target = prev_cut + self.win
        if ended:
            if total <= target + self.search:
                return None
        elif total < target + self.search + self.margin:
            return None
        e = _smoothed_energy(audio, self.f, self.smooth)
        b0 = base // self.f
        # frames fully inside [target-search, target+search] ∩ (prev_cut, total]
        lo = max(-(-(target - self.search) // self.f), prev_cut // self.f + 1)
        hi = min((target + self.search) // self.f, b0 + e.shape[0])
        if hi <= lo:  # degenerate (tiny window/search): cut at nominal
            return min(target, total)
        region = e[lo - b0 : hi - b0]
        thr = region.min() + 0.25 * (np.median(region) - region.min())
        quiet = np.flatnonzero(region <= thr)
        if quiet.size == 0:  # flat region: median == min
            k = lo + int(np.argmin(region))
        else:
            # maximal runs of consecutive quiet frames; widest run wins,
            # ties broken by lower mean energy
            starts = np.flatnonzero(np.diff(quiet, prepend=quiet[0] - 2) > 1)
            runs = np.split(quiet, starts[1:]) if starts.size else [quiet]
            best = min(runs, key=lambda r: (-r.size, region[r].mean()))
            k = lo + int(best[best.size // 2])
        return k * self.f + self.f // 2


def find_pause_cuts(audio: np.ndarray, sample_rate: int,
                    window_samples: int, search_samples: int) -> List[int]:
    """Pause-snapped segment boundaries for a whole recording:
    ``[0, cut_1, ..., len(audio)]`` (see ``PauseSegmenter``)."""
    audio = np.asarray(audio)
    n = int(audio.shape[0])
    seg = PauseSegmenter(sample_rate, window_samples, search_samples)
    cuts = [0]
    while True:
        c = seg.next_cut(audio, 0, cuts[-1], n, ended=True)
        if c is None:
            break
        cuts.append(int(c))
    cuts.append(n)
    return cuts


def merge_window_hypotheses(
    per_window: Sequence, starts: Sequence[int], overlap: int
) -> List[int]:
    """Merge per-window (token_ids, token_times) into one sequence.

    ``per_window[i]`` is ``(ids, times)`` for the window starting at
    ``starts[i]``; ``times`` are *absolute* sample positions (attention
    peaks mapped back through the pyramid and frame hop). Each pair of
    consecutive windows overlaps by ``overlap`` samples; the cut point is
    the overlap midpoint — window i contributes tokens strictly before it,
    window i+1 from it on. This reproduces the standard overlapping-window
    long-form recipe (each token is taken from the window where it sits
    furthest from a boundary, where the model has full acoustic context).
    """
    merged: List[int] = []
    n = len(per_window)
    for i, (ids, times) in enumerate(per_window):
        lo = -np.inf if i == 0 else starts[i] + overlap / 2.0
        hi = np.inf if i == n - 1 else starts[i + 1] + overlap / 2.0
        for tok, tm in zip(ids, times):
            if lo <= tm < hi:
                merged.append(int(tok))
    return merged


def _ctc_logp(params, memory, ctc_alpha):
    """Log-softmax CTC head for one-pass joint decoding (None when off)."""
    if ctc_alpha is None:
        return None
    import jax

    return jax.nn.log_softmax(memory @ params.ctc_w + params.ctc_b, axis=-1)


class Transcriber:
    def __init__(
        self,
        workdir: str,
        *,
        beam_width: Optional[int] = None,
        length_penalty: float = 0.0,
        head: str = "phone",
        implementation: str = "auto",
        max_device_batch: int = 64,
        data_parallel: int = 1,
        average_checkpoints: int = 1,
        lm: Optional[str] = None,
        lm_weight: float = 0.3,
        ctc_joint: Optional[float] = None,
    ):
        import dataclasses

        import jax

        from phones_las_tpu.cli.common import resolve_preset
        from phones_las_tpu.train import Trainer
        from phones_las_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
        cfg_file = json.load(open(os.path.join(workdir, "config.json")))
        # replay the hparam overrides the run was trained with (shapes
        # must match the checkpoint)
        preset, vocab, gvocab, _, binf_codes = resolve_preset(
            cfg_file["preset"], cfg_file["data"],
            cfg_file.get("overrides") or None,
        )
        if cfg_file.get("precision"):
            preset = dataclasses.replace(
                preset, model=dataclasses.replace(
                    preset.model, matmul_precision=cfg_file["precision"]),
            )
        # batches larger than this are dispatched as back-to-back waves of
        # this size: B=64 is the measured per-chip throughput sweet spot,
        # and the device runs queued programs in order, so splitting keeps
        # the peak rate where one giant program falls off it (docs/PERF.md
        # B=256 row).
        self.max_device_batch = max_device_batch
        trainer = Trainer(
            preset.model, preset.train, workdir=workdir,
            binf_codes=binf_codes, implementation=implementation,
        )
        assert int(trainer.state.step) > 0, f"no checkpoint in {workdir}"
        self.params = trainer.state.params
        if average_checkpoints > 1:
            from phones_las_tpu.train.checkpoint import load_averaged_params

            self.params, _ = load_averaged_params(
                workdir, trainer.state, average_checkpoints
            )
        # multi-chip DP inference (BASELINE configs[4] shape): waves carry
        # data_parallel × max_device_batch utterances with the batch axis
        # sharded over a ('data',) mesh; decode is embarrassingly parallel
        # over utterances, so GSPMD partitions every program with zero
        # collectives and each chip runs its B=max_device_batch slice.
        if data_parallel == 0:
            data_parallel = len(jax.devices())
        self.data_parallel = max(1, int(data_parallel))
        self.mesh = None
        if self.data_parallel > 1:
            from phones_las_tpu.parallel import make_mesh, shard_params

            assert self.data_parallel <= len(jax.devices()), (
                f"data_parallel={self.data_parallel} but only "
                f"{len(jax.devices())} local device(s)"
            )
            self.mesh = make_mesh(
                data=self.data_parallel, model=1,
                devices=jax.devices()[: self.data_parallel],
            )
            self.params = shard_params(self.params, self.mesh)
        self.model_cfg = preset.model
        self.impl = trainer.implementation
        self.beam = beam_width if beam_width is not None else preset.beam_width
        self.length_penalty = length_penalty
        # shallow-fusion n-gram LM (decode/lm.py; beam decoding only)
        self.lm_logp = None
        self.lm_weight = float(lm_weight)
        if lm is not None:
            assert self.beam, "lm fusion requires beam decoding (beam_width > 0)"
            from phones_las_tpu.decode.lm import load_lm

            self.lm_logp = jax.numpy.asarray(load_lm(lm))
        # one-pass joint CTC-attention decoding (decode/ctc.py prefix DP)
        self.ctc_joint = None if ctc_joint is None else float(ctc_joint)
        if self.ctc_joint is not None:
            assert self.beam, "ctc_joint requires beam decoding (beam_width > 0)"
            assert head == "phone", "the CTC head scores phone targets"
            assert trainer.state.params.ctc_w is not None, (
                "ctc_joint needs a model trained with ctc_weight > 0"
            )
        if head == "grapheme":
            assert preset.model.grapheme_speller is not None
            self.speller_cfg = preset.model.grapheme_speller
            self.vocab = gvocab
            self._speller = lambda p: p.grapheme_speller
            self.max_steps = (
                preset.pipeline.max_grapheme_len or preset.pipeline.max_target_len
            )
        else:
            self.speller_cfg = preset.model.speller
            self.vocab = vocab
            self._speller = lambda p: p.speller
            self.max_steps = preset.pipeline.max_target_len
        self._jit_cache: Dict[int, object] = {}
        self._sample_rate = preset.model.frontend.sample_rate
        # longest audio the model ever saw in one training example — the
        # long-form segmenter sizes its windows to this (segments longer
        # than every training utterance decode with extrapolated target
        # lengths, the measured runaway trigger; docs/ACCURACY.md
        # "long-form stitching")
        self.train_max_samples = int(max(preset.pipeline.buckets))

    @classmethod
    def from_artifact(
        cls,
        path: str,
        *,
        beam_width: int = 0,
        length_penalty: float = 0.0,
        implementation: str = "auto",
        max_device_batch: int = 64,
        ctc_joint: Optional[float] = None,
    ) -> "Transcriber":
        """Serve straight from a flat-npz artifact (``utils/param_io``,
        written with ``extras`` carrying vocab/buckets/max_target_len) —
        no workdir, no orbax, no data dir. This is how committed model
        assets (e.g. the long-regime regression-gate checkpoint under
        ``tests/goldens/``) are decoded, and the single-file deploy path
        for small models. The reference ships checkpoint *directories*
        and re-runs the Estimator to decode (SURVEY.md §6)."""
        import jax

        from phones_las_tpu.data.vocab import Vocab
        from phones_las_tpu.utils.jax_cache import enable_compilation_cache
        from phones_las_tpu.utils.param_io import load_artifact

        enable_compilation_cache()
        params, cfg, extras = load_artifact(path)
        for k in ("vocab", "buckets", "max_target_len"):
            assert k in extras, (
                f"{path}: artifact has no '{k}' in __extras__ — re-export "
                f"with tools/export_artifact.py"
            )
        t = object.__new__(cls)
        t.max_device_batch = max_device_batch
        t.params = params
        t.data_parallel = 1
        t.mesh = None
        t.model_cfg = cfg
        t.impl = (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        ) if implementation == "auto" else implementation
        t.beam = beam_width
        t.length_penalty = length_penalty
        t.lm_logp = None
        t.lm_weight = 0.0
        t.ctc_joint = None if ctc_joint is None else float(ctc_joint)
        if t.ctc_joint is not None:
            assert t.beam, "ctc_joint requires beam decoding (beam_width > 0)"
            assert params.ctc_w is not None, (
                "ctc_joint needs a model trained with ctc_weight > 0"
            )
        t.speller_cfg = cfg.speller
        t.vocab = Vocab(list(extras["vocab"]))
        t._speller = lambda p: p.speller
        t.max_steps = int(extras["max_target_len"])
        t._jit_cache = {}
        t._sample_rate = cfg.frontend.sample_rate
        t.train_max_samples = int(max(extras["buckets"]))
        return t

    def replicate(self, n: int = 0) -> List["Transcriber"]:
        """``n`` independent single-device copies (one per local device,
        ``n=0`` = all of them) sharing this instance's loaded params and
        config — replica-per-chip serving.

        The alternative to ``data_parallel`` batch sharding: each replica
        pins a full param copy to its own device (``jax.device_put`` with
        a concrete device commits the arrays, so every jit dispatch on
        that replica runs there), and a request micro-batch occupies one
        chip instead of a slice of all of them. Better tail latency under
        independent request streams (no cross-chip sync per batch, no
        ``max_batch % n_chips`` constraint); ``data_parallel`` remains
        the right shape for one giant offline batch.
        """
        import copy

        import jax

        assert self.mesh is None, (
            "replicate() and data_parallel batch sharding are exclusive"
        )
        devices = jax.devices()
        if n == 0:
            n = len(devices)
        assert n <= len(devices), (n, len(devices))
        host_params = jax.device_get(self.params)  # one host copy
        out = []
        for d in devices[:n]:
            t = copy.copy(self)
            t.params = jax.device_put(host_params, d)
            if self.lm_logp is not None:
                t.lm_logp = jax.device_put(self.lm_logp, d)
            t._jit_cache = {}  # executables are per-device
            out.append(t)
        return out

    def _wave_size(self, n: int) -> int:
        """Utterances per device dispatch: up to max_device_batch per
        chip, always a multiple of the data axis so the shard is even."""
        cap = self.max_device_batch * self.data_parallel
        wave = min(n, cap)
        dp = self.data_parallel
        return ((wave + dp - 1) // dp) * dp

    def _put_inputs(self, wav_batch, wav_lens):
        """Shard a host wave over the mesh's 'data' axis (no-op single
        device: jit moves host arrays itself)."""
        if self.mesh is None:
            return wav_batch, wav_lens
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        return (
            jax.device_put(wav_batch, NamedSharding(self.mesh, P("data", None))),
            jax.device_put(wav_lens, NamedSharding(self.mesh, P("data"))),
        )

    def _infer_fn(self, pad_len: int, batch: int):
        key = (pad_len, batch <= 8)
        if key in self._jit_cache:
            return self._jit_cache[key]
        import jax

        from phones_las_tpu.decode import beam_decode, greedy_decode
        from phones_las_tpu.decode import pallas_greedy
        from phones_las_tpu.models.las import encode

        cfg, sp_cfg, beam = self.model_cfg, self.speller_cfg, self.beam
        get_sp, max_steps, lp = self._speller, self.max_steps, self.length_penalty
        lm_logp, lm_w = self.lm_logp, self.lm_weight
        ctc_alpha = self.ctc_joint
        # fused VMEM-resident decoder wins only in its single-group
        # low-latency niche (see decode/pallas_greedy.py)
        use_fused = (
            not beam and batch <= 8 and self.impl == "pallas"
            and self.mesh is None and pallas_greedy.supports(sp_cfg)
        )

        @jax.jit
        def fn(params, audio, lengths):
            with jax.default_matmul_precision(cfg.matmul_precision):
                memory, _, enc_mask = encode(
                    params, cfg, audio, lengths, implementation=self.impl
                )
                if beam:
                    res = beam_decode(
                        get_sp(params), sp_cfg, memory, enc_mask, max_steps,
                        beam_width=beam, length_penalty=lp,
                        lm_logp=lm_logp, lm_weight=lm_w,
                        ctc_logp=_ctc_logp(params, memory, ctc_alpha),
                        ctc_alpha=1.0 if ctc_alpha is None else ctc_alpha,
                    )
                    return res.tokens, res.lengths
                if use_fused:
                    return pallas_greedy.greedy_decode_fused(
                        get_sp(params), sp_cfg, memory, enc_mask, max_steps
                    )
                toks, lens, _ = greedy_decode(
                    get_sp(params), sp_cfg, memory, enc_mask, max_steps
                )
                return toks, lens

        self._jit_cache[key] = fn
        return fn

    def transcribe_batch(
        self, audio: Sequence[np.ndarray], *, pad_quantum: int = 32000
    ) -> List[List[str]]:
        """PCM int16/float arrays → token sequences (one per utterance).

        Batches beyond ``max_device_batch`` are queued as waves of that
        size (the tail wave zero-padded so every wave reuses one compiled
        program); all waves are dispatched before any result is fetched,
        so the device pipeline stays full."""
        b = len(audio)
        lens = np.asarray([a.shape[0] for a in audio], np.int32)
        pad = ((int(lens.max()) + pad_quantum - 1) // pad_quantum) * pad_quantum
        wave = self._wave_size(b)
        # ship int16 when the input is int16 (half the host→device bytes;
        # the device front-end consumes raw PCM values either way)
        dt = (
            np.int16
            if all(np.asarray(a).dtype == np.int16 for a in audio)
            else np.float32
        )
        results = []
        for ofs in range(0, b, wave):
            n = min(wave, b - ofs)
            wav_batch = np.zeros((wave, pad), dt)
            for i in range(n):
                a = audio[ofs + i]
                wav_batch[i, : len(a)] = a
            wav_lens = np.zeros((wave,), np.int32)
            wav_lens[:n] = lens[ofs : ofs + n]
            fn = self._infer_fn(pad, wave)
            results.append((n, fn(self.params, *self._put_inputs(wav_batch, wav_lens))))
        out: List[List[str]] = []
        for n, (toks, out_lens) in results:  # fetch after all dispatches
            toks, out_lens = np.asarray(toks), np.asarray(out_lens)
            out += [self.vocab.decode(toks[i][: out_lens[i]]) for i in range(n)]
        return out

    def transcribe(self, audio: np.ndarray) -> List[str]:
        return self.transcribe_batch([audio])[0]

    def _infer_fn_aligned(self, pad_len: int, batch: int, max_steps: int):
        """Decode (greedy, or beam when configured) that also returns
        per-token attention-peak encoder frames (long-form timestamps)."""
        key = ("aligned", pad_len, batch, max_steps)
        if key in self._jit_cache:
            return self._jit_cache[key]
        import jax
        import jax.numpy as jnp

        from phones_las_tpu.decode import beam_decode, greedy_decode
        from phones_las_tpu.models.las import encode

        cfg, sp_cfg, beam = self.model_cfg, self.speller_cfg, self.beam
        get_sp, lp = self._speller, self.length_penalty
        lm_logp, lm_w = self.lm_logp, self.lm_weight
        ctc_alpha = self.ctc_joint

        @jax.jit
        def fn(params, audio, lengths):
            with jax.default_matmul_precision(cfg.matmul_precision):
                memory, _, enc_mask = encode(
                    params, cfg, audio, lengths, implementation=self.impl
                )
                if beam:
                    res = beam_decode(
                        get_sp(params), sp_cfg, memory, enc_mask, max_steps,
                        beam_width=beam, length_penalty=lp,
                        lm_logp=lm_logp, lm_weight=lm_w,
                        ctc_logp=_ctc_logp(params, memory, ctc_alpha),
                        ctc_alpha=1.0 if ctc_alpha is None else ctc_alpha,
                    )
                    return res.tokens, res.lengths, res.peaks
                toks, lens, aligns = greedy_decode(
                    get_sp(params), sp_cfg, memory, enc_mask, max_steps,
                    return_alignments=True,
                )
                return toks, lens, jnp.argmax(aligns, axis=-1).astype(jnp.int32)

        self._jit_cache[key] = fn
        return fn

    def frame_samples(self) -> float:
        """Input samples per encoder frame (front-end hop × pyramid
        stride) — the unit attention-peak timestamps are measured in."""
        return (
            self.model_cfg.frontend.hop_ms / 1000.0 * self._sample_rate
        ) * self.model_cfg.listener.time_reduction()

    def _stream_adapted_params(self, audio: np.ndarray):
        """Per-stream CMVN: replace the corpus feature mean/std with this
        stream's own (classic speaker/channel adaptation — a long-form
        stream carries ONE speaker draw, and the measured residual
        stitching error is speaker-systematic vowel substitution,
        docs/ACCURACY.md round-5 section). Stats are accumulated on
        device in training-bucket-sized chunks (one compiled program),
        masked to true frame counts; std floored at 1e-3 so silent
        streams cannot blow up the scale."""
        import jax
        import jax.numpy as jnp

        from phones_las_tpu.frontend.features import (
            extract_features,
            num_frames,
        )

        cfg = self.model_cfg
        if not cfg.cmvn:
            return self.params
        chunk = int(self.train_max_samples)
        key = ("cmvn_stats", chunk)
        if key not in self._jit_cache:

            @jax.jit
            def stats(wav, n):
                with jax.default_matmul_precision(cfg.matmul_precision):
                    feats = extract_features(
                        wav[None], cfg.frontend, sample_lengths=n[None]
                    )
                f = num_frames(n, cfg.frontend)
                m = (jnp.arange(feats.shape[1]) < f)[None, :, None]
                feats = feats * m.astype(feats.dtype)
                return feats.sum((0, 1)), (feats * feats).sum((0, 1)), f

            self._jit_cache[key] = stats
        stats = self._jit_cache[key]
        audio = np.asarray(audio)
        s = s2 = np.zeros((), np.float64)
        cnt = 0
        for ofs in range(0, len(audio), chunk):
            seg = audio[ofs : ofs + chunk]
            n = len(seg)
            if n < chunk:
                seg = np.pad(seg, (0, chunk - n))
            a, b, f = stats(jnp.asarray(seg), jnp.asarray(n, jnp.int32))
            s = s + np.asarray(a, np.float64)
            s2 = s2 + np.asarray(b, np.float64)
            cnt += int(f)
        mean = s / max(cnt, 1)
        std = np.sqrt(np.maximum(s2 / max(cnt, 1) - mean * mean, 1e-6))
        std = np.maximum(std, 1e-3)
        return self.params._replace(
            cmvn_mean=jnp.asarray(mean, self.params.cmvn_mean.dtype),
            cmvn_std=jnp.asarray(std, self.params.cmvn_std.dtype),
        )

    def decode_aligned(
        self,
        windows: Sequence[np.ndarray],
        *,
        window_samples: int,
        max_tokens_per_second: float = 25.0,
        steps_cap: Optional[int] = None,
        params=None,
    ) -> List:
        """Decode equal-capacity audio windows with per-token timestamps.

        Returns one ``(ids, times)`` pair per window; ``times`` are sample
        positions *relative to the window start* (attention-peak encoder
        frames mapped back through the pyramid stride and front-end hop).
        This is the building block for long-form stitching
        (``transcribe_long``) and the streaming serve endpoint. Windows
        are dispatched in mesh-sized waves like ``transcribe_batch``.
        """
        sr = self._sample_rate
        fs = self.frame_samples()
        enc_frames = max(1, int(window_samples / fs))
        if steps_cap is None:
            steps_cap = int(window_samples / sr * max_tokens_per_second)
        steps_cap = max(16, min(enc_frames, steps_cap))
        # quantize the dispatch batch to a power of two (≤ the wave cap,
        # kept a data-axis multiple) so a session decoding 1, 3, then 5
        # windows compiles log2(cap) programs at most, not one per
        # distinct window count
        wave = self._wave_size(len(windows))
        cap = self._wave_size(1 << 30)
        if wave < cap:
            wave = self._wave_size(min(cap, 1 << (wave - 1).bit_length()))
        dt = (
            np.int16
            if all(np.asarray(w).dtype == np.int16 for w in windows)
            else np.float32
        )
        dispatched = []
        for ofs in range(0, len(windows), wave):
            chunk = windows[ofs : ofs + wave]
            wav_batch = np.zeros((wave, window_samples), dt)
            wav_lens = np.zeros((wave,), np.int32)
            for i, seg in enumerate(chunk):
                assert len(seg) <= window_samples, (len(seg), window_samples)
                wav_batch[i, : len(seg)] = seg
                wav_lens[i] = len(seg)
            fn = self._infer_fn_aligned(window_samples, wave, steps_cap)
            p = self.params if params is None else params
            dispatched.append(
                (len(chunk), fn(p, *self._put_inputs(wav_batch, wav_lens)))
            )
        out = []
        for n, (toks, lens, peaks) in dispatched:  # fetch after dispatch
            toks, lens = np.asarray(toks), np.asarray(lens)
            peaks = np.asarray(peaks)  # [B, S] attention-peak enc frames
            for i in range(n):
                k = int(lens[i])
                out.append((toks[i][:k], (peaks[i][:k] + 0.5) * fs))
        return out

    def _long_form_cap(self, pad_samples: int,
                       max_tokens_per_second: float) -> int:
        """Per-segment decode step cap for pause-mode long-form: the
        trained target cap, scaled by how much longer the segment pad is
        than the longest training bucket (and never above the rate cap).
        Decoder runaway is an insertion *loop* — a generous cap converts
        one unstable segment into hundreds of insertions (measured
        err 233 at cap 300 vs err 17 at cap 84 on the same segment);
        the trained cap bounds the damage to ~one segment's tokens."""
        scaled = self.max_steps * pad_samples / self.train_max_samples
        rate = pad_samples / self._sample_rate * max_tokens_per_second
        return int(np.ceil(min(max(self.max_steps, scaled), rate)))

    def long_form_geometry(self, overlap_seconds: float = 2.0):
        """Default pause-mode long-form geometry ``(window_seconds,
        search_seconds)``: sized so the longest possible segment (nominal
        window + 2×search after pause snapping) equals the longest
        *training* bucket. Segments then stay inside the audio/target
        length distribution the model was trained on — longer segments
        make the speller extrapolate past every target length it ever
        produced, the measured decoder-runaway trigger (docs/ACCURACY.md
        "long-form stitching"). The search half-width is the requested
        overlap clamped to ⅛ of the bucket, so the geometry is always
        valid (search < window/2) even for short-utterance models."""
        sr = self._sample_rate
        m = self.train_max_samples
        search = min(int(overlap_seconds * sr), m // 8)
        return (m - 2 * search) / sr, search / sr

    def transcribe_long(
        self,
        audio: np.ndarray,
        *,
        window_seconds: Optional[float] = None,
        overlap_seconds: float = 2.0,
        max_tokens_per_second: float = 25.0,
        segmentation: str = "pause",
        adapt_cmvn: bool = False,
    ) -> List[str]:
        """Transcribe audio of arbitrary length (lectures, meetings —
        beyond the utterance lengths LAS was trained on) by splitting it
        into window-sized segments, decoding each, and joining.

        ``segmentation="pause"`` (default): segment boundaries sit every
        ``window_seconds`` but are snapped to the minimum of the smoothed
        short-time energy within ±``overlap_seconds`` — into the nearest
        pause — so every segment starts and ends in low-energy audio like
        a training utterance, and the transcript is the plain
        concatenation of the segment decodes. This is the accuracy-
        preserving mode: fixed-stride windows that start mid-word derail
        whole window decodes (docs/ACCURACY.md "long-form stitching").

        ``segmentation="overlap"``: the classic fixed-stride overlapping
        windows, stitched with token *timestamps* recovered from the
        attention alignments (peak encoder frame → pyramid stride →
        front-end hop → sample position); consecutive windows are cut at
        their overlap midpoint. Useful when the audio has no usable
        pauses (dense cross-talk); measured an order of magnitude worse
        on pause-bearing speech.

        Both modes work with greedy and beam decoding (beam peaks are
        backtraced along the winning beam path,
        ``decode.beam.BeamResult.peaks``), and dispatch segments in
        ``max_device_batch`` waves like ``transcribe_batch``, so a
        one-hour recording runs at batch throughput on one chip. The
        per-segment decode cap scales with the segment length
        (``× max_tokens_per_second``, clipped to the encoder frame
        count) instead of the training preset's static target cap.
        """
        audio = np.asarray(audio)
        sr = self._sample_rate
        if window_seconds is None:
            if segmentation == "pause":
                window_seconds, overlap_seconds = self.long_form_geometry(
                    overlap_seconds
                )
            else:
                window_seconds = 20.0
        win = int(window_seconds * sr)
        ov = int(overlap_seconds * sr)
        assert 0 < ov < win, (ov, win)
        if audio.shape[0] <= win:
            return self.transcribe(audio)
        # ``adapt_cmvn``: normalize with THIS stream's feature stats
        # instead of the corpus stats (per-speaker adaptation; streams
        # shorter than one window skip it — too few frames to estimate)
        params = self._stream_adapted_params(audio) if adapt_cmvn else None
        if segmentation == "pause":
            pad = win + 2 * ov
            cuts = find_pause_cuts(audio, sr, win, ov)
            decoded = self.decode_aligned(
                [audio[a:b] for a, b in zip(cuts[:-1], cuts[1:])],
                window_samples=pad,
                max_tokens_per_second=max_tokens_per_second,
                steps_cap=self._long_form_cap(pad, max_tokens_per_second),
                params=params,
            )
            ids = [int(t) for seg_ids, _ in decoded for t in seg_ids]
            return self.vocab.decode(np.asarray(ids, np.int32))
        assert segmentation == "overlap", segmentation
        hop = win - ov
        starts = list(range(0, audio.shape[0] - ov, hop))
        decoded = self.decode_aligned(
            [audio[s : s + win] for s in starts],
            window_samples=win,
            max_tokens_per_second=max_tokens_per_second,
            params=params,
        )
        per_window = [
            (ids, s0 + times) for s0, (ids, times) in zip(starts, decoded)
        ]
        ids = merge_window_hypotheses(per_window, starts, ov)
        return self.vocab.decode(np.asarray(ids, np.int32))

    def align(self, audio: np.ndarray, tokens: Sequence) -> List:
        """Forced alignment: timestamp each reference token in the audio.

        Teacher-forces the decoder on the given token sequence and reads
        each step's attention-peak encoder frame back through the pyramid
        stride and front-end hop (the same timestamp recovery the
        long-form stitcher uses). The reference has no aligner at all —
        this turns the LAS attention into one for free.

        → ``[(token, time_seconds), ...]``, one entry per input token;
        ``time`` is the attention-peak (acoustic center) of the token.
        Beyond-parity; accuracy follows attention quality (sharp diagonal
        alignments → good timestamps; see the alignment-image summaries).
        """
        import jax
        import jax.numpy as jnp

        tokens = list(tokens)
        as_strings = len(tokens) > 0 and isinstance(tokens[0], str)
        ids = (
            np.asarray(self.vocab.encode(tokens), np.int32)
            if as_strings
            else np.asarray(tokens, np.int32)
        )
        n = int(ids.shape[0])
        assert n > 0, "align needs at least one token"
        audio = np.asarray(audio)
        # pad both axes to quanta so aligning a corpus of naturally
        # varying lengths reuses a handful of compiled programs instead
        # of one XLA compile per distinct (samples, tokens) pair; the
        # length mask hides audio pad, and teacher-forced step i only
        # reads dec_in[:i+1], so trailing token pad can't affect peaks
        pad_samples = ((audio.shape[0] + 31999) // 32000) * 32000
        pad_n = ((n + 15) // 16) * 16
        key = ("align", pad_samples, pad_n)
        fn = self._jit_cache.get(key)
        if fn is None:
            from phones_las_tpu.models.las import encode
            from phones_las_tpu.models.speller import teacher_forced_decode

            cfg, sp_cfg, get_sp = self.model_cfg, self.speller_cfg, self._speller

            @jax.jit
            def fn(params, audio_b, lengths, dec_in):
                with jax.default_matmul_precision(cfg.matmul_precision):
                    memory, _, enc_mask = encode(
                        params, cfg, audio_b, lengths, implementation=self.impl
                    )
                    _, probs, _ = teacher_forced_decode(
                        get_sp(params), sp_cfg, dec_in, memory, enc_mask
                    )
                    return jnp.argmax(probs, axis=-1).astype(jnp.int32)

            self._jit_cache[key] = fn
        dec_in = np.full((1, pad_n), self.speller_cfg.eos_id, np.int32)
        dec_in[0, 0] = self.speller_cfg.bos_id
        dec_in[0, 1:n] = ids[:-1]
        audio_b = np.zeros((1, pad_samples), audio.dtype)
        audio_b[0, : audio.shape[0]] = audio
        lengths = np.asarray([audio.shape[0]], np.int32)
        peaks = np.asarray(
            fn(self.params, audio_b, lengths, dec_in)
        )[0, :n]  # [n] encoder frames
        fs = self.frame_samples() / self._sample_rate
        toks = (
            tokens if as_strings else self.vocab.decode(ids, strip_specials=False)
        )
        return [(t, float((p + 0.5) * fs)) for t, p in zip(toks, peaks)]

    @property
    def sample_rate(self) -> int:
        return self._sample_rate

    def transcribe_files(self, paths: Sequence[str]) -> List[List[str]]:
        """Audio files → token sequences; other sample rates are
        resampled to the model rate (native polyphase resampler)."""
        from phones_las_tpu.data.audio_io import read_audio

        clips = []
        for p in paths:
            pcm, _ = read_audio(p, target_rate=self._sample_rate)
            clips.append(pcm)
        return self.transcribe_batch(clips)
