"""Trainer: jit train/eval steps and the outer loop.

Reference equivalents (SURVEY.md §4.1/§4.2): the
``train_and_evaluate`` outer loop with periodic checkpoint + summaries
becomes a plain Python loop around one jit-compiled train step per
bucket shape; the EVAL leg (greedy decode + edit distance + attention
images) is ``evaluate``. Metrics go to TensorBoard via
``clu.metric_writers`` when available, else stdout.
"""

from __future__ import annotations

import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phones_las_tpu.decode import greedy_decode
from phones_las_tpu.frontend.features import frames_for_samples
from phones_las_tpu.models.las import LASConfig, compute_loss, encode
from phones_las_tpu.train import metrics as M
from phones_las_tpu.train.checkpoint import CheckpointManager
from phones_las_tpu.train.state import (
    TrainConfig,
    TrainState,
    create_train_state,
    lr_schedule,
    make_optimizer,
    mask_grads,
)

_DEVICE_KEYS = (
    "audio", "audio_lengths", "targets", "target_lengths",
    "grapheme_targets", "grapheme_lengths",
)


def device_batch(batch: Dict) -> Dict:
    return {k: jnp.asarray(v) for k, v in batch.items() if k in _DEVICE_KEYS}


class Trainer:
    def __init__(
        self,
        model_cfg: LASConfig,
        train_cfg: TrainConfig,
        workdir: Optional[str] = None,
        *,
        binf_codes: Optional[np.ndarray] = None,
        score_fold: Optional[Dict[int, Optional[int]]] = None,
        implementation: str = "auto",
        default_decode_steps: int = 100,
        eval_beam_width: int = 0,
        decode_cap_ratio: float = 1.0,
        grapheme_word_sep_id: Optional[int] = None,
        mesh=None,
    ):
        self.mesh = mesh
        # word-break token id of the grapheme stream (librispeech
        # '<space>', speechlike '|') → periodic eval also reports WER
        self.grapheme_word_sep_id = grapheme_word_sep_id
        self.default_decode_steps = default_decode_steps
        self.eval_beam_width = eval_beam_width
        self.decode_cap_ratio = decode_cap_ratio
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.score_fold = score_fold
        if implementation == "auto":
            # fused Pallas kernels on real TPU (1.5x faster train step,
            # 1.8x faster inference); XLA scan elsewhere (Pallas would
            # run interpreted on CPU)
            implementation = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.implementation = implementation
        self.tx = make_optimizer(train_cfg)
        self.state = create_train_state(
            jax.random.PRNGKey(train_cfg.seed), model_cfg, train_cfg, binf_codes
        )
        self.start_epoch = 0
        self.ckpt = None
        if workdir is not None:
            self.ckpt = CheckpointManager(
                workdir, keep=train_cfg.keep_checkpoints,
                save_every=train_cfg.checkpoint_every,
            )
            if self.ckpt.latest_step() is not None:
                self.state, self.start_epoch = self.ckpt.restore(self.state)
        if mesh is not None:
            self.shard_state_to_mesh()

        cfg = model_cfg
        impl = implementation

        prec = model_cfg.matmul_precision

        def train_step(state: TrainState, batch: Dict):
            rng, step_rng = jax.random.split(state.rng)
            sp = None
            if train_cfg.sampling_ramp_steps > 0:
                sp = cfg.speller.sampling_probability * jnp.minimum(
                    1.0, state.step / train_cfg.sampling_ramp_steps
                )

            def loss_fn(params):
                with jax.default_matmul_precision(prec):
                    return compute_loss(
                        params, cfg, batch, train=True, rng=step_rng,
                        implementation=impl, sampling_probability=sp,
                    )

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            grads = mask_grads(grads, state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            out = {
                "loss": loss,
                "grad_norm": optax.global_norm(grads),
                "lr": lr_schedule(self.train_cfg)(state.step),
            }
            for k in ("phone_loss", "grapheme_loss", "binf_loss", "ctc_loss"):
                if k in aux:
                    out[k] = aux[k]
            return (
                TrainState(state.step + 1, params, opt_state, rng),
                out,
            )

        def eval_step(params, batch: Dict, max_steps: int):
            with jax.default_matmul_precision(prec):
                memory, enc_lens, enc_mask = encode(
                    params, cfg, batch["audio"], batch["audio_lengths"],
                    implementation=impl,
                )
                loss, aux = compute_loss(
                    params, cfg, batch, train=False, implementation=impl,
                    encoded=(memory, enc_lens, enc_mask),
                )
                tokens, lengths, aligns = greedy_decode(
                    params.speller, cfg.speller, memory, enc_mask, max_steps,
                    return_alignments=True,
                )
                out = {
                    "loss": aux["loss"],
                    "tokens": tokens,
                    "lengths": lengths,
                    "alignments": aligns,
                    "enc_lengths": enc_lens,
                }
                if params.grapheme_speller is not None:
                    # score the grapheme head too (multitask CER during eval)
                    g_tokens, g_lengths, _ = greedy_decode(
                        params.grapheme_speller, cfg.grapheme_speller,
                        memory, enc_mask, max_steps,
                    )
                    out["g_tokens"] = g_tokens
                    out["g_lengths"] = g_lengths
            return out

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step, static_argnames=("max_steps",))

    def shard_state_to_mesh(self) -> None:
        """(Re)apply mesh shardings to the train state.

        Mesh-parallel training (DP over 'data', optional TP over 'model'):
        shard params by the partition rules, replicate the scalars, and
        let the jitted optimizer-init propagate the param shardings onto
        Adam's mu/nu (the GSPMD way — no per-optimizer spec trees).
        Batches are sharded in ``_device_batch``; gradient psum over
        'data' is inserted by GSPMD because the loss averages over the
        global batch (the mechanism ``__graft_entry__.dryrun_multichip``
        proves numerically equivalent to the unsharded step). Call again
        after replacing params host-side (warm start, CMVN injection)."""
        assert self.mesh is not None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from phones_las_tpu.parallel import shard_params

        params = shard_params(self.state.params, self.mesh)
        # template init under jit propagates the param shardings onto the
        # optimizer leaves; device_put the *existing* values (possibly a
        # restored checkpoint's Adam moments — do not re-init them) onto
        # those shardings. Leaves with no input dependence (step counters)
        # come out single-device — replicate those over the mesh.
        rep = NamedSharding(self.mesh, P())
        mesh_devices = set(self.mesh.devices.flat)
        # compile (never execute) the template init: output_shardings
        # gives the GSPMD-propagated opt-state shardings without
        # materializing a second copy of the Adam moments on device
        shardings = jax.jit(self.tx.init).lower(params).compile().output_shardings

        def put(s, x):
            s = s if set(s.device_set) == mesh_devices else rep
            return jax.device_put(jnp.asarray(x), s)

        opt_state = jax.tree.map(put, shardings, self.state.opt_state)
        self.state = TrainState(
            jax.device_put(self.state.step, rep),
            params,
            opt_state,
            jax.device_put(self.state.rng, rep),
        )

    def _device_batch(self, batch: Dict) -> Dict:
        if self.mesh is not None:
            from phones_las_tpu.parallel.multihost import shard_batch_global

            return shard_batch_global(batch, self.mesh)
        return device_batch(batch)

    # -- multi-host eval: decode outputs of a cross-process array are not
    # host-fetchable, so each process evaluates its own shard of the eval
    # set locally (params are fully replicated on pure-DP meshes) and the
    # scalar metrics are summed across processes at the end.
    def _multihost(self) -> bool:
        return self.mesh is not None and jax.process_count() > 1

    def _eval_params(self):
        if not self._multihost():
            return self.state.params

        def fetch(x):
            if x is None:
                return None
            assert getattr(x, "is_fully_replicated", True), (
                "multi-host eval needs fully-replicated params; keep the "
                "'model' mesh axis within one process"
            )
            # re-upload once per evaluate(): returning host numpy would
            # make every eval-batch jit call pay a full-model H2D copy
            return jax.device_put(np.asarray(x))

        return jax.tree.map(fetch, self.state.params,
                            is_leaf=lambda x: x is None)

    def _eval_device_batch(self, batch: Dict) -> Dict:
        # multi-host: local (per-process) batches; otherwise mesh-sharded
        return device_batch(batch) if self._multihost() else self._device_batch(batch)

    def _allreduce_metrics(self, values) -> np.ndarray:
        """Sum a small host-side metric vector across processes."""
        vec = np.asarray(values, np.float64)
        if not self._multihost():
            return vec
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(vec)).sum(axis=0)

    # ------------------------------------------------------------------
    def fit(
        self,
        batches,
        *,
        eval_batches_fn=None,
        writer=None,
        log_fn=print,
    ) -> TrainState:
        """Train until ``num_steps``. ``batches`` is either a plain batch
        iterator or a ``DataSource`` — with a DataSource, the current
        epoch is tracked and checkpointed so resume replays the data
        order deterministically from the epoch boundary (reference-style
        silent resume, SURVEY.md §6)."""
        if hasattr(batches, "epoch") and hasattr(batches, "repeat"):
            return self._fit_source(
                batches, eval_batches_fn=eval_batches_fn, writer=writer,
                log_fn=log_fn,
            )
        return self._fit_iter(
            batches, None, eval_batches_fn=eval_batches_fn, writer=writer,
            log_fn=log_fn,
        )

    def _fit_source(self, source, **kw) -> TrainState:
        epoch = self.start_epoch
        while int(self.state.step) < self.train_cfg.num_steps:
            self._fit_iter(source.epoch(epoch), epoch, final_save=False, **kw)
            epoch += 1
        if self.ckpt is not None:
            if self.ckpt.latest_step() != int(self.state.step):
                self.ckpt.save(int(self.state.step), self.state, epoch=epoch,
                               force=True)
            self.ckpt.wait()
        return self.state

    def _fit_iter(
        self,
        batches: Iterator[Dict],
        epoch: Optional[int],
        *,
        eval_batches_fn=None,
        writer=None,
        log_fn=print,
        final_save: bool = True,
    ) -> TrainState:
        tc = self.train_cfg
        t0 = time.time()
        last_ckpt_time = time.time()
        window_n = 0

        def with_lookahead(it):
            # start the (async) host→device transfer of batch N+1 while
            # step N executes, hiding H2D latency behind compute
            prev = None
            for b in it:
                db = self._device_batch(b)
                if prev is not None:
                    yield prev
                prev = (b, db)
            if prev is not None:
                yield prev

        step = int(self.state.step)
        window = []
        for batch, dbatch in with_lookahead(batches):
            if step >= tc.num_steps:
                break
            self.state, out = self._train_step(self.state, dbatch)
            # keep losses as device arrays — a float() here would force a
            # device sync every step and serialize dispatch
            window.append(out["loss"])
            window_n += 1
            step += 1
            if step % tc.log_every == 0 or step == tc.num_steps:
                window_loss = float(jnp.mean(jnp.stack(window)))
                rate = window_n * batch["audio"].shape[0] / (time.time() - t0)
                msg = {
                    "step": step,
                    "loss": window_loss,
                    "utt_per_sec": round(rate, 2),
                    "lr": float(out["lr"]),
                    "grad_norm": float(out["grad_norm"]),
                }
                log_fn({"tag": "train", **msg})
                if writer is not None:
                    writer.write_scalars(step, {k: v for k, v in msg.items() if k != "step"})
                t0, window, window_n = time.time(), [], 0
            if eval_batches_fn is not None and step % tc.eval_every == 0:
                ev = self.evaluate(eval_batches_fn(), writer=writer, step=step,
                                   beam_width=self.eval_beam_width)
                log_fn({"tag": "eval", "step": step, **ev})
                if writer is not None:
                    writer.write_scalars(step, {f"eval/{k}": v for k, v in ev.items()})
            if self.ckpt is not None:
                force = (
                    tc.checkpoint_every_secs > 0
                    and time.time() - last_ckpt_time >= tc.checkpoint_every_secs
                    and self.ckpt.latest_step() != step
                )
                if self.ckpt.save(step, self.state, epoch=epoch or 0, force=force):
                    last_ckpt_time = time.time()
        if final_save and self.ckpt is not None:
            if self.ckpt.latest_step() != int(self.state.step):
                self.ckpt.save(int(self.state.step), self.state,
                               epoch=epoch or 0, force=True)
            self.ckpt.wait()
        return self.state

    # ------------------------------------------------------------------
    def evaluate(
        self,
        batches: Iterator[Dict],
        max_steps: Optional[int] = None,
        *,
        writer=None,
        step: Optional[int] = None,
        beam_width: int = 0,
    ) -> Dict:
        """Eval leg (reference EVAL mode, SURVEY.md §4.2): loss + greedy
        (or beam when ``beam_width > 0``) decode + edit-distance PER +
        alignment image."""
        if beam_width:
            return self._evaluate_beam(batches, max_steps, beam_width)
        return self._evaluate_greedy(batches, max_steps, writer, step)

    def _beam_eval_fn(self):
        # built once and cached: jax's jit cache is keyed on function
        # identity, so a fresh closure per evaluate() would retrace (and
        # cold-recompile) the encode+loss+beam program at every periodic
        # eval.
        if getattr(self, "_beam_eval_jit", None) is not None:
            return self._beam_eval_jit
        import functools

        from phones_las_tpu.decode import beam_decode
        from phones_las_tpu.models.las import encode as enc_fn

        cfg, impl = self.model_cfg, self.implementation

        @functools.partial(jax.jit, static_argnames=("k", "steps_cap"))
        def step_fn(params, batch, k, steps_cap):
            with jax.default_matmul_precision(cfg.matmul_precision):
                encoded = enc_fn(
                    params, cfg, batch["audio"], batch["audio_lengths"],
                    implementation=impl,
                )
                memory, _, enc_mask = encoded
                # teacher-forced eval loss (same metric as the greedy leg)
                _, aux = compute_loss(
                    params, cfg, batch, train=False, implementation=impl,
                    encoded=encoded,
                )
                res = beam_decode(
                    params.speller, cfg.speller, memory, enc_mask,
                    steps_cap, beam_width=k,
                )
                return res.tokens, res.lengths, aux["loss"]

        self._beam_eval_jit = step_fn
        return step_fn

    def _evaluate_beam(self, batches, max_steps, beam_width) -> Dict:
        step_fn = self._beam_eval_fn()
        eval_params = self._eval_params()
        dist = tokens = 0
        cap_hits = eval_utts = 0
        losses = []
        for batch in batches:
            steps_cap = max_steps or self.decode_cap(batch)
            toks, lens, loss = step_fn(
                eval_params, self._eval_device_batch(batch), beam_width,
                steps_cap,
            )
            losses.append(float(loss))
            lens_np = np.asarray(lens)
            n_real = batch.get("num_real")
            n_real = lens_np.shape[0] if n_real is None else int(n_real)
            cap_hits += int((lens_np[:n_real] >= steps_cap).sum())
            eval_utts += n_real
            d, t = M.edit_distance_stats(
                np.asarray(toks), np.asarray(lens),
                np.asarray(batch["targets"]),
                np.asarray(batch["target_lengths"]) - 1,
                num_real=batch.get("num_real"), fold=self.score_fold,
            )
            dist += d
            tokens += t
        dist, tokens, cap_hits, eval_utts, loss_sum, loss_n = (
            self._allreduce_metrics([
                dist, tokens, cap_hits, eval_utts,
                float(np.sum(losses)) if losses else 0.0, len(losses),
            ])
        )
        res = {
            "loss": float(loss_sum / loss_n) if loss_n else float("nan"),
            "per": M.per_from_stats(int(dist), int(tokens)),
            "ref_tokens": int(tokens),
        }
        if eval_utts:
            res["cap_hit_rate"] = float(cap_hits) / float(eval_utts)
        return res

    def _evaluate_greedy(
        self,
        batches: Iterator[Dict],
        max_steps: Optional[int] = None,
        writer=None,
        step: Optional[int] = None,
    ) -> Dict:
        dist = tokens = 0
        g_dist = g_tokens = 0
        w_dist = w_words = 0
        cap_hits = eval_utts = 0
        losses = []
        first_image = None
        eval_params = self._eval_params()
        for batch in batches:
            steps_cap = max_steps or self.decode_cap(batch)
            out = self._eval_step(
                eval_params, self._eval_device_batch(batch), steps_cap
            )
            losses.append(float(out["loss"]))
            # derailment signal: a decode that never emitted <eos> ran to
            # the step cap — on long utterances LAS fails by inserting in
            # a loop, and PER alone hides how many utterances did so
            lens = np.asarray(out["lengths"])
            n_real = batch.get("num_real")
            n_real = lens.shape[0] if n_real is None else int(n_real)
            cap_hits += int((lens[:n_real] >= steps_cap).sum())
            eval_utts += n_real
            if first_image is None and batch.get("num_real", 1) > 0:
                # the reference's diagonal-alignment diagnostic image
                first_image = M.attention_image(
                    np.asarray(out["alignments"][0]),
                    int(np.asarray(out["lengths"][0])) or 1,
                    int(np.asarray(out["enc_lengths"][0])),
                )
            d, t = M.edit_distance_stats(
                np.asarray(out["tokens"]),
                np.asarray(out["lengths"]),
                np.asarray(batch["targets"]),
                np.asarray(batch["target_lengths"]) - 1,  # exclude <eos>
                num_real=batch.get("num_real"),
                fold=self.score_fold,
            )
            dist += d
            tokens += t
            if "g_tokens" in out and "grapheme_targets" in batch:
                gd, gt = M.edit_distance_stats(
                    np.asarray(out["g_tokens"]),
                    np.asarray(out["g_lengths"]),
                    np.asarray(batch["grapheme_targets"]),
                    np.asarray(batch["grapheme_lengths"]) - 1,
                    num_real=batch.get("num_real"),
                )
                g_dist += gd
                g_tokens += gt
                if self.grapheme_word_sep_id is not None:
                    wd, wt = M.word_error_stats(
                        np.asarray(out["g_tokens"]),
                        np.asarray(out["g_lengths"]),
                        np.asarray(batch["grapheme_targets"]),
                        np.asarray(batch["grapheme_lengths"]) - 1,
                        self.grapheme_word_sep_id,
                        num_real=batch.get("num_real"),
                    )
                    w_dist += wd
                    w_words += wt
        if writer is not None and first_image is not None:
            writer.write_images(
                step if step is not None else int(self.state.step),
                {"attention_alignment": first_image[None]},
            )
        (dist, tokens, g_dist, g_tokens, w_dist, w_words, cap_hits,
         eval_utts, loss_sum, loss_n) = (
            self._allreduce_metrics([
                dist, tokens, g_dist, g_tokens, w_dist, w_words, cap_hits,
                eval_utts,
                float(np.sum(losses)) if losses else 0.0, len(losses),
            ])
        )
        res = {
            "loss": float(loss_sum / loss_n) if loss_n else float("nan"),
            "per": M.per_from_stats(int(dist), int(tokens)),
            "ref_tokens": int(tokens),
        }
        if eval_utts:
            res["cap_hit_rate"] = float(cap_hits) / float(eval_utts)
        if g_tokens:
            res["cer"] = M.per_from_stats(int(g_dist), int(g_tokens))
            res["grapheme_ref_tokens"] = int(g_tokens)
        if w_words:
            res["wer"] = M.per_from_stats(int(w_dist), int(w_words))
            res["ref_words"] = int(w_words)
        return res

    def decode_cap(self, batch: Dict) -> int:
        """Per-bucket decode-step cap ∝ encoder frames (the reference caps
        ``dynamic_decode``'s max_iterations relative to encoder length,
        SURVEY.md §4.2). Static per bucket shape → zero extra recompiles
        beyond the per-bucket programs that already exist."""
        cfg = self.model_cfg
        audio = batch["audio"]
        if cfg.input_is_pcm and getattr(audio, "ndim", 2) == 2:
            t = frames_for_samples(audio.shape[1], cfg.frontend)
        else:
            t = audio.shape[1]
        for _ in range(cfg.listener.num_layers - 1):
            t = (t + 1) // 2
        return max(16, int(self.decode_cap_ratio * t))
