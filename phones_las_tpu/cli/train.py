"""Training CLI (reference: ``train.py`` — SURVEY.md §4.1).

Resolves a preset against a prepared data dir, dumps the bound config
into the workdir (resume parity), trains with periodic eval +
checkpointing, TensorBoard metrics when clu is available.
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    from phones_las_tpu.cli.common import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="timit_phone_las",
                   help="one of utils.config.PRESETS")
    p.add_argument("--data", required=True, help="prepared data dir")
    p.add_argument("--workdir", required=True)
    p.add_argument("--train-records", default=None,
                   help="glob under --data (default: train*.plu)")
    p.add_argument("--eval-records", default=None,
                   help="glob under --data (default: {dev,test}*.plu)")
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr-decay-rate", type=float, default=None,
                   help="exponential LR decay factor per --lr-decay-steps "
                        "(train/state.py lr_schedule; 1.0 = constant)")
    p.add_argument("--lr-decay-steps", type=int, default=None)
    p.add_argument("--warmup-steps", type=int, default=None,
                   help="linear LR warmup steps before decay applies")
    p.add_argument("--eval-every", type=int, default=None)
    p.add_argument("--checkpoint-every", type=int, default=None,
                   help="checkpoint cadence in steps (preset default 1000)")
    # model hyperparameters (reference flag semantics, SURVEY §6)
    p.add_argument("--encoder-layers", type=int, default=None)
    p.add_argument("--encoder-units", type=int, default=None)
    p.add_argument("--decoder-layers", type=int, default=None)
    p.add_argument("--decoder-units", type=int, default=None)
    p.add_argument("--embedding-dim", type=int, default=None)
    p.add_argument("--attention-type", default=None,
                   choices=["bahdanau", "bahdanau_norm", "luong", "luong_scaled",
                            "bahdanau_monotonic", "luong_monotonic"])
    p.add_argument("--attention-units", type=int, default=None)
    p.add_argument("--monotonic-mode", default=None, choices=["parallel", "hard"],
                   help="decode-time monotonic-attention mode recorded in "
                        "the run config (the default for later infer/eval); "
                        "training itself always uses the soft 'parallel' "
                        "recursion. 'hard' (discrete test-time decisions) "
                        "is EXPERIMENTAL; see --monotonic-noise for the "
                        "calibrated recipe (docs/ACCURACY.md)")
    p.add_argument("--monotonic-noise", type=float, default=None,
                   help="pre-sigmoid noise stddev on monotonic attention "
                        "energies during training (default 1.0). noise 3.0 "
                        "+ decode-time '--monotonic-mode hard "
                        "--monotonic-bias 3' is the calibrated hard-decode "
                        "recipe (3.5%% PER, zero derailments), at the cost "
                        "of the checkpoint's SOFT decode (1.6->10%% — "
                        "docs/ACCURACY.md)")
    p.add_argument("--dropout", type=float, default=None)
    p.add_argument("--sampling-probability", type=float, default=None)
    p.add_argument("--specaugment", action="store_true",
                   help="enable on-device SpecAugment during training "
                        "(beyond-parity; frontend/specaugment.py)")
    p.add_argument("--sa-freq-masks", type=int, default=2)
    p.add_argument("--sa-freq-width", type=int, default=10)
    p.add_argument("--sa-time-masks", type=int, default=2)
    p.add_argument("--sa-time-width", type=int, default=50)
    p.add_argument("--sa-time-ratio", type=float, default=0.2)
    p.add_argument("--buckets", type=int, nargs="+", default=None,
                   help="length-bucket boundaries in samples (static-shape "
                        "padded batching; overrides the preset, e.g. "
                        "--buckets 160000 240000 320000 for 10-20 s speech)")
    p.add_argument("--max-target-len", type=int, default=None,
                   help="training target-length cap in tokens (overrides "
                        "the preset; longer-target utterances are dropped)")
    p.add_argument("--multitask-weight", type=float, default=None)
    p.add_argument("--label-smoothing", type=float, default=None,
                   help="uniform label smoothing on the attention CE (train only)")
    p.add_argument("--ctc-weight", type=float, default=None,
                   help="joint CTC-attention loss weight lambda "
                        "(0=attention only; adds a CTC head on the encoder)")
    p.add_argument("--clip-norm", type=float, default=None)
    p.add_argument("--init-checkpoint", default=None,
                   help="workdir of another run to warm-start params from")
    p.add_argument("--init-scope", default="all", choices=["all", "encoder"],
                   help="'encoder' restores only the listener + CMVN — the "
                        "cross-language transfer recipe (phone sets differ)")
    p.add_argument("--implementation", default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--mesh", action="store_true",
                   help="train data-parallel over all local devices "
                        "(('data', 'model') mesh, GSPMD gradient psum)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="size of the mesh's 'model' axis (with --mesh)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-process training: jax.distributed.initialize "
                        "(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                        "JAX_PROCESS_ID or Cloud-TPU autodetection), each "
                        "process feeding its slice of the epoch plan; "
                        "implies --mesh over all global devices")
    p.add_argument("--precision", default=None, choices=["highest", "high", "default"],
                   help="model matmul precision override: 'highest' = reference "
                        "fp32 parity (default), 'default' = bf16 production speed")
    p.add_argument("--frontend-precision", default=None,
                   choices=["highest", "high"],
                   help="front-end DFT/mel MXU precision: 'highest' = 6-pass "
                        "f32 parity (default), 'high' = 3-pass split-float "
                        "(1.3x faster, rel err 9e-4 — fine for production)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable the NaN sanitizer (jax_debug_nans)")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a device trace of N diagnostic train steps "
                        "into <workdir>/profile for TensorBoard (the steps "
                        "advance the model but are not checkpointed)")
    args = p.parse_args(argv)

    import dataclasses
    import json

    if args.multihost:
        # jax.distributed.initialize() must be the FIRST jax call: even
        # enable_compilation_cache touches jax.default_backend(), which
        # initializes the XLA backend and makes initialize() raise
        from phones_las_tpu.parallel.multihost import initialize_distributed

        initialize_distributed()

    from phones_las_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    shard = None
    if args.multihost:  # initialize_distributed() already ran (above)
        import jax

        shard = (jax.process_index(), jax.process_count())
        args.mesh = True

    from phones_las_tpu.cli.common import (
        apply_cmvn_to_params,
        resolve_preset,
        timit_score_fold,
    )
    from phones_las_tpu.data.pipeline import DataSource
    from phones_las_tpu.train import Trainer

    overrides = {
        "num_steps": args.num_steps,
        "learning_rate": args.learning_rate,
        "lr_decay_rate": args.lr_decay_rate,
        "lr_decay_steps": args.lr_decay_steps,
        "warmup_steps": args.warmup_steps,
        "batch_size": args.batch_size,
        "eval_every": args.eval_every,
        "checkpoint_every": args.checkpoint_every,
        "encoder_layers": args.encoder_layers,
        "encoder_units": args.encoder_units,
        "decoder_layers": args.decoder_layers,
        "decoder_units": args.decoder_units,
        "embedding_dim": args.embedding_dim,
        "attention_type": args.attention_type,
        "attention_units": args.attention_units,
        "monotonic_mode": args.monotonic_mode,
        "monotonic_noise": args.monotonic_noise,
        "dropout": args.dropout,
        "sampling_probability": args.sampling_probability,
        "buckets": tuple(args.buckets) if args.buckets else None,
        "max_target_len": args.max_target_len,
        "multitask_weight": args.multitask_weight,
        "ctc_weight": args.ctc_weight,
        "label_smoothing": args.label_smoothing,
        "clip_norm": args.clip_norm,
        "frontend_precision": args.frontend_precision,
        "specaugment": (
            {
                "freq_masks": args.sa_freq_masks,
                "freq_mask_width": args.sa_freq_width,
                "time_masks": args.sa_time_masks,
                "time_mask_width": args.sa_time_width,
                "time_mask_ratio": args.sa_time_ratio,
            }
            if args.specaugment
            else None
        ),
    }
    preset, vocab, gvocab, cmvn, binf_codes = resolve_preset(
        args.preset, args.data, overrides
    )
    if args.precision:
        preset = dataclasses.replace(
            preset,
            model=dataclasses.replace(preset.model, matmul_precision=args.precision),
        )

    os.makedirs(args.workdir, exist_ok=True)
    if shard is not None:
        # all processes MUST share one workdir: orbax coordinates the
        # save across processes, and divergent directories deadlock its
        # cross-process commit barrier. Fail fast instead.
        from jax.experimental import multihost_utils

        import numpy as _np
        import zlib

        # 31-bit mask: jax downcasts to int32 without x64 mode, and a
        # wrapped-negative gather would never equal the python int
        h = zlib.crc32(os.path.abspath(args.workdir).encode()) & 0x7FFFFFFF
        hs = multihost_utils.process_allgather(_np.asarray([h], _np.int32))
        assert (hs == h).all(), (
            "--multihost requires the SAME --workdir (shared filesystem) "
            "on every process; orbax's coordinated save deadlocks on "
            "divergent checkpoint directories"
        )
    if shard is None or shard[0] == 0:  # one writer on a shared workdir
        with open(os.path.join(args.workdir, "config.json"), "w") as f:
            json.dump(
                {"preset": args.preset, "data": args.data,
                 # non-None CLI overrides, replayed by infer so a run
                 # trained with hparam flags restores with the right shapes
                 "overrides": {k: v for k, v in overrides.items() if v is not None},
                 "precision": args.precision,
                 "resolved": dataclasses.asdict(preset)},
                f, indent=2, default=str,
            )

    train_glob = args.train_records or "train*.plu"
    train_paths = sorted(glob.glob(os.path.join(args.data, train_glob)))
    assert train_paths, f"no records match {train_glob} in {args.data}"
    eval_paths = []
    for g in ([args.eval_records] if args.eval_records else ["dev*.plu", "test*.plu"]):
        eval_paths += sorted(glob.glob(os.path.join(args.data, g)))

    meta_path = os.path.join(args.data, "meta.json")
    fold = None
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        if meta.get("corpus") == "timit":
            fold = timit_score_fold(vocab, meta.get("output_ipa", True))

    source = DataSource(train_paths, preset.pipeline, shard=shard)
    eval_cfg = dataclasses.replace(
        preset.pipeline, shuffle=False, drop_remainder=False
    )
    # multi-host: each process evaluates its own slice locally and the
    # metrics are summed across processes (Trainer._allreduce_metrics)
    eval_source = (
        DataSource(eval_paths, eval_cfg, shard=shard) if eval_paths else None
    )

    mesh = None
    if args.mesh:
        from phones_las_tpu.parallel import make_mesh

        mesh = make_mesh(model=args.model_parallel)

    g_sep = None
    if gvocab is not None:
        g_sep = next(
            (gvocab.encode([t])[0] for t in ("<space>", "|") if t in gvocab),
            None,
        )
    trainer = Trainer(
        preset.model, preset.train, workdir=args.workdir,
        binf_codes=binf_codes, score_fold=fold,
        implementation=args.implementation,
        default_decode_steps=preset.pipeline.max_target_len,
        eval_beam_width=preset.beam_width,  # periodic eval honors the preset
        grapheme_word_sep_id=g_sep,  # grapheme-head WER in periodic eval
        mesh=mesh,
    )
    if args.init_checkpoint and int(trainer.state.step) == 0:
        from phones_las_tpu.train.checkpoint import load_params_for_warm_start

        params = load_params_for_warm_start(
            args.init_checkpoint, trainer.state, scope=args.init_scope,
            target_params=trainer.state.params,
        )
        trainer.state = trainer.state._replace(params=params)
        print(f"warm-started [{args.init_scope}] from {args.init_checkpoint}")
    trainer.state = trainer.state._replace(
        params=apply_cmvn_to_params(trainer.state.params, cmvn)
    )
    if mesh is not None:
        # warm start / CMVN injection replaced params host-side; re-shard
        trainer.shard_state_to_mesh()

    writer = None
    try:
        from clu import metric_writers

        writer = metric_writers.create_default_writer(args.workdir)
    except Exception:
        pass

    if args.debug_nans:
        from phones_las_tpu.utils.diagnostics import enable_nan_checks

        enable_nan_checks(True)
    if args.profile_steps:
        import itertools

        from phones_las_tpu.utils.diagnostics import profile_trace

        # diagnostic leg: these steps advance the model (donated buffers
        # cannot be rolled back) but are never checkpointed — otherwise a
        # profile run would write an epoch-0 checkpoint regardless of the
        # resumed epoch and corrupt the resume bookkeeping
        ckpt, trainer.ckpt = trainer.ckpt, None
        try:
            with profile_trace(os.path.join(args.workdir, "profile")):
                trainer.fit(itertools.islice(
                    source.repeat(trainer.start_epoch), args.profile_steps))
        finally:
            trainer.ckpt = ckpt

    print(f"training {args.preset}: vocab={len(vocab)} "
          f"steps={preset.train.num_steps} workdir={args.workdir}")
    trainer.fit(
        source,
        eval_batches_fn=(lambda: eval_source.epoch(0)) if eval_source else None,
        writer=writer,
    )
    if eval_source:
        print("final eval:", trainer.evaluate(
            eval_source.epoch(0), beam_width=preset.beam_width))


if __name__ == "__main__":
    main()
