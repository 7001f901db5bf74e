"""Inference CLI (reference: ``infer.py`` — SURVEY.md §4.3).

Restores the latest checkpoint from a workdir, runs greedy or beam
decoding over record files (optionally sharded over a data-parallel
mesh), maps ids back through the reverse vocab, writes/prints
hypotheses, and reports PER when references are present.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from phones_las_tpu.cli.common import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--data", required=True, help="a .plu record file or data dir")
    p.add_argument("--beam-width", type=int, default=None,
                   help="0 = force greedy; unset = the preset's width")
    p.add_argument("--length-penalty", type=float, default=0.0)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--monotonic-mode", default=None,
                   choices=["parallel", "hard"],
                   help="decode-time monotonic-attention mode override "
                        "(models trained with a *_monotonic attention "
                        "type). 'hard' (discrete test-time decisions) is "
                        "EXPERIMENTAL — usable only calibrated: train with "
                        "--monotonic-noise 3.0 and decode with "
                        "--monotonic-bias 3 (3.5%% PER, zero derailments; "
                        "uncalibrated 35-78%% — docs/ACCURACY.md)")
    p.add_argument("--monotonic-bias", type=float, default=None, metavar="B",
                   help="decode-time pre-sigmoid energy bias for "
                        "*_monotonic attention (hard-mode calibration: "
                        "shifts the attend/skip threshold without "
                        "retraining)")
    p.add_argument("--output", default=None, help="write hypotheses TSV here")
    p.add_argument("--mesh", action="store_true",
                   help="shard batches over all devices (offline DP inference)")
    p.add_argument("--head", default="phone", choices=["phone", "grapheme"],
                   help="which decoder head to decode (multitask models)")
    p.add_argument("--dump-alignments", default=None, metavar="DIR",
                   help="save attention-alignment heatmap PNGs for the first "
                        "batch (greedy only; the reference's TensorBoard "
                        "alignment images, for offline inspection)")
    p.add_argument("--implementation", default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--average-checkpoints", type=int, default=1, metavar="K",
                   help="decode with the mean of the newest K checkpoints "
                        "(checkpoint averaging; 1 = latest only)")
    p.add_argument("--lm", default=None, metavar="LM.npz",
                   help="n-gram LM (cli.lm) for shallow-fusion beam decoding")
    p.add_argument("--lm-weight", type=float, default=0.3)
    p.add_argument("--ctc-rescore", type=float, default=None, metavar="ALPHA",
                   help="joint decoding: rescore beam hypotheses with the "
                        "model's CTC head (score = ALPHA*attn + (1-ALPHA)*ctc; "
                        "needs a --ctc-weight-trained model and beam > 0)")
    p.add_argument("--ctc-joint", type=float, default=None, metavar="ALPHA",
                   help="ONE-PASS joint decoding: CTC prefix scores inside "
                        "the beam loop (Watanabe-style; same ALPHA convention "
                        "as --ctc-rescore, mutually exclusive with it)")
    args = p.parse_args(argv)

    import dataclasses
    import glob
    import json
    import os

    from phones_las_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phones_las_tpu.cli.common import resolve_preset, timit_score_fold
    from phones_las_tpu.data.pipeline import DataSource
    from phones_las_tpu.decode import beam_decode, greedy_decode
    from phones_las_tpu.models.las import encode
    from phones_las_tpu.parallel import make_mesh, shard_batch, shard_params
    from phones_las_tpu.train import Trainer
    from phones_las_tpu.train.loop import device_batch
    from phones_las_tpu.train.metrics import (
        edit_distance_stats,
        per_from_stats,
        word_error_stats,
    )

    cfg_file = json.load(open(os.path.join(args.workdir, "config.json")))
    preset_name, data_dir = cfg_file["preset"], cfg_file["data"]
    # replay the hparam overrides the run was trained with (shapes must
    # match the checkpoint), then apply infer-time ones on top
    overrides = dict(cfg_file.get("overrides") or {})
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.monotonic_mode:
        # decode-time semantic only — no shape change vs the checkpoint
        overrides["monotonic_mode"] = args.monotonic_mode
    if args.monotonic_bias is not None:
        overrides["monotonic_bias"] = args.monotonic_bias
    preset, vocab, gvocab, cmvn, binf_codes = resolve_preset(
        preset_name, data_dir, overrides or None
    )
    if (
        args.monotonic_mode or args.monotonic_bias is not None
    ) and not preset.model.speller.attention_type.endswith("_monotonic"):
        # only *_monotonic attention honors these — failing silently
        # would make an A/B decode comparison meaningless
        p.error(
            f"--monotonic-mode/--monotonic-bias given but the checkpoint's "
            f"attention type is '{preset.model.speller.attention_type}' "
            f"(not *_monotonic); the flag would have no effect"
        )
    if cfg_file.get("precision"):
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(
                preset.model, matmul_precision=cfg_file["precision"]),
        )

    trainer = Trainer(preset.model, preset.train, workdir=args.workdir,
                      binf_codes=binf_codes, implementation=args.implementation)
    assert int(trainer.state.step) > 0, f"no checkpoint in {args.workdir}"
    params = trainer.state.params
    if args.average_checkpoints > 1:
        from phones_las_tpu.train.checkpoint import load_averaged_params

        params, used = load_averaged_params(
            args.workdir, trainer.state, args.average_checkpoints
        )
        print(f"averaged {len(used)} checkpoints: steps {used}")
    model_cfg = preset.model

    mesh = None
    if args.mesh:
        mesh = make_mesh(model=1)
        params = shard_params(params, mesh)

    # explicit --beam-width 0 must force greedy even when the preset
    # declares a beam (falsy-zero would fall through to the preset)
    beam = args.beam_width if args.beam_width is not None else preset.beam_width
    impl = trainer.implementation  # 'auto' resolved by the Trainer
    if args.head == "grapheme":
        assert model_cfg.grapheme_speller is not None, "model has no grapheme head"
        assert gvocab is not None
        speller_cfg, vocab = model_cfg.grapheme_speller, gvocab
        get_speller = lambda p: p.grapheme_speller
        max_steps = preset.pipeline.max_grapheme_len or preset.pipeline.max_target_len
    else:
        speller_cfg = model_cfg.speller
        get_speller = lambda p: p.speller
        max_steps = preset.pipeline.max_target_len

    want_aligns = bool(args.dump_alignments) and not beam

    lm_logp = None
    if args.lm:
        assert beam, "--lm requires beam decoding (set --beam-width > 0)"
        from phones_las_tpu.decode.lm import load_lm

        lm_logp = jax.numpy.asarray(load_lm(args.lm))
        assert lm_logp.shape[-1] == speller_cfg.vocab_size, (
            f"LM vocab {lm_logp.shape[-1]} != model vocab "
            f"{speller_cfg.vocab_size}"
        )

    ctc_alpha = args.ctc_rescore
    joint_alpha = args.ctc_joint
    if ctc_alpha is not None or joint_alpha is not None:
        flag = "--ctc-rescore" if ctc_alpha is not None else "--ctc-joint"
        assert not (ctc_alpha is not None and joint_alpha is not None), (
            "--ctc-rescore and --ctc-joint are mutually exclusive"
        )
        assert beam, f"{flag} requires beam decoding"
        assert args.head == "phone", "the CTC head scores phone targets"
        assert trainer.state.params.ctc_w is not None, (
            f"{flag} needs a model trained with --ctc-weight > 0"
        )

    @jax.jit
    def infer_fn(params, audio, lengths):
        with jax.default_matmul_precision(model_cfg.matmul_precision):
            memory, enc_lens, enc_mask = encode(
                params, model_cfg, audio, lengths, implementation=impl,
            )
            if beam:
                from phones_las_tpu.api import _ctc_logp

                ctc_logp = _ctc_logp(params, memory, joint_alpha)
                res = beam_decode(
                    get_speller(params), speller_cfg, memory, enc_mask,
                    max_steps, beam_width=beam,
                    length_penalty=args.length_penalty,
                    lm_logp=lm_logp, lm_weight=args.lm_weight,
                    ctc_logp=ctc_logp,
                    ctc_alpha=1.0 if joint_alpha is None else joint_alpha,
                )
                if ctc_alpha is not None:
                    from phones_las_tpu.decode.ctc import rescore_beams

                    ctc_logits = memory @ params.ctc_w + params.ctc_b
                    best, _ = rescore_beams(
                        ctc_logits, enc_mask, res.beam_tokens,
                        res.beam_lengths, res.beam_logp, ctc_alpha,
                        beam_finished=res.beam_finished,
                        length_penalty=args.length_penalty,
                    )
                    take = lambda x: jnp.take_along_axis(
                        x, best.reshape(-1, *([1] * (x.ndim - 1))), axis=1
                    )[:, 0]
                    return take(res.beam_tokens), take(res.beam_lengths), None, enc_lens
                return res.tokens, res.lengths, None, enc_lens
            toks, lens, aligns = greedy_decode(
                get_speller(params), speller_cfg, memory, enc_mask, max_steps,
                return_alignments=want_aligns,
            )
            return toks, lens, aligns, enc_lens

    if os.path.isdir(args.data):
        paths = sorted(glob.glob(os.path.join(args.data, "*.plu")))
    else:
        paths = [args.data]
    pipe_cfg = dataclasses.replace(
        preset.pipeline, shuffle=False, drop_remainder=False
    )
    source = DataSource(paths, pipe_cfg)

    meta_path = os.path.join(data_dir, "meta.json")
    fold = None
    if os.path.exists(meta_path) and args.head == "phone":
        meta = json.load(open(meta_path))
        if meta.get("corpus") == "timit":
            fold = timit_score_fold(vocab, meta.get("output_ipa", True))

    ref_key, ref_len_key = (
        ("grapheme_targets", "grapheme_lengths")
        if args.head == "grapheme"
        else ("targets", "target_lengths")
    )
    out_f = open(args.output, "w") if args.output else None
    dist = tokens_total = 0
    # word-level scoring when the target stream has a word-break token
    # (char/grapheme targets: librispeech '<space>', speechlike '|') —
    # the WER char-target systems are actually judged by
    # (vocab is already the grapheme vocab under --head grapheme)
    sep_id = next(
        (vocab.encode([t])[0] for t in ("<space>", "|") if t in vocab),
        None,
    )
    wdist = words_total = 0
    n_utts = 0
    dumped_aligns = False
    for batch in source.epoch(0):
        db = shard_batch(batch, mesh) if mesh else device_batch(batch)
        toks, lens, aligns, enc_lens = infer_fn(
            params, db["audio"], db["audio_lengths"]
        )
        toks, lens = np.asarray(toks), np.asarray(lens)
        if want_aligns and not dumped_aligns:
            from phones_las_tpu.train.metrics import attention_image

            os.makedirs(args.dump_alignments, exist_ok=True)
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            a, el = np.asarray(aligns), np.asarray(enc_lens)
            for i in range(min(batch["num_real"], 8)):
                img = attention_image(a[i], max(int(lens[i]), 1), int(el[i]))
                fig, ax = plt.subplots(figsize=(6, 3))
                ax.imshow(img[..., 0], aspect="auto", origin="lower",
                          interpolation="nearest")
                ax.set_xlabel("encoder frames")
                ax.set_ylabel("decode steps")
                ax.set_title(batch["utt_ids"][i])
                fig.savefig(
                    os.path.join(args.dump_alignments,
                                 f"{batch['utt_ids'][i]}.png"),
                    dpi=100, bbox_inches="tight",
                )
                plt.close(fig)
            dumped_aligns = True
        d, t = edit_distance_stats(
            toks, lens, batch[ref_key], batch[ref_len_key] - 1,
            num_real=batch["num_real"], fold=fold,
        )
        dist += d
        tokens_total += t
        if sep_id is not None:
            wd, wt = word_error_stats(
                toks, lens, batch[ref_key], batch[ref_len_key] - 1,
                sep_id, num_real=batch["num_real"],
            )
            wdist += wd
            words_total += wt
        for i in range(batch["num_real"]):
            hyp = " ".join(vocab.decode(toks[i][: lens[i]]))
            line = f"{batch['utt_ids'][i]}\t{hyp}"
            print(line) if out_f is None else out_f.write(line + "\n")
            n_utts += 1
    if out_f:
        out_f.close()
    if tokens_total:
        wer = (f", WER={per_from_stats(wdist, words_total):.4f} "
               f"({wdist}/{words_total})" if words_total else "")
        print(f"# {n_utts} utterances, PER={per_from_stats(dist, tokens_total):.4f} "
              f"({dist}/{tokens_total}){wer}")


if __name__ == "__main__":
    main()
