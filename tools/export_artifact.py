"""Export a trained run as a self-contained flat-npz serving artifact.

One file = params + model config + decode metadata (vocab, training
bucket lengths, target cap), loadable with ``Transcriber.from_artifact``
— no workdir, no orbax, no data dir. Used to build the committed
long-regime regression-gate checkpoint (tests/goldens/long_gate.npz)
and handy for shipping small models the way ``assets/g2p_en.npz`` ships
the G2P. The reference ships checkpoint directories and re-runs the
Estimator to decode (SURVEY.md §6 checkpoint row).

    python tools/export_artifact.py --workdir _runs/<run> --out model.npz
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True,
                   help="trained run (config.json + checkpoints)")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--average-checkpoints", type=int, default=1)
    args = p.parse_args()

    from phones_las_tpu.cli.common import honor_jax_platforms_env, resolve_preset
    from phones_las_tpu.train import Trainer
    from phones_las_tpu.utils.param_io import save_params_npz

    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must win over axon

    cfg_file = json.load(open(os.path.join(args.workdir, "config.json")))
    preset, vocab, _, _, binf_codes = resolve_preset(
        cfg_file["preset"], cfg_file["data"],
        dict(cfg_file.get("overrides") or {}) or None,
    )
    if cfg_file.get("precision"):
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(
                preset.model, matmul_precision=cfg_file["precision"]),
        )
    trainer = Trainer(preset.model, preset.train, workdir=args.workdir,
                      binf_codes=binf_codes)
    assert int(trainer.state.step) > 0, f"no checkpoint in {args.workdir}"
    params = trainer.state.params
    if args.average_checkpoints > 1:
        from phones_las_tpu.train.checkpoint import load_averaged_params

        params, _ = load_averaged_params(
            args.workdir, trainer.state, args.average_checkpoints
        )
    extras = {
        "preset": cfg_file["preset"],
        "vocab": list(vocab.tokens),
        "buckets": [int(b) for b in preset.pipeline.buckets],
        "max_target_len": int(preset.pipeline.max_target_len),
        "step": int(trainer.state.step),
    }
    save_params_npz(args.out, params, preset.model, extras=extras)
    import numpy as np

    n = sum(int(np.prod(v.shape)) for v in
            __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {args.out}: {n:,} params, step {extras['step']}, "
          f"{os.path.getsize(args.out)/1e6:.1f} MB")


if __name__ == "__main__":
    main()
