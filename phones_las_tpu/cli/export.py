"""Export CLI: freeze a trained workdir into serving artifacts.

Traces the full inference program (front-end → encoder → decode) at each
requested serving shape and serializes it with the trained weights
embedded (StableHLO via ``jax.export``) — see ``phones_las_tpu.export``.

    python -m phones_las_tpu.cli.export --workdir runs/ls --out runs/ls/export \
        --batch-sizes 1,8,64 --pad-seconds 10 --platforms tpu,cpu
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from phones_las_tpu.cli.common import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--out", required=True, help="export directory")
    p.add_argument("--batch-sizes", default="1,8,64",
                   help="comma-separated serving batch sizes")
    p.add_argument("--pad-seconds", default="10",
                   help="comma-separated audio capacities (seconds)")
    p.add_argument("--beam-width", type=int, default=None,
                   help="0 = force greedy; unset = the preset's width")
    p.add_argument("--head", default="phone", choices=["phone", "grapheme"])
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms (e.g. tpu,cpu);"
                        " default = the current backend only; multi-platform"
                        " artifacts use the XLA implementation (Pallas"
                        " kernels only lower for TPU)")
    p.add_argument("--implementation", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--average-checkpoints", type=int, default=1, metavar="K",
                   help="export the mean of the newest K checkpoints")
    p.add_argument("--lm", default=None, metavar="LM.npz",
                   help="bake a shallow-fusion n-gram LM into the artifact "
                        "(beam decoding only)")
    p.add_argument("--lm-weight", type=float, default=0.3)
    args = p.parse_args(argv)

    from phones_las_tpu.export import export_model
    from phones_las_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    meta = export_model(
        args.workdir, args.out,
        batch_sizes=[int(x) for x in args.batch_sizes.split(",")],
        pad_seconds=[float(x) for x in args.pad_seconds.split(",")],
        beam_width=args.beam_width,
        head=args.head,
        platforms=args.platforms.split(",") if args.platforms else None,
        implementation=args.implementation,
        average_checkpoints=args.average_checkpoints,
        lm=args.lm, lm_weight=args.lm_weight,
    )
    import os

    total = sum(
        os.path.getsize(os.path.join(args.out, e["file"]))
        for e in meta["entries"]
    )
    print(f"exported {len(meta['entries'])} program(s) to {args.out} "
          f"({total / 2**20:.1f} MiB, vocab {len(meta['tokens'])})")


if __name__ == "__main__":
    main()
