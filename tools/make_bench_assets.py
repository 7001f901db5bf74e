"""Build the bench correctness-row assets (round-3 verdict weak #5).

Exports a trained run as the committed single-file artifact pair that
``bench.py::bench_accuracy`` decodes every round:

    phones_las_tpu/assets/bench/ckpt.npz      — params+config (param_io)
    phones_las_tpu/assets/bench/eval_set.npz  — fixed padded eval batch

so a silent numerics regression changes the driver-captured
``BENCH_r*.json`` (bench_per_greedy / bench_per_beam8) instead of only
prose. The reference has no equivalent: its eval lives inside the
Estimator loop (SURVEY.md §4.3).

Usage:
    python tools/make_bench_assets.py --workdir _runs/<run> --n-utts 64
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True,
                   help="trained run (config.json + checkpoints)")
    p.add_argument("--n-utts", type=int, default=64)
    p.add_argument("--split", default="test.plu")
    p.add_argument("--out", default=None,
                   help="output dir (default: phones_las_tpu/assets/bench)")
    args = p.parse_args()

    import phones_las_tpu
    from phones_las_tpu.cli.common import resolve_preset
    from phones_las_tpu.data.records import RecordReader
    from phones_las_tpu.train import Trainer
    from phones_las_tpu.utils.param_io import save_params_npz

    out = args.out or os.path.join(
        os.path.dirname(phones_las_tpu.__file__), "assets", "bench")
    os.makedirs(out, exist_ok=True)

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
                      binf_codes=binf_codes, implementation="xla")
    step = int(trainer.state.step)
    assert step > 0, f"no checkpoint in {args.workdir}"
    save_params_npz(os.path.join(out, "ckpt.npz"),
                    trainer.state.params, preset.model)

    reader = RecordReader(os.path.join(cfg_file["data"], args.split))
    n = min(args.n_utts, len(reader))
    utts = [reader[i] for i in range(n)]
    s_max = max(u.audio.shape[0] for u in utts)
    l_max = max(u.targets.shape[0] for u in utts) + 1  # +eos headroom
    audio = np.zeros((n, s_max), np.float32)
    lengths = np.zeros((n,), np.int32)
    refs = np.full((n, l_max), -1, np.int32)
    for i, u in enumerate(utts):
        audio[i, : u.audio.shape[0]] = u.audio.astype(np.float32)
        lengths[i] = u.audio.shape[0]
        refs[i, : u.targets.shape[0]] = u.targets
    cap = trainer.decode_cap({"audio": audio})
    np.savez_compressed(
        os.path.join(out, "eval_set.npz"),
        audio=audio, lengths=lengths, refs=refs,
        decode_cap=np.array([cap], np.int32),
    )
    print(f"wrote {out}/ckpt.npz (step {step}, vocab {len(vocab)}) and "
          f"eval_set.npz ({n} utts, S={s_max}, cap={cap})")


if __name__ == "__main__":
    main()
