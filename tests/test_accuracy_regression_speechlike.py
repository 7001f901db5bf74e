"""Second accuracy regression gate, on the HARD corpus (round-2 verdict
item 1): the formant-synthesized speech-like corpus (coarticulation,
phonotactics, speaker variation, noise) is not trivially separable, so
this gate asserts a *moderate* PER — a model that still learns tones but
mishandles formant structure, transitions, or masking fails here while
the tone gate (test_accuracy_regression.py) stays green.

Budget: ~5 min single-core CPU (2x64 model, 800 steps, 128 train utts).
Measured PER at the gate budget: ~0.49; breakage shows as >0.9.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_speechlike_training_reaches_moderate_per(tmp_path):
    from phones_las_tpu.data.prep_common import finalize_split_dir
    from phones_las_tpu.data.speechlike import write_speechlike_corpus
    from phones_las_tpu.cli import train as train_cli

    d = str(tmp_path / "data")
    os.makedirs(d, exist_ok=True)
    _, vocab = write_speechlike_corpus(
        os.path.join(d, "train.plu"), n_utts=128, seed=3)
    write_speechlike_corpus(os.path.join(d, "test.plu"), n_utts=48, seed=4)
    finalize_split_dir(d, vocab, cmvn_from=os.path.join(d, "train.plu"),
                       meta={"corpus": "speechlike"})

    wd = str(tmp_path / "run")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        train_cli.main([
            "--preset", "timit_phone_las", "--data", d, "--workdir", wd,
            "--num-steps", "800", "--eval-every", "400", "--batch-size", "16",
            "--encoder-layers", "2", "--encoder-units", "64",
            "--decoder-units", "64", "--embedding-dim", "32",
            "--attention-units", "64",
        ])
    evals = [json.loads(line.replace("'", '"'))
             for line in buf.getvalue().splitlines()
             if line.startswith("{'tag': 'eval'")]
    assert evals, buf.getvalue()[-2000:]
    best = min(e["per"] for e in evals)
    # measured ~0.47-0.49 at this budget; a broken compute path lands
    # >0.9 while the tone gate can stay green
    assert best <= 0.65, f"speechlike gate regressed: best held-out PER {best}"
    assert np.isfinite(evals[-1]["loss"])
