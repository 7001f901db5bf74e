"""Fuzz harness over every file parser (round-2 verdict item 6).

Each format is fuzzed in a SUBPROCESS (tests/fuzz_child.py): thousands
of seeded mutations of a valid fixture — byte-level (flips, truncations,
insertions, zeroed spans, header-targeted flips) plus structure-aware
ones (MP3 frame-header bit flips, .plu length-field corruption) — are
fed to the decoders, and the child's exit code proves none of them
crashed the C++ parsers (phones_las_tpu/csrc/plu_audio.cc,
plu_records.cc) or the Python fallbacks — every mutation either decodes
or raises a clean Python exception.

When a mutation DOES crash the child, the mutated input survives in the
test tmpdir; the harness copies it into ``tests/fuzz_corpus/`` as a
pending fixture so the crasher is preserved for the regression-replay
test (fast tier, ``test_fuzz_corpus.py``) the moment it is found.
"""

import glob
import os
import shutil
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_CHILD = os.path.join(os.path.dirname(__file__), "fuzz_child.py")
CORPUS_DIR = os.path.join(os.path.dirname(__file__), "fuzz_corpus")


def _preserve_crasher(fmt, seed, tmp_path):
    """Copy the crashing mutated input(s) out of the tmpdir into the
    committed regression corpus as pending fixtures."""
    os.makedirs(CORPUS_DIR, exist_ok=True)
    saved = []
    for p in glob.glob(os.path.join(str(tmp_path), "m.*")):
        dst = os.path.join(
            CORPUS_DIR, f"pending_{fmt}_{seed}{os.path.splitext(p)[1]}")
        shutil.copyfile(p, dst)
        saved.append(dst)
    return saved


def _run(fmt, n, seed, tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, _CHILD, fmt, str(n), str(seed), str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    if proc.returncode != 0:
        saved = _preserve_crasher(fmt, seed, tmp_path)
        raise AssertionError(
            f"fuzz[{fmt}] crashed (rc={proc.returncode}); crashing input "
            f"preserved at {saved} — commit it to tests/fuzz_corpus/ with "
            f"the fix:\nstdout: {proc.stdout[-2000:]}\n"
            f"stderr: {proc.stderr[-2000:]}"
        )
    if "SKIP" in proc.stdout:
        pytest.skip(proc.stdout.strip())
    assert "0 crashes" in proc.stdout, proc.stdout
    return proc.stdout


@pytest.mark.parametrize("fmt,n,min_rejected", [
    # mp3's floor is low by design: libmpg123 resyncs through nearly any
    # garbage, so few mutations produce hard failures
    ("wav", 2500, 120), ("sphere", 2500, 120), ("flac", 3000, 150),
    ("mp3", 1500, 8),
])
def test_fuzz_audio_decoders(fmt, n, min_rejected, tmp_path):
    out = _run(fmt, n, seed=42, tmp_path=tmp_path)
    # the mutator must actually be exercising the error paths: a fuzz
    # run where everything still decodes means the fixture/mutator is
    # broken, not that the parser is robust
    rejected = int(out.split("rejected")[0].rsplit(",", 1)[-1])
    assert rejected >= min_rejected, out


def test_fuzz_record_reader(tmp_path):
    out = _run("plu", 2400, seed=7, tmp_path=tmp_path)
    rejected = int(out.split("rejected")[0].rsplit(",", 1)[-1])
    assert rejected > 100, out
