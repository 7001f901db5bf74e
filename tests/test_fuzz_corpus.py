"""Regression corpus replay (fast tier): every committed crasher /
crafted hostile input in tests/fuzz_corpus/ must decode or raise a
clean Python exception — never crash. Each file replays in a
SUBPROCESS so a native-parser segfault fails the test instead of
killing pytest.

Seed fixtures cover the classes the fuzzer has found or targets:
FLAC metadata-length OOB (the round-3 segfault), FLAC huge STREAMINFO
sample count, WAV data-chunk size beyond EOF, SPHERE absurd sample
count, .plu payload-length size_t-underflow and nested audio-length
OOB. ``pending_*`` files are fresh crashers auto-preserved by the slow
fuzz tier (test_fuzz_decoders.py) awaiting a fix + rename.
"""

import glob
import os
import subprocess
import sys

import pytest

CORPUS_DIR = os.path.join(os.path.dirname(__file__), "fuzz_corpus")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_REPLAY = r"""
import sys
path = sys.argv[1]
from phones_las_tpu.data import audio_io
from phones_las_tpu.data.native_records import NativeRecordReader
from phones_las_tpu.data.records import RecordReader
import numpy as np
try:
    if path.endswith(".plu"):
        if NativeRecordReader.available():
            r = NativeRecordReader(path)
            try:
                b = min(len(r), 4)
                if b > 0:
                    audio = np.zeros((b, 2048), np.int16)
                    r.lengths()
                    r.read_batch(np.arange(b), audio, np.zeros(b, np.int32),
                                 np.zeros((b, 16), np.int32),
                                 np.zeros(b, np.int32),
                                 eos_id=1, pad_id=0, n_threads=2)
            finally:
                r.close()
        for _ in RecordReader(path):
            pass
    else:
        audio_io.read_audio(path)
    print("DECODED")
except Exception as e:
    print(f"REJECTED {type(e).__name__}")
"""


def corpus_files():
    files = [p for p in sorted(glob.glob(os.path.join(CORPUS_DIR, "*")))
             if not p.endswith(".idx")]
    assert files, "fuzz corpus is empty — seed fixtures missing"
    return files


@pytest.mark.parametrize(
    "path", corpus_files(), ids=[os.path.basename(p) for p in corpus_files()]
)
def test_replay_never_crashes(path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, "-c", _REPLAY, path],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert proc.returncode == 0, (
        f"{os.path.basename(path)} crashed the decoder "
        f"(rc={proc.returncode}):\n{proc.stderr[-2000:]}"
    )
    assert "DECODED" in proc.stdout or "REJECTED" in proc.stdout, proc.stdout
