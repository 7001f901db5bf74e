"""Multi-chip DP inference through the library API: a Transcriber with
``data_parallel > 1`` shards each wave's batch axis over a ('data',) mesh
(BASELINE configs[4] shape — embarrassingly parallel over utterances, no
collectives) and must produce exactly the tokens of the single-device
path. Runs on the fake-8 CPU mesh (conftest)."""

import numpy as np
import pytest

from phones_las_tpu.api import Transcriber
from phones_las_tpu.cli import prepare as prepare_cli
from phones_las_tpu.cli import train as train_cli

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("api_mesh")
    data, wd = str(root / "d"), str(root / "w")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "10",
                      "--n-phones", "4"])
    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "4",
        "--encoder-layers", "2", "--encoder-units", "16",
        "--decoder-units", "16", "--embedding-dim", "8",
        "--attention-units", "16",
    ])
    return wd


def test_data_parallel_matches_single_device(workdir):
    rs = np.random.RandomState(0)
    clips = [
        (rs.randn(6000 + 700 * i) * 2000).astype(np.int16) for i in range(6)
    ]
    ref = Transcriber(workdir).transcribe_batch(clips)

    t4 = Transcriber(workdir, data_parallel=4, max_device_batch=2)
    assert t4.mesh is not None and t4.mesh.shape["data"] == 4
    # 6 clips → one wave of 8 (rounded up to a multiple of the data axis)
    assert t4._wave_size(6) == 8
    assert t4.transcribe_batch(clips) == ref

    # data_parallel=0 = all local devices (8 on the fake mesh)
    t_all = Transcriber(workdir, data_parallel=0)
    assert t_all.data_parallel == 8
    assert t_all.transcribe_batch(clips) == ref


def test_data_parallel_beam_and_long_form(workdir):
    rs = np.random.RandomState(1)
    audio = (rs.randn(2 * 16000 + 123) * 2000).astype(np.int16)

    kw = dict(window_seconds=0.8, overlap_seconds=0.3)
    ref = Transcriber(workdir).transcribe_long(audio, **kw)
    t2 = Transcriber(workdir, data_parallel=2, max_device_batch=4)
    assert t2.transcribe_long(audio, **kw) == ref

    clips = [audio[:9000], audio[9000:18000]]
    ref_b = Transcriber(workdir, beam_width=2).transcribe_batch(clips)
    t2b = Transcriber(workdir, beam_width=2, data_parallel=2)
    assert t2b.transcribe_batch(clips) == ref_b
