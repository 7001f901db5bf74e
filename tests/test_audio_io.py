"""Audio IO: native C++ decoder vs Python fallbacks and the test FLAC
encoder (verbatim, constant, fixed-predictor, stereo)."""

import struct

import numpy as np
import pytest

from phones_las_tpu.data import audio_io
from tests.flac_encoder import encode_flac


def _pcm(n=12345, seed=0):
    rng = np.random.RandomState(seed)
    # correlated signal so fixed predictors produce small residuals
    x = np.cumsum(rng.randn(n) * 300).astype(np.int64)
    return np.clip(x - x.mean(), -30000, 30000).astype(np.int16)


def test_wav_roundtrip_python(tmp_path):
    p = str(tmp_path / "a.wav")
    pcm = _pcm()
    audio_io.write_wav(p, pcm, 16000)
    got, rate = audio_io._read_wav_py(p)
    assert rate == 16000
    np.testing.assert_array_equal(got, pcm)


def test_wav_native_matches_python(tmp_path):
    if audio_io._native() is None:
        pytest.skip("no C++ compiler")
    p = str(tmp_path / "a.wav")
    pcm = _pcm(seed=1)
    audio_io.write_wav(p, pcm, 16000)
    got, rate = audio_io._read_native(p)
    assert rate == 16000
    np.testing.assert_array_equal(got, pcm)


def _write_sphere(path, pcm, rate=16000, big=False):
    hdr = (
        "NIST_1A\n   1024\n"
        f"sample_rate -i {rate}\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        f"sample_byte_format -s2 {'10' if big else '01'}\n"
        "sample_coding -s3 pcm\n"
        "end_head\n"
    ).encode()
    hdr += b" " * (1024 - len(hdr))
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(pcm.astype(">i2" if big else "<i2").tobytes())


@pytest.mark.parametrize("big", [False, True])
def test_sphere_python_and_native(tmp_path, big):
    p = str(tmp_path / "a.sph")
    pcm = _pcm(seed=2)
    _write_sphere(p, pcm, big=big)
    got, rate = audio_io._read_sphere_py(p)
    assert rate == 16000
    np.testing.assert_array_equal(got, pcm)
    if audio_io._native() is not None:
        got2, rate2 = audio_io._read_native(p)
        assert rate2 == 16000
        np.testing.assert_array_equal(got2, pcm)


@pytest.mark.parametrize(
    "mode", ["verbatim", "constant", "fixed1", "fixed2", "fixed4"]
)
def test_flac_native_decode(tmp_path, mode):
    if audio_io._native() is None:
        pytest.skip("no C++ compiler")
    pcm = (
        np.full(10000, 123, np.int16) if mode == "constant" else _pcm(10000, seed=3)
    )
    p = str(tmp_path / "a.flac")
    with open(p, "wb") as f:
        f.write(encode_flac(pcm, mode=mode))
    got, rate = audio_io.read_audio(p)
    assert rate == 16000
    np.testing.assert_array_equal(got, pcm)


def test_flac_stereo_averages(tmp_path):
    if audio_io._native() is None:
        pytest.skip("no C++ compiler")
    left, right = _pcm(5000, 4), _pcm(5000, 5)
    stereo = np.stack([left, right], axis=1)
    p = str(tmp_path / "s.flac")
    with open(p, "wb") as f:
        f.write(encode_flac(stereo, mode="verbatim"))
    got, _ = audio_io.read_audio(p)
    ref = ((left.astype(np.int64) + right.astype(np.int64)) // 2).astype(np.int16)
    # C++ averages with truncation toward zero; allow off-by-one
    assert np.abs(got.astype(np.int64) - ref).max() <= 1


def test_mp3_raises(tmp_path):
    p = str(tmp_path / "x.mp3")
    open(p, "wb").write(b"\xff\xfb\x00")
    with pytest.raises(ValueError, match="mp3"):
        audio_io.read_audio(p)
