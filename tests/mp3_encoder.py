"""Test-only MP3 encoder via the system libmp3lame (ctypes).

Produces fixture .mp3 files so the decode path (csrc libmpg123 shim) can
be tested end-to-end without shipping binary fixtures. Mirrors
``flac_encoder.py``'s role for FLAC.
"""

from __future__ import annotations

import ctypes

import numpy as np


def _lame():
    try:
        lib = ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        return None
    lib.lame_init.restype = ctypes.c_void_p
    for f in ("lame_set_in_samplerate", "lame_set_num_channels",
              "lame_set_brate", "lame_set_mode", "lame_init_params",
              "lame_close"):
        getattr(lib, f).argtypes = [ctypes.c_void_p] + (
            [ctypes.c_int] if f.startswith("lame_set") else []
        )
    lib.lame_encode_buffer.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.lame_encode_flush.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
    ]
    return lib


def available() -> bool:
    return _lame() is not None


def write_mp3(path: str, samples: np.ndarray, rate: int = 16000) -> None:
    """Encode int16 mono PCM to an .mp3 file."""
    lib = _lame()
    assert lib is not None, "libmp3lame unavailable"
    samples = np.ascontiguousarray(samples, np.int16)
    g = lib.lame_init()
    lib.lame_set_in_samplerate(g, rate)
    lib.lame_set_num_channels(g, 1)
    lib.lame_set_mode(g, 3)  # mono
    lib.lame_set_brate(g, 64)
    rc = lib.lame_init_params(g)
    assert rc >= 0, f"lame_init_params: {rc}"
    bufsize = len(samples) * 5 // 4 + 7200
    buf = ctypes.create_string_buffer(bufsize)
    n = lib.lame_encode_buffer(
        g, samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), None,
        len(samples), buf, bufsize,
    )
    assert n >= 0, f"lame_encode_buffer: {n}"
    out = buf.raw[:n]
    n2 = lib.lame_encode_flush(g, buf, bufsize)
    assert n2 >= 0
    out += buf.raw[:n2]
    lib.lame_close(g)
    with open(path, "wb") as f:
        f.write(out)
