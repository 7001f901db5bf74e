"""ctypes bindings for the native C++ record reader (csrc/plu_records.cc).

Fills padded device-ready batches directly in C++ — no per-utterance
Python parsing on the training hot path. Built on first use next to the
audio decoder; ``NativeRecordReader.available()`` gates the fallback to
the pure-Python reader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from phones_las_tpu.data.audio_io import ensure_built

_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            so = ensure_built("plu_records.cc", "plu_records.so")
            if so is None:
                _failed = True
                return None
            lib = ctypes.CDLL(so)
        except Exception:
            _failed = True
            return None
        lib.plu_open.restype = ctypes.c_void_p
        lib.plu_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.plu_num_records.restype = ctypes.c_longlong
        lib.plu_num_records.argtypes = [ctypes.c_void_p]
        lib.plu_lengths.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.plu_read_batch.restype = ctypes.c_int
        lib.plu_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.plu_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeRecordReader:
    """Random-access batch filler over one .plu file."""

    @staticmethod
    def available() -> bool:
        return _load() is not None

    def __init__(self, path: str):
        lib = _load()
        assert lib is not None, "native record reader unavailable"
        self._lib = lib
        err = ctypes.create_string_buffer(256)
        self._h = lib.plu_open(path.encode(), err, 256)
        if not self._h:
            raise ValueError(f"{path}: {err.value.decode()}")
        self._n = int(lib.plu_num_records(self._h))

    def __len__(self) -> int:
        return self._n

    def lengths(self) -> np.ndarray:
        out = np.zeros((self._n, 3), np.int64)
        rc = self._lib.plu_lengths(self._h, out.ctypes.data_as(ctypes.c_void_p))
        assert rc == 0
        return out

    def read_batch(
        self,
        indices: np.ndarray,
        audio: np.ndarray,  # [B, S] int16 (rows >= len(indices) untouched)
        audio_lengths: np.ndarray,  # [B] int32
        targets: np.ndarray,  # [B, L] int32
        target_lengths: np.ndarray,  # [B] int32
        eos_id: int,
        pad_id: int,
        graphemes: Optional[np.ndarray] = None,
        grapheme_lengths: Optional[np.ndarray] = None,
        n_threads: Optional[int] = None,
    ) -> None:
        """``n_threads=None`` → one fill thread per core (capped at 8):
        the multi-chip serving feed needs ~1 core per chip to outpace the
        mesh (csrc/plu_records.cc); single-core hosts stay serial."""
        if n_threads is None:
            n_threads = min(8, os.cpu_count() or 1)
        idx = np.ascontiguousarray(indices, np.int64)
        err = ctypes.create_string_buffer(256)
        vp = lambda a: a.ctypes.data_as(ctypes.c_void_p) if a is not None else None
        rc = self._lib.plu_read_batch(
            self._h, vp(idx), len(idx),
            vp(audio), audio.shape[1], vp(audio_lengths),
            vp(targets), targets.shape[1], eos_id, pad_id, vp(target_lengths),
            vp(graphemes), graphemes.shape[1] if graphemes is not None else 0,
            vp(grapheme_lengths),
            int(n_threads),
            err, 256,
        )
        if rc != 0:
            raise ValueError(err.value.decode())

    def close(self):
        if self._h:
            self._lib.plu_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
