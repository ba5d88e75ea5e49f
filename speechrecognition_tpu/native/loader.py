"""ctypes wrapper for the native corpus loader (corpus_loader.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "corpus_loader.cpp")
_LIB = os.path.join(_HERE, "libcorpus_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.load_corpus.restype = ctypes.c_int
        lib.load_corpus.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_corpus_native(paths: List[str], mean: Optional[np.ndarray],
                       stddev: Optional[np.ndarray], n_in: int, n_first: int,
                       n_second: int, deriv_step: int, energy_max_norm: bool,
                       num_threads: int = 0,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel load of .mm2 files → (features [total_frames, n_total] f32,
    offsets int64 [n+1]). Raises RuntimeError if the library is missing or a
    file fails."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native corpus loader unavailable (no g++?)")
    n_total = n_in + n_first + n_second
    sizes = np.array([os.path.getsize(p) for p in paths], dtype=np.int64)
    frames = sizes // (4 * n_in)
    offsets = np.zeros(len(paths) + 1, dtype=np.int64)
    np.cumsum(frames, out=offsets[1:])
    out = np.empty((int(offsets[-1]), n_total), dtype=np.float32)

    c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    apply_norm = mean is not None
    mean_arr = np.ascontiguousarray(mean if apply_norm else np.zeros(n_total),
                                    dtype=np.float64)
    std_arr = np.ascontiguousarray(stddev if apply_norm else np.ones(n_total),
                                   dtype=np.float64)
    rc = lib.load_corpus(
        c_paths, len(paths),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(apply_norm), int(energy_max_norm),
        n_in, n_first, n_second, deriv_step,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    if rc != 0:
        raise RuntimeError(f"native loader failed on file {paths[rc - 1]}")
    return out, offsets
