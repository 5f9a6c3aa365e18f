"""ctypes bindings + build for the C++ host ops (runtime/host_ops.cc).

Builds ``libwaveunet_host.so`` on first use with g++ (-O3 -march=native) and
exposes numpy-friendly wrappers. Every entry point has a pure-numpy fallback so
the framework works without a compiler; ``available()`` reports which path is
active. The Python data pipeline calls these for its host-side hot ops.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_ops.cc")
_LIB_PATH = os.path.join(_HERE, "libwaveunet_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception as e:  # no compiler / failure -> numpy fallback
        print(f"WARNING: native host ops build failed ({e}); using numpy")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.wav_decode_pcm16.argtypes = [i16p, ctypes.c_long, f32p]
        lib.wav_decode_pcm16.restype = ctypes.c_long
        lib.quantize_int16.argtypes = [f32p, ctypes.c_long, i16p]
        lib.resample_poly.argtypes = [f32p, ctypes.c_long, ctypes.c_int, f64p,
                                      ctypes.c_long, ctypes.c_long,
                                      ctypes.c_long, ctypes.c_long, f32p,
                                      ctypes.c_long]
        lib.gather_windows.argtypes = [f32p, ctypes.c_long, ctypes.c_int,
                                       i64p, ctypes.c_long, ctypes.c_long,
                                       f32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_pcm16(raw: np.ndarray) -> np.ndarray:
    """int16 [n] -> float32 [n]."""
    lib = _load()
    raw = np.ascontiguousarray(raw, np.int16)
    if lib is None:
        return raw.astype(np.float32) / 32768.0
    out = np.empty(raw.shape, np.float32)
    lib.wav_decode_pcm16(raw.reshape(-1), raw.size, out.reshape(-1))
    return out


def quantize_int16(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        return np.round(np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16)
    out = np.empty(x.shape, np.int16)
    lib.quantize_int16(x.reshape(-1), x.size, out.reshape(-1))
    return out


def resample_poly(x: np.ndarray, taps: np.ndarray, half: int, p: int, q: int,
                  n_out: int) -> np.ndarray:
    """Native polyphase kernel; callers compute taps via ops.resample."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native resample unavailable")
    x = np.ascontiguousarray(x, np.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    out = np.empty((n_out, x.shape[1]), np.float32)
    lib.resample_poly(x, x.shape[0], x.shape[1],
                      np.ascontiguousarray(taps, np.float64), len(taps),
                      half, p, q, out, n_out)
    return out[:, 0] if squeeze else out


def gather_windows(x: np.ndarray, starts: np.ndarray, win_len: int
                   ) -> np.ndarray:
    """[n, ch] + starts [w] -> [w, win_len, ch]."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    if lib is None:
        view = np.lib.stride_tricks.sliding_window_view(x, win_len, axis=0)
        return np.ascontiguousarray(
            np.transpose(view[starts], (0, 2, 1)), np.float32)
    out = np.empty((len(starts), win_len, x.shape[1]), np.float32)
    lib.gather_windows(x, x.shape[0], x.shape[1], starts, len(starts),
                       win_len, out)
    return out
