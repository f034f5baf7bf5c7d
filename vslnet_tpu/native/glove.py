"""ctypes wrapper for the native GloVe scanner (glove_scan.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the
source keyed by mtime); callers fall back to the pure-Python path when the
toolchain is unavailable.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "glove_scan.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_dir():
    d = os.environ.get("VSLNET_NATIVE_BUILD_DIR") or os.path.join(
        _HERE, "_build"
    )
    os.makedirs(d, exist_ok=True)
    return d


def load_library():
    """Compile (if needed) and dlopen the scanner; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so_path = os.path.join(
            _build_dir(),
            "glove_scan_%d.so" % int(os.path.getmtime(_SRC)),
        )
        if not os.path.exists(so_path):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", so_path],
                    check=True, capture_output=True, timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.glove_filter.restype = ctypes.c_long
        lib.glove_filter.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
        ]
        _LIB = lib
        return _LIB


def native_available():
    return load_library() is not None


def glove_filter(glove_path, words, dim=300):
    """One-pass membership + vector extraction for a word list.

    Returns (vectors [n, dim] float32, found [n] bool). Raises RuntimeError
    if the native library is unavailable (callers decide the fallback).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native glove scanner unavailable")
    n = len(words)
    vectors = np.zeros((max(n, 1), dim), dtype=np.float32)
    found = np.zeros((max(n, 1),), dtype=np.uint8)
    blob = "\n".join(words).encode("utf-8")
    rc = lib.glove_filter(
        os.fspath(glove_path).encode("utf-8"), blob, n, dim,
        vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        found.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc < 0:
        raise RuntimeError("glove scan failed for %s" % glove_path)
    return vectors[:n], found[:n].astype(bool)
