"""Native (C++) host-runtime components, built on demand with g++.

The compute path is JAX/XLA/Pallas on TPU; the host-side runtime around it
uses native code where it matters — currently the UJI data-loader parse
path (the only work that scales with dataset size off-device). Bindings
are plain ctypes over a C ABI (no pybind11), and every native entry point
has a pure-Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "uji_parser.cc")
_LIB = os.path.join(_DIR, "libuji_parser.so")
_LOCK = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class _UjiParse(ctypes.Structure):
    _fields_ = [
        ("n_samples", ctypes.c_int32),
        ("max_points", ctypes.c_int32),
        ("points", ctypes.POINTER(ctypes.c_float)),
        ("lengths", ctypes.POINTER(ctypes.c_int32)),
        ("names", ctypes.c_char_p),
        ("names_len", ctypes.c_int64),
        ("error", ctypes.c_char_p),
    ]


def build(force: bool = False) -> str:
    """Compile the native library if missing (g++ -O3 -shared -fPIC)."""
    if not force and os.path.exists(_LIB) and (
        os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    ):
        return _LIB
    tmp = _LIB + ".tmp"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
        check=True,
        capture_output=True,
    )
    os.replace(tmp, _LIB)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    with _LOCK:
        if _lib is None:
            lib = ctypes.CDLL(build())
            lib.uji_parse_file.restype = ctypes.POINTER(_UjiParse)
            lib.uji_parse_file.argtypes = [ctypes.c_char_p, ctypes.c_int32]
            lib.uji_parse_free.argtypes = [ctypes.POINTER(_UjiParse)]
            lib.uji_parse_free.restype = None
            _lib = lib
    return _lib


def available() -> bool:
    """True if the native library is (or can be) built and loaded."""
    try:
        _load()
        return True
    except Exception:
        return False


def parse_uji_file_native(path: str, max_points: int = 256) -> dict:
    """Parse one UJI v2 file natively.

    Returns dict(points [N, max_points, 2] f32, lengths [N] i32,
    names list[str] per sample) — bit-identical to the Python parser's
    per-file output (tests/test_native.py).
    """
    lib = _load()
    res = lib.uji_parse_file(path.encode(), max_points)
    try:
        r = res.contents
        if r.error:
            raise ValueError(r.error.decode())
        n = r.n_samples
        if n == 0:
            # Valid empty parse (comments-only file): mirror the Python
            # parser's [] without dereferencing the (possibly NULL) buffers.
            return {
                "points": np.zeros((0, max_points, 2), np.float32),
                "lengths": np.zeros((0,), np.int32),
                "names": [],
            }
        pts = np.ctypeslib.as_array(r.points, shape=(n, max_points, 2)).copy()
        lengths = np.ctypeslib.as_array(r.lengths, shape=(n,)).copy()
        names = r.names.decode().split("\n") if r.names_len else []
        return {"points": pts, "lengths": lengths, "names": names}
    finally:
        lib.uji_parse_free(res)
