"""ctypes binding for the native table reader/writer (fasttab.cpp).

The shared library is compiled lazily on first use (g++ is in the image;
pybind11 is not — ctypes keeps the binding dependency-free) and cached
next to the source; a stale or missing toolchain degrades silently to
the numpy path (io/tableio.py falls back when `lib()` returns None).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fasttab.cpp")
_SO = os.path.join(_HERE, "libfasttab.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    """(Re)compile the shared library when missing or older than the
    source. Returns True when a usable .so exists afterwards."""
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        proc = subprocess.run(
            [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                _SRC, "-o", _SO + ".tmp",
            ],
            capture_output=True,
            timeout=120,
        )
        if proc.returncode != 0:
            return False
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def lib():
    """The loaded CDLL, or None when the native path is unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            l = ctypes.CDLL(_SO)
        except OSError:
            return None
        l.ft_parse_file.restype = ctypes.POINTER(ctypes.c_double)
        l.ft_parse_file.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long),
        ]
        l.ft_free.restype = None
        l.ft_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        l.ft_write_table.restype = ctypes.c_int
        l.ft_write_table.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.c_long, ctypes.c_char_p, ctypes.c_int,
        ]
        _lib = l
        return _lib
