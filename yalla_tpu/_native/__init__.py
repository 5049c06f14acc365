"""Native (C++) runtime components, bound via ctypes.

Built on first use with the system toolchain and cached next to the
sources; every consumer has a pure-Python fallback, so a missing compiler
never breaks the framework.  Disable with YALLA_TPU_NATIVE=0.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libvtkio_native.so")
_SRC = os.path.join(_HERE, "vtkio_native.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:  # OpenMP parallelizes the mesh-exclusion kernel over points
        subprocess.run(base[:1] + ["-fopenmp"] + base[1:], check=True,
                       capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(base, check=True, capture_output=True)


def get_lib():
    """The loaded native library, or None (fallback to pure Python)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("YALLA_TPU_NATIVE", "1") == "0":
            return None
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            c_long, c_int = ctypes.c_long, ctypes.c_int
            fp = ctypes.POINTER(ctypes.c_float)
            ip = ctypes.POINTER(ctypes.c_int32)
            cp = ctypes.c_char_p
            lib.yt_format_rows.restype = c_long
            lib.yt_format_rows.argtypes = [fp, c_long, c_int,
                                           ctypes.c_char_p, c_long]
            lib.yt_format_ints.restype = c_long
            lib.yt_format_ints.argtypes = [ip, c_long, ctypes.c_char_p,
                                           c_long]
            lib.yt_format_vertices.restype = c_long
            lib.yt_format_vertices.argtypes = [c_long, ctypes.c_char_p,
                                               c_long]
            lib.yt_format_lines.restype = c_long
            lib.yt_format_lines.argtypes = [ip, ip, c_long, ctypes.c_char_p,
                                            c_long]
            lib.yt_parse_floats.restype = c_long
            lib.yt_parse_floats.argtypes = [cp, c_long, fp, c_long]
            lib.yt_parse_doubles.restype = c_long
            lib.yt_parse_doubles.argtypes = [
                cp, c_long, ctypes.POINTER(ctypes.c_double), c_long]
            dp = ctypes.POINTER(ctypes.c_double)
            lib.yt_test_exclusion.restype = c_long
            lib.yt_test_exclusion.argtypes = [
                dp, c_long, dp, c_long, dp,
                ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def format_rows(arr):
    """[n, k] or [n] float array -> ASCII rows, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(arr, np.float32)
    if a.ndim == 1:
        a = a[:, None]
    n, width = a.shape
    cap = n * width * 18 + 64
    buf = ctypes.create_string_buffer(cap)
    written = lib.yt_format_rows(_fptr(a), n, width, buf, cap)
    return buf.raw[:written].decode() if written >= 0 else None


def format_ints(arr):
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(arr, np.int32)
    cap = len(a) * 14 + 64
    buf = ctypes.create_string_buffer(cap)
    written = lib.yt_format_ints(_iptr(a), len(a), buf, cap)
    return buf.raw[:written].decode() if written >= 0 else None


def format_vertices(n):
    lib = get_lib()
    if lib is None:
        return None
    cap = n * 16 + 64
    buf = ctypes.create_string_buffer(cap)
    written = lib.yt_format_vertices(n, buf, cap)
    return buf.raw[:written].decode() if written >= 0 else None


def format_lines(a, b):
    lib = get_lib()
    if lib is None:
        return None
    aa = np.ascontiguousarray(a, np.int32)
    bb = np.ascontiguousarray(b, np.int32)
    cap = len(aa) * 28 + 64
    buf = ctypes.create_string_buffer(cap)
    written = lib.yt_format_lines(_iptr(aa), _iptr(bb), len(aa), buf, cap)
    return buf.raw[:written].decode() if written >= 0 else None


def parse_floats(text, max_count):
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode() if isinstance(text, str) else text
    out = np.empty(max_count, np.float32)
    k = lib.yt_parse_floats(raw, len(raw), _fptr(out), max_count)
    return out[:k]


def parse_doubles(text, max_count):
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode() if isinstance(text, str) else text
    out = np.empty(max_count, np.float64)
    k = lib.yt_parse_doubles(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_count)
    return out[:k]


def test_exclusion(points, facet_vertices, ray_dir):
    """Ray-parity point-in-closed-mesh test (True = outside) on the native
    kernel, or None if unavailable.  ``points`` [n, 3], ``facet_vertices``
    [f, 3, 3], ``ray_dir`` [3] (the reference's fixed direction,
    mesh.cuh:390)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "yt_test_exclusion"):
        return None
    P = np.ascontiguousarray(points, np.float64)
    V = np.ascontiguousarray(facet_vertices, np.float64)
    d = np.ascontiguousarray(ray_dir, np.float64)
    out = np.empty(len(P), np.uint8)
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    n = lib.yt_test_exclusion(
        dptr(P), len(P), dptr(V), len(V), dptr(d),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool) if n == len(P) else None
