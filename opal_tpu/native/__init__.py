"""Native host-runtime bindings (ctypes over ``libopal_host.so``).

The reference's whole output path is native (Rust + CFITSIO); here the
host IO hot paths — text tables, FITS encoding, histogram binning —
are C++ with a pure-numpy fallback when the library is unavailable.

The library is built on first use (``make`` in this directory) and the
result cached; set ``OPAL_TPU_NO_NATIVE=1`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libopal_host.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        res = subprocess.run(
            ["make", "-s"], cwd=_DIR, capture_output=True, timeout=120
        )
        return res.returncode == 0 and _LIB_PATH.exists()
    except (OSError, subprocess.TimeoutExpired):
        return False


def lib():
    """The loaded native library, or None (fallback mode)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("OPAL_TPU_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        L = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    c_char_p = ctypes.c_char_p
    c_double_p = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    i32 = ctypes.c_int

    L.opal_write_text_table.restype = i32
    L.opal_write_text_table.argtypes = [c_char_p, c_double_p, i64, i64]
    L.opal_write_fits_image.restype = i32
    L.opal_write_fits_image.argtypes = [c_char_p, c_char_p, i64, c_double_p, i64]
    L.opal_hist1d.restype = i32
    L.opal_hist1d.argtypes = [
        c_double_p, c_double_p, i64, ctypes.c_double, ctypes.c_double, i64,
        i32, c_double_p,
    ]
    L.opal_hist2d.restype = i32
    L.opal_hist2d.argtypes = [
        c_double_p, c_double_p, c_double_p, i64,
        ctypes.c_double, ctypes.c_double, i64, i32,
        ctypes.c_double, ctypes.c_double, i64, i32, c_double_p,
    ]
    L.opal_finite_minmax.restype = i64
    L.opal_finite_minmax.argtypes = [c_double_p, i64, c_double_p, c_double_p]
    _lib = L
    return _lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def write_text_table(path, data: np.ndarray) -> bool:
    """Native text-table write; returns False if unavailable/failed."""
    L = lib()
    if L is None:
        return False
    data = np.ascontiguousarray(data, dtype=np.float64)
    rc = L.opal_write_text_table(
        str(path).encode(), _dptr(data), data.shape[0], data.shape[1]
    )
    return rc == 0


def write_fits_image(path, header: bytes, data: np.ndarray) -> bool:
    L = lib()
    if L is None:
        return False
    data = np.ascontiguousarray(data, dtype=np.float64)
    rc = L.opal_write_fits_image(
        str(path).encode(), header, len(header), _dptr(data), data.size
    )
    return rc == 0


def hist1d(values, weights, vmin, bin_sz, nbins, log_correct) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.float64)
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    cts = np.zeros(nbins, dtype=np.float64)
    rc = L.opal_hist1d(
        _dptr(values), _dptr(weights), values.size, float(vmin),
        float(bin_sz), int(nbins), int(bool(log_correct)), _dptr(cts),
    )
    return cts if rc == 0 else None


def hist2d(
    v0, v1, weights, min0, sz0, nb0, logc0, min1, sz1, nb1, logc1
) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    v0 = np.ascontiguousarray(v0, dtype=np.float64)
    v1 = np.ascontiguousarray(v1, dtype=np.float64)
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    cts = np.zeros(int(nb0) * int(nb1), dtype=np.float64)
    rc = L.opal_hist2d(
        _dptr(v0), _dptr(v1), _dptr(weights), v0.size,
        float(min0), float(sz0), int(nb0), int(bool(logc0)),
        float(min1), float(sz1), int(nb1), int(bool(logc1)), _dptr(cts),
    )
    return cts.reshape(int(nb1), int(nb0)) if rc == 0 else None


def finite_minmax(values) -> tuple[int, float, float] | None:
    L = lib()
    if L is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.float64)
    mn = ctypes.c_double()
    mx = ctypes.c_double()
    cnt = L.opal_finite_minmax(
        _dptr(values), values.size, ctypes.byref(mn), ctypes.byref(mx)
    )
    return int(cnt), mn.value, mx.value
