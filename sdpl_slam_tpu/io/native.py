"""ctypes bindings for the native host-I/O kernels (native/sdpl_io.cpp).

Builds the shared library on first use (g++ is in the base image; pybind11
is not, hence ctypes).  Falls back to the pure-numpy readers when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _NATIVE_DIR / "libsdpl_io.so"
    try:
        if not so.exists() or (
            so.stat().st_mtime < (_NATIVE_DIR / "sdpl_io.cpp").stat().st_mtime
        ):
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.sdpl_parse_int_matrix.restype = ctypes.c_int64
        lib.sdpl_parse_int_matrix.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.sdpl_read_flo.restype = ctypes.c_int32
        lib.sdpl_read_flo.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sdpl_depth_kitti.restype = None
        lib.sdpl_depth_kitti.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ]
        lib.sdpl_read_png.restype = ctypes.c_int32
        lib.sdpl_read_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def parse_int_matrix(path: str, rows: int, cols: int) -> Optional[np.ndarray]:
    """Fast mask-txt parsing; None if the native library is unavailable or
    the file has fewer entries than rows*cols."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(rows * cols, np.int32)
    n = lib.sdpl_parse_int_matrix(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rows, cols,
    )
    if n != rows * cols:
        return None
    return out.reshape(rows, cols)


def read_png(path: str) -> Optional[np.ndarray]:
    """Decode a PNG with the native libpng kernel.  Returns (H, W) or
    (H, W, C) uint8/uint16; None when native decode is unavailable or
    the file isn't a PNG it handles."""
    lib = _load()
    if lib is None:
        return None
    # IHDR peek (spec bytes 16..25) sizes the output buffer exactly
    try:
        with open(path, "rb") as f:
            head = f.read(26)
    except OSError:
        return None
    if len(head) < 26 or head[1:4] != b"PNG":
        return None
    w = int.from_bytes(head[16:20], "big")
    h = int.from_bytes(head[20:24], "big")
    depth = head[24]
    ctype = head[25]
    nch = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}.get(ctype)
    if nch is None or w <= 0 or h <= 0:
        return None
    itemsize = 2 if depth == 16 else 1
    buf = np.zeros(h * w * nch * itemsize, np.uint8)
    ww = ctypes.c_int32(0)
    hh = ctypes.c_int32(0)
    cc = ctypes.c_int32(0)
    bd = ctypes.c_int32(0)
    rc = lib.sdpl_read_png(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        ctypes.byref(ww), ctypes.byref(hh), ctypes.byref(cc),
        ctypes.byref(bd),
    )
    if rc != 0:
        return None
    dtype = np.uint16 if bd.value == 16 else np.uint8
    arr = buf.view(dtype)[: hh.value * ww.value * cc.value]
    arr = arr.reshape(hh.value, ww.value, cc.value)
    return arr[..., 0] if cc.value == 1 else arr


def read_flo(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    # read header for dims first via numpy (8 bytes), then full native read
    with open(path, "rb") as f:
        head = np.fromfile(f, np.float32, 1)
        if head.size == 0 or head[0] != 202021.25:
            return None
        w, h = np.fromfile(f, np.int32, 2)
    out = np.zeros(int(h) * int(w) * 2, np.float32)
    ww = ctypes.c_int32(0)
    hh = ctypes.c_int32(0)
    rc = lib.sdpl_read_flo(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size, ctypes.byref(ww), ctypes.byref(hh),
    )
    if rc != 0:
        return None
    return out.reshape(int(hh.value), int(ww.value), 2)
