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
        lib.sdpl_depth_scale.restype = None
        lib.sdpl_depth_scale.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_float,
        ]
        lib.sdpl_read_png.restype = ctypes.c_int32
        lib.sdpl_read_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sdpl_read_png_buf.restype = ctypes.c_int32
        lib.sdpl_read_png_buf.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sdpl_parse_flo_buf.restype = ctypes.c_int32
        lib.sdpl_parse_flo_buf.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sdpl_parse_int_matrix_buf.restype = ctypes.c_int64
        lib.sdpl_parse_int_matrix_buf.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.sdpl_read_files_batch.restype = ctypes.c_int32
        lib.sdpl_read_files_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sdpl_free_buf.restype = None
        lib.sdpl_free_buf.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def depth_preprocess(d: np.ndarray, choose_data: int, factor: float,
                     bf: float) -> Optional[np.ndarray]:
    """Fused single-pass depth conversion (Tracking.cc:195-219) on the
    per-frame host path: KITTI (2) disparity->depth ``bf/(d/factor)``,
    OMD (1) ``d/factor``, negatives/zeros -> 0 in both.  Returns None
    for other modes (VirtualKITTI passthrough needs no kernel) or when
    the native library is unavailable."""
    lib = _load()
    if lib is None or choose_data not in (1, 2):
        return None
    src = np.ascontiguousarray(d, np.float32)
    out = np.empty_like(src)
    pf = ctypes.POINTER(ctypes.c_float)
    if choose_data == 2:
        lib.sdpl_depth_kitti(
            src.ctypes.data_as(pf), out.ctypes.data_as(pf), src.size,
            np.float32(bf), np.float32(factor),
        )
    else:
        lib.sdpl_depth_scale(
            src.ctypes.data_as(pf), out.ctypes.data_as(pf), src.size,
            np.float32(factor),
        )
    return out


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


def _png_out_alloc(head: bytes) -> Optional[np.ndarray]:
    """Size the decode buffer exactly from the IHDR peek (spec bytes
    16..25); None when the header isn't a handled PNG."""
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
    return np.zeros(h * w * nch * itemsize, np.uint8)


def _png_finish(buf: np.ndarray, ww, hh, cc, bd) -> np.ndarray:
    dtype = np.uint16 if bd.value == 16 else np.uint8
    arr = buf.view(dtype)[: hh.value * ww.value * cc.value]
    arr = arr.reshape(hh.value, ww.value, cc.value)
    return arr[..., 0] if cc.value == 1 else arr


def read_png(path: str) -> Optional[np.ndarray]:
    """Decode a PNG with the native libpng kernel.  Returns (H, W) or
    (H, W, C) uint8/uint16; None when native decode is unavailable or
    the file isn't a PNG it handles."""
    lib = _load()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            head = f.read(26)
    except OSError:
        return None
    buf = _png_out_alloc(head)
    if buf is None:
        return None
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
    return _png_finish(buf, ww, hh, cc, bd)


def parse_png(data: bytes) -> Optional[np.ndarray]:
    """Decode PNG bytes already in memory (the batched-read path)."""
    lib = _load()
    if lib is None:
        return None
    buf = _png_out_alloc(data[:26])
    if buf is None:
        return None
    ww = ctypes.c_int32(0)
    hh = ctypes.c_int32(0)
    cc = ctypes.c_int32(0)
    bd = ctypes.c_int32(0)
    rc = lib.sdpl_read_png_buf(
        ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        ctypes.byref(ww), ctypes.byref(hh), ctypes.byref(cc),
        ctypes.byref(bd),
    )
    if rc != 0:
        return None
    return _png_finish(buf, ww, hh, cc, bd)


def parse_flo(data: bytes) -> Optional[np.ndarray]:
    """Parse Middlebury .flo bytes already in memory."""
    lib = _load()
    if lib is None or len(data) < 12:
        return None
    w = int.from_bytes(data[4:8], "little")
    h = int.from_bytes(data[8:12], "little")
    if w <= 0 or h <= 0:
        return None
    out = np.zeros(h * w * 2, np.float32)
    ww = ctypes.c_int32(0)
    hh = ctypes.c_int32(0)
    rc = lib.sdpl_parse_flo_buf(
        ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
        ctypes.byref(ww), ctypes.byref(hh),
    )
    if rc != 0:
        return None
    return out.reshape(hh.value, ww.value, 2)


def parse_int_matrix_bytes(data: bytes, rows: int,
                           cols: int) -> Optional[np.ndarray]:
    """Parse a whitespace-separated integer matrix from memory."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(rows * cols, np.int32)
    n = lib.sdpl_parse_int_matrix_buf(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), rows, cols,
    )
    if n != rows * cols:
        return None
    return out.reshape(rows, cols)


last_batch_mode = -1  # 1 = io_uring, 0 = pread fallback (diagnostics)


def read_files_batch(paths) -> Optional[list]:
    """Read whole files concurrently — ONE io_uring submission when the
    kernel allows it, pread fallback otherwise.  Returns bytes-or-None
    per path; None when the native library is unavailable.  The frame
    loader bundles its per-frame files (image/depth/flow/mask) through
    this instead of four serialized read() round-trips."""
    global last_batch_mode
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    bufs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    sizes = (ctypes.c_int64 * n)()
    mode = ctypes.c_int32(-1)
    lib.sdpl_read_files_batch(arr, n, bufs, sizes, ctypes.byref(mode))
    last_batch_mode = mode.value
    out = []
    for i in range(n):
        if sizes[i] < 0:
            out.append(None)
            continue
        out.append(ctypes.string_at(bufs[i], sizes[i]))
        lib.sdpl_free_buf(bufs[i])
    return out


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
