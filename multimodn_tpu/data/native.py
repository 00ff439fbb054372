"""ctypes bridge to the native C++ epoch packer (native/packer.cpp).

Compiled on first use with the system g++ into the package build dir; every
entry point degrades to the numpy implementation when the toolchain or the
shared object is unavailable, so the framework never hard-depends on it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "../.."))
_SRCS = [os.path.join(_REPO, "native", "packer.cpp"),
         os.path.join(_REPO, "native", "csv.cpp")]
_BUILD_DIR = os.path.join(_REPO, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libmmn_packer.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> Optional[str]:
    srcs = [p for p in _SRCS if os.path.exists(p)]
    if not srcs:
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and all(
            os.path.getmtime(_SO) >= os.path.getmtime(p) for p in srcs):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_lib():
    """Load (compiling if needed) the packer library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _compile()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        i64 = ctypes.c_int64
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.pack_epoch.argtypes = [
            f32p, i64, i64,
            ctypes.POINTER(i64), ctypes.POINTER(i64), ctypes.POINTER(i64),
            i64, i64, i64,
            ctypes.POINTER(f32p), f32p, f32p,
        ]
        lib.pack_epoch.restype = None
        lib.standardize_columns.argtypes = [f32p, i64, i64]
        lib.standardize_columns.restype = None
        if hasattr(lib, "csv_dims"):
            i64p = ctypes.POINTER(i64)
            lib.csv_dims.argtypes = [ctypes.c_char_p, i64p, i64p, i64p]
            lib.csv_dims.restype = i64
            f64p = ctypes.POINTER(ctypes.c_double)
            lib.csv_read_f64.argtypes = [ctypes.c_char_p, f64p, i64, i64,
                                         ctypes.c_char_p, i64, i64]
            lib.csv_read_f64.restype = i64
        if hasattr(lib, "csv_index"):
            i64p = ctypes.POINTER(i64)
            f64p = ctypes.POINTER(ctypes.c_double)
            lib.csv_index.argtypes = [ctypes.c_char_p, i64p, i64p, i64p, i64]
            lib.csv_index.restype = i64
            lib.csv_read_block_f64.argtypes = [ctypes.c_char_p, i64, i64,
                                               i64, i64, f64p, i64]
            lib.csv_read_block_f64.restype = i64
            lib.csv_read_rows_f64.argtypes = [ctypes.c_char_p, i64p, i64,
                                              i64, f64p, i64]
            lib.csv_read_rows_f64.restype = i64
        _lib = lib
        return _lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pack_epoch(X: np.ndarray, order: np.ndarray, widths: Sequence[int],
               batch: int, n_batches: int
               ) -> Optional[Tuple[List[np.ndarray], np.ndarray, np.ndarray]]:
    """Native epoch packing. Returns (blocks, mask, valid) or None when the
    native library is unavailable (caller falls back to numpy).

    blocks[m]: (n_batches, batch, widths[m]) float32
    mask:      (n_batches, batch) float32
    valid:     (n_batches, batch, M) float32
    """
    lib = get_lib()
    if lib is None:
        return None
    X = np.ascontiguousarray(X, dtype=np.float32)
    f = X.shape[1]
    n = len(order)  # rows to pack; `order` may index any row of X
    m = len(widths)
    assert sum(widths) == f
    offsets = np.zeros(m, np.int64)
    np.cumsum(widths[:-1], out=offsets[1:])
    order = np.ascontiguousarray(order, dtype=np.int64)
    if n_batches * batch < n:
        raise ValueError(
            f"epoch geometry too small: {n_batches} batches x {batch} holds "
            f"{n_batches * batch} rows < {n} ordered rows")

    blocks = [np.empty((n_batches, batch, w), np.float32) for w in widths]
    mask = np.empty((n_batches, batch), np.float32)
    valid = np.empty((n_batches, batch, m), np.float32)

    block_ptrs = (ctypes.POINTER(ctypes.c_float) * m)(
        *[_f32p(b) for b in blocks])
    widths_arr = np.asarray(widths, np.int64)
    lib.pack_epoch(
        _f32p(X), n, f,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        widths_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m, batch, n_batches,
        block_ptrs, _f32p(mask), _f32p(valid))
    return blocks, mask, valid


def standardize_columns(X: np.ndarray) -> Optional[np.ndarray]:
    """NaN-aware in-place column z-score (sklearn StandardScaler semantics).
    Returns the array, or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    X = np.ascontiguousarray(X, dtype=np.float32)
    lib.standardize_columns(_f32p(X), X.shape[0], X.shape[1])
    return X


def csv_index(path: str):
    """Bounded-memory CSV row index (native/csv.cpp csv_index): one
    streaming pass with a 1 MiB buffer records every data row's byte
    offset. Returns (n_rows, n_cols, offsets) where offsets is
    (n_rows + 1,) int64 and row i's bytes are offsets[i]..offsets[i+1] —
    or None when the file needs pandas (quoted fields, ragged rows) or the
    native library is unavailable. The index costs 8 bytes/row; the data
    itself is never held in host memory."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "csv_index"):
        return None
    i64 = ctypes.c_int64
    n_rows, n_cols = i64(0), i64(0)
    # Counting pass (offsets=null) so the offsets array can be sized.
    rc = lib.csv_index(path.encode(), ctypes.byref(n_rows),
                       ctypes.byref(n_cols), None, i64(0))
    if rc != 0:
        return None
    offsets = np.empty(n_rows.value + 1, np.int64)
    rc = lib.csv_index(path.encode(), ctypes.byref(n_rows),
                       ctypes.byref(n_cols),
                       offsets.ctypes.data_as(ctypes.POINTER(i64)),
                       i64(n_rows.value))
    if rc != 0:
        return None
    return n_rows.value, n_cols.value, offsets


def csv_read_block(path: str, byte_start: int, byte_end: int, n_rows: int,
                   n_cols: int, strict: bool = True):
    """Parse one contiguous row block (native csv_read_block_f64) into an
    (n_rows, n_cols) float64 matrix; None on failure (caller falls back)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "csv_read_block_f64"):
        return None
    out = np.empty((n_rows, n_cols), np.float64)
    rc = lib.csv_read_block_f64(
        path.encode(), ctypes.c_int64(byte_start), ctypes.c_int64(byte_end),
        ctypes.c_int64(n_rows), ctypes.c_int64(n_cols),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(1 if strict else 0))
    return out if rc == 0 else None


def csv_read_rows(path: str, spans: np.ndarray, n_cols: int,
                  strict: bool = True):
    """Parse `spans.shape[0]` non-contiguous rows (shuffled access; native
    csv_read_rows_f64). ``spans`` is (k, 2) int64 byte ranges. Returns a
    (k, n_cols) float64 matrix or None on failure."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "csv_read_rows_f64"):
        return None
    spans = np.ascontiguousarray(spans, np.int64)
    k = spans.shape[0]
    out = np.empty((k, n_cols), np.float64)
    rc = lib.csv_read_rows_f64(
        path.encode(),
        spans.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(k), ctypes.c_int64(n_cols),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(1 if strict else 0))
    return out if rc == 0 else None


def read_csv_f64(path: str, strict: bool = True):
    """Fast numeric-CSV reader (native/csv.cpp): one header row + float
    fields; empty/NA/NaN/None cells become NaN. Returns (matrix (n, f)
    float64 — doubles, so integer ID columns up to 2^53 survive exactly,
    column-name list) or None whenever the file needs pandas (quoted
    fields, ragged rows, non-numeric data with strict=True, or the native
    library is unavailable) — callers always fall back. Accuracy: tokens
    with <= 15 significant digits parse bit-identically to strtod via the
    exact mant*10^e rule; longer tokens use correctly-rounded strtod itself
    (at least as accurate as pandas' default approximate parser, within
    1 ulp of it). Measured 2.8x pandas on float32-precision matrices,
    ~parity on full-precision float64 dumps (bench in tests/test_native)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "csv_dims"):
        return None
    i64 = ctypes.c_int64
    n_rows, n_cols, hlen = i64(0), i64(0), i64(0)
    rc = lib.csv_dims(path.encode(), ctypes.byref(n_rows),
                      ctypes.byref(n_cols), ctypes.byref(hlen))
    if rc != 0:
        return None
    out = np.empty((n_rows.value, n_cols.value), np.float64)
    header = ctypes.create_string_buffer(hlen.value + 2)
    rc = lib.csv_read_f64(path.encode(),
                          out.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_double)),
                          n_rows.value,
                          n_cols.value, header, i64(hlen.value + 2),
                          i64(1 if strict else 0))
    if rc != 0:
        return None
    try:
        columns = header.value.decode("utf-8").split(",")
    except UnicodeDecodeError:
        return None
    columns = [c.strip() for c in columns]
    if len(columns) != n_cols.value:
        return None
    return out, columns
