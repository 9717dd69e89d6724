"""Native host-side I/O acceleration (C++/OpenMP via ctypes).

Compiled lazily on first use with g++; all callers fall back to the
pure-numpy paths when the toolchain or build fails. The reference keeps
its ingest hot loops in C++ too (src/read-plink.cpp, src/read-bgen.cpp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False

_SRC = Path(__file__).parent / "io_native.cpp"
_SO = Path(__file__).parent / "_io_native.so"


def _build() -> bool:
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
           str(_SRC), "-o", str(_SO), "-lz"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        return res.returncode == 0
    except Exception:
        return False


def get_lib():
    """The loaded shared library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    lib.bed_subset_pack.restype = ctypes.c_int
    lib.bed_subset_pack.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.bgen_decode_variants.restype = ctypes.c_int
    lib.bgen_decode_variants.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    _LIB = lib
    return _LIB


def _as_i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def bed_subset_pack(packed: np.ndarray, rows, cols) -> np.ndarray | None:
    """Native 2-bit subset/repack; None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    rows = _as_i64(rows)
    cols = _as_i64(cols)
    out = np.zeros((len(rows), (len(cols) + 3) // 4), dtype=np.uint8)
    rc = lib.bed_subset_pack(
        packed.ctypes.data, packed.shape[0], packed.shape[1],
        rows.ctypes.data, len(rows), cols.ctypes.data, len(cols),
        out.ctypes.data)
    return out if rc == 0 else None


def bgen_decode_variants(file_bytes: bytes, offsets, comp_sizes, N,
                         ind_row, dosage: bool, seed: int = 0,
                         n_threads: int | None = None):
    """Native parallel BGEN decode; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = os.cpu_count() or 1
    buf = np.frombuffer(file_bytes, dtype=np.uint8)
    offsets = _as_i64(offsets)
    comp_sizes = _as_i64(comp_sizes)
    ind_row = _as_i64(ind_row)
    K, n_sub = len(offsets), len(ind_row)
    codes = np.empty((K, n_sub), dtype=np.uint8)
    info = np.empty(K)
    freq = np.empty(K)
    rc = lib.bgen_decode_variants(
        buf.ctypes.data, offsets.ctypes.data, comp_sizes.ctypes.data,
        K, N, ind_row.ctypes.data, n_sub,
        codes.ctypes.data, info.ctypes.data, freq.ctypes.data,
        int(dosage), seed, n_threads)
    if rc != 0:
        return None
    return codes, info, freq
