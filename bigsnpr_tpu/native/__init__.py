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

_SRCS = [Path(__file__).parent / "io_native.cpp",
         Path(__file__).parent / "ldsplit_native.cpp",
         Path(__file__).parent / "cd_native.cpp"]
_SO = Path(__file__).parent / "_io_native.so"


def _build() -> bool:
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
           *[str(s) for s in _SRCS], "-o", str(_SO), "-lz"]
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
    if (not _SO.exists()
            or _SO.stat().st_mtime < max(s.stat().st_mtime for s in _SRCS)):
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
    for name, argtypes in (
        ("ldsplit_suffix", [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
                            ctypes.c_void_p]),
        ("ldsplit_entries", [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                             ctypes.c_double, ctypes.c_void_p, ctypes.c_int,
                             ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_void_p, ctypes.c_void_p]),
        ("ldsplit_group_rows", [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_void_p,
                                ctypes.c_void_p, ctypes.c_void_p]),
        ("ldsplit_dp", [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                        ctypes.c_int64, ctypes.c_double, ctypes.c_void_p,
                        ctypes.c_void_p, ctypes.c_void_p]),
        ("cd_gaussian_path", [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_void_p, ctypes.c_int64,
                              ctypes.c_double, ctypes.c_void_p,
                              ctypes.c_void_p, ctypes.c_int64,
                              ctypes.c_int64, ctypes.c_double,
                              ctypes.c_int64, ctypes.c_void_p,
                              ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_void_p]),
        ("cd_gaussian_gram_path", [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_double,
                                   ctypes.c_int64, ctypes.c_void_p,
                                   ctypes.c_int64, ctypes.c_double,
                                   ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_double,
                                   ctypes.c_double, ctypes.c_int64,
                                   ctypes.c_double, ctypes.c_int64,
                                   ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_void_p]),
        ("cd_binomial_path", [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_void_p, ctypes.c_int64,
                              ctypes.c_double, ctypes.c_void_p,
                              ctypes.c_void_p, ctypes.c_int64,
                              ctypes.c_int64, ctypes.c_double,
                              ctypes.c_int64, ctypes.c_void_p,
                              ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_void_p]),
    ):
        if hasattr(lib, name):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = argtypes
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


def ldsplit_suffix(lower, thr_r2: float, max_r2: float):
    """Per-column suffix sums of transformed r^2 (reference get_L,
    src/split-LD.cpp:16-61); None if native lib unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ldsplit_suffix"):
        return None
    indptr = _as_i64(lower.indptr)
    indices = _as_i64(lower.indices)
    data = np.ascontiguousarray(lower.data, dtype=np.float64)
    suff = np.empty(lower.nnz)
    lib.ldsplit_suffix(indptr.ctypes.data, indices.ctypes.data,
                       data.ctypes.data, lower.shape[0],
                       thr_r2, max_r2, suff.ctypes.data)
    return (indptr, indices, suff)


def ldsplit_tables(suffix_tables, m, min_size, max_size, max_K, max_cost,
                   pos_scaled):
    """Block-cost entries + DP tables (reference get_C,
    src/split-LD.cpp:66-145). Returns (C1_row0 (max_K,), best (m, max_K))
    or None if native lib unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ldsplit_dp"):
        return None
    indptr, indices, suff = suffix_tables
    pos_scaled = np.ascontiguousarray(pos_scaled, dtype=np.float64)

    counts = np.zeros(m, dtype=np.int64)
    lib.ldsplit_entries(indptr.ctypes.data, indices.ctypes.data,
                        suff.ctypes.data, m, min_size, max_size, max_cost,
                        pos_scaled.ctypes.data, 1, counts.ctypes.data,
                        None, None, None, None)
    total = int(counts.sum())
    offsets = np.zeros(m, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    rows = np.empty(total, dtype=np.int32)
    cols = np.empty(total, dtype=np.int32)
    E = np.empty(total, dtype=np.float32)
    lib.ldsplit_entries(indptr.ctypes.data, indices.ctypes.data,
                        suff.ctypes.data, m, min_size, max_size, max_cost,
                        pos_scaled.ctypes.data, 0, counts.ctypes.data,
                        offsets.ctypes.data, rows.ctypes.data,
                        cols.ctypes.data, E.ctypes.data)

    row_ptr = np.empty(m + 1, dtype=np.int64)
    cols2 = np.empty(total, dtype=np.int32)
    E2 = np.empty(total, dtype=np.float32)
    lib.ldsplit_group_rows(rows.ctypes.data, cols.ctypes.data, E.ctypes.data,
                           total, m, row_ptr.ctypes.data, cols2.ctypes.data,
                           E2.ctypes.data)

    c1row0 = np.empty(max_K)
    best = np.full((m, max_K), -1, dtype=np.int32)
    lib.ldsplit_dp(row_ptr.ctypes.data, cols2.ctypes.data, E2.ctypes.data,
                   m, min_size, max_size, max_K, max_cost,
                   pos_scaled.ctypes.data, c1row0.ctypes.data,
                   best.ctypes.data)
    return c1row0, best


def cd_gram_path(G, xty, c, ybar, lambdas, alpha, Gval, xvty, cv, yvbar,
                 yv2, n_abort, tol, maxit):
    """Covariance-mode gaussian CD path against precomputed Grams
    (O(p^2) per pass, n-independent). Returns (loss, beta, intercept,
    best_li) or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "cd_gaussian_gram_path"):
        return None
    G = np.ascontiguousarray(G, dtype=np.float64)
    Gval = np.ascontiguousarray(Gval, dtype=np.float64)
    xty = np.ascontiguousarray(xty, dtype=np.float64)
    xvty = np.ascontiguousarray(xvty, dtype=np.float64)
    c = np.ascontiguousarray(c, dtype=np.float64)
    cv = np.ascontiguousarray(cv, dtype=np.float64)
    lambdas = np.ascontiguousarray(lambdas, dtype=np.float64)
    p = G.shape[0]
    beta = np.zeros(p)
    intercept = np.zeros(1)
    loss = np.zeros(1)
    li = np.zeros(1, dtype=np.int64)
    rc = lib.cd_gaussian_gram_path(
        G.ctypes.data, xty.ctypes.data, c.ctypes.data, float(ybar), p,
        lambdas.ctypes.data, len(lambdas), float(alpha),
        Gval.ctypes.data, xvty.ctypes.data, cv.ctypes.data, float(yvbar),
        float(yv2), int(n_abort), float(tol), int(maxit),
        beta.ctypes.data, intercept.ctypes.data, loss.ctypes.data,
        li.ctypes.data)
    if rc != 0:
        return (np.inf, None, None, 0)
    return (float(loss[0]), beta, float(intercept[0]), int(li[0]))


def cd_path(X, y, lambdas, alpha, Xval, yval, n_abort, tol, maxit,
            family="gaussian"):
    """Native elastic-net CD path (gaussian/binomial). Returns
    (loss, beta, intercept, best_li) like the python fallback, or None
    if the native lib is unavailable."""
    lib = get_lib()
    name = f"cd_{family}_path"
    if lib is None or not hasattr(lib, name):
        return None
    Xf = np.asfortranarray(X, dtype=np.float64)
    Xvf = np.asfortranarray(Xval, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    yval = np.ascontiguousarray(yval, dtype=np.float64)
    lambdas = np.ascontiguousarray(lambdas, dtype=np.float64)
    n, p = Xf.shape
    beta = np.zeros(p)
    intercept = np.zeros(1)
    loss = np.zeros(1)
    li = np.zeros(1, dtype=np.int64)
    rc = getattr(lib, name)(
        Xf.ctypes.data, y.ctypes.data, n, p,
        lambdas.ctypes.data, len(lambdas), float(alpha),
        Xvf.ctypes.data, yval.ctypes.data, len(yval),
        int(n_abort), float(tol), int(maxit),
        beta.ctypes.data, intercept.ctypes.data, loss.ctypes.data,
        li.ctypes.data)
    if rc != 0:
        return (np.inf, None, None, 0)
    return (float(loss[0]), beta, float(intercept[0]), int(li[0]))
