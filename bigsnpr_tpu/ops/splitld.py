"""Optimal LD splitting into near-independent blocks.

Reference: snp_ldsplit (R/split-LD.R:99-138, src/split-LD.cpp): exact DP
minimizing the sum of squared correlations outside blocks, tie-broken on
the sum of squared block sizes, with min/max block size, a max_r2
forbidden-pair infinity cost, and a scaled-position window constraint.

Host-side vectorized numpy (the DP tables are small relative to the
device GEMMs producing the LD); per-k updates are flat array reductions
over all (row, col) block candidates, reproducing the reference's
lexicographic (cost, cost2) tie-breaking and its larger-col preference
(src/split-LD.cpp:117-141 iterates col descending with strict-improve).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import scipy.sparse as sp

from bigsnpr_tpu.ops.corr import SparseLD


def _get_L(lower: sp.csc_matrix, thr_r2: float, max_r2: float):
    """Suffix sums L(i, j) = sum_{q >= j} r^2(i, q) for j > i, with r^2 <
    thr_r2 ignored and r^2 > max_r2 -> inf (reference get_L,
    src/split-LD.cpp:16-61). Returns CSC (m, m+1)."""
    m = lower.shape[0]
    Lp, Li, Lx = lower.indptr, lower.indices, lower.data
    out_i, out_j, out_x = [], [], []
    for col in range(m):
        seg = slice(Lp[col], Lp[col + 1])
        rows = Li[seg]
        vals = Lx[seg]
        above = rows > col
        rows, vals = rows[above], vals[above]
        if rows.size == 0:
            continue
        r2 = vals * vals
        r2 = np.where(r2 >= thr_r2, r2, 0.0)
        r2 = np.where(r2 > max_r2, np.inf, r2)
        # suffix sums at entry rows (rows ascending)
        suff = np.cumsum(r2[::-1])[::-1]
        # fill all rows in (col, last]
        fill_rows = np.arange(col + 1, rows[-1] + 1)
        k = np.searchsorted(rows, fill_rows, side="left")
        lvals = suff[k]
        nz = lvals > 0
        if nz.any():
            out_i.append(np.full(nz.sum(), col))
            out_j.append(fill_rows[nz])
            out_x.append(lvals[nz])
    if out_i:
        i = np.concatenate(out_i)
        j = np.concatenate(out_j)
        x = np.concatenate(out_x)
    else:
        i = j = np.array([], dtype=np.int64)
        x = np.array([])
    return sp.csc_matrix((x, (i, j)), shape=(m, m + 1))


def _get_C(L: sp.csc_matrix, min_size: int, max_size: int, max_K: int,
           max_cost: float, pos_scaled: np.ndarray):
    """DP cost tables (reference get_C, src/split-LD.cpp:66-145).
    Returns (C (m, max_K), best_ind (m, max_K) with -1 for NA)."""
    m = L.shape[0]
    Lp, Li, Lx = L.indptr, L.indices, L.data

    # E(row, col) for each col: suffix accumulation of L(row, col+1)
    F_row, F_col, F_E = [], [], []
    for col in range(m):
        seg = slice(Lp[col + 1], Lp[col + 2])
        colvals = np.zeros(col + 1)
        colvals[Li[seg]] = Lx[seg]
        window = min(max_size, col + 1)
        rows = col - np.arange(window)
        ok_pos = pos_scaled[rows] >= pos_scaled[col] - 1
        stop = np.argmin(ok_pos) if not ok_pos.all() else window
        rows = rows[:stop]
        e = np.cumsum(colvals[rows])
        over = e > max_cost
        stop2 = np.argmax(over) if over.any() else len(e)
        rows, e = rows[:stop2], e[:stop2]
        counts = np.arange(1, len(rows) + 1)
        keep = counts >= min_size
        if keep.any():
            F_row.append(rows[keep])
            F_col.append(np.full(keep.sum(), col))
            F_E.append(e[keep])
    if F_row:
        F_row = np.concatenate(F_row)
        F_col = np.concatenate(F_col)
        F_E = np.concatenate(F_E).astype(np.float32)  # reference uses float
        F_E = F_E.astype(np.float64)
        F_sq = (F_col - F_row + 1.0) ** 2
    else:
        F_row = F_col = np.array([], dtype=np.int64)
        F_E = F_sq = np.array([])

    C1 = np.full((m, max_K), np.inf)
    C2 = np.full((m, max_K), np.inf)
    best = np.full((m, max_K), -1, dtype=np.int64)

    # k = 0: single final block [row, m-1]
    pos_min = pos_scaled[m - 1] - 1
    for size in range(min_size, max_size + 1):
        row = m - size
        if row < 0 or pos_scaled[row] < pos_min:
            break
        best[row, 0] = m
        C1[row, 0] = 0.0
        C2[row, 0] = float(size) ** 2

    if len(F_row):
        # per-k update as jitted segment reductions (the numpy ufunc.at
        # version dominated pipeline wall time)
        import jax
        import jax.numpy as jnp

        @jax.jit
        def dp_step(c1prev, c2prev, rows, cols, E, sq):
            c1prev = jnp.r_[c1prev, jnp.inf]
            c2prev = jnp.r_[c2prev, jnp.inf]
            cost1 = E + c1prev[cols + 1]
            cost2 = sq + c2prev[cols + 1]
            c1min = jax.ops.segment_min(cost1, rows, num_segments=m)
            t1 = cost1 == c1min[rows]
            c2min = jax.ops.segment_min(jnp.where(t1, cost2, jnp.inf), rows,
                                        num_segments=m)
            t2 = t1 & (cost2 == c2min[rows])
            colbest = jax.ops.segment_max(jnp.where(t2, cols, -2), rows,
                                          num_segments=m)
            return c1min, c2min, colbest

        rows_j = jnp.asarray(F_row, dtype=jnp.int32)
        cols_j = jnp.asarray(F_col, dtype=jnp.int32)
        E_j = jnp.asarray(F_E)
        sq_j = jnp.asarray(F_sq)
        for k in range(1, max_K):
            c1min, c2min, colbest = dp_step(
                jnp.asarray(C1[:, k - 1]), jnp.asarray(C2[:, k - 1]),
                rows_j, cols_j, E_j, sq_j)
            c1min = np.asarray(c1min)
            upd = np.isfinite(c1min)
            C1[upd, k] = c1min[upd]
            C2[upd, k] = np.asarray(c2min)[upd]
            best[upd, k] = np.asarray(colbest)[upd] + 1
            if C1[0, k] > max_cost and C1[0, k] > C1[0, k - 1]:
                break

    return C1, best


def _get_perc(lower: sp.csc_matrix, all_last: np.ndarray) -> float:
    """Fraction of nonzero LD values inside the blocks
    (reference get_perc, src/split-LD.cpp:150-182). Vectorized: each
    entry is compared against its column's block limit."""
    m = lower.shape[0]
    Lp, Li = lower.indptr, lower.indices
    count_all = 2 * lower.nnz - m
    limits = np.asarray(all_last)  # last index (0-based) of each block
    col_limit = limits[np.searchsorted(limits, np.arange(m))]
    entry_limit = np.repeat(col_limit, np.diff(Lp))
    outside = int((Li > entry_limit).sum())
    return (count_all - 2 * outside) / count_all


def snp_ldsplit(corr: SparseLD | sp.spmatrix, thr_r2: float, min_size: int,
                max_size, max_K: int = 500, max_r2: float = 0.3,
                max_cost: float | None = None, pos_scaled=None) -> pd.DataFrame | None:
    """Reference snp_ldsplit (R/split-LD.R:99-138)."""
    S = corr.sym() if isinstance(corr, SparseLD) else sp.csc_matrix(corr)
    m = S.shape[0]
    lower = sp.tril(S).tocsc()
    lower.sort_indices()
    assert np.all(lower.diagonal() != 0), "diagonal must be nonzero"
    max_sizes = np.atleast_1d(np.asarray(max_size, dtype=np.int64))
    assert min_size >= 1 and np.all(max_sizes <= m)
    if pos_scaled is None:
        pos_scaled = np.zeros(m)
    pos_scaled = np.asarray(pos_scaled, dtype=np.float64)
    if max_cost is None:
        max_cost = m / 200
    max_cost = min(max_cost, 2 * float(lower.data @ lower.data))

    # native C++/OpenMP tables when available (chromosome-scale speed);
    # the numpy/jax fallback below is exact but interpreter-bound
    from bigsnpr_tpu import native

    suffix_tables = native.ldsplit_suffix(lower, thr_r2, max_r2)
    L = (None if suffix_tables is not None
         else _get_L(lower, thr_r2=thr_r2, max_r2=max_r2))
    prev_costs = np.full(max_K, np.inf)

    frames = []
    for one_max in np.sort(max_sizes):
        if suffix_tables is not None:
            c1row0, best = native.ldsplit_tables(
                suffix_tables, m, min_size, int(one_max), max_K, max_cost,
                pos_scaled)
        else:
            C1, best = _get_C(L, min_size, int(one_max), max_K, max_cost,
                              pos_scaled)
            c1row0 = C1[0]
        for K in range(1, max_K + 1):
            cost = c1row0[K - 1]
            if cost > max_cost or not (cost < prev_costs[K - 1]):
                continue
            prev_costs[K - 1] = cost
            all_last = []
            j, k = 0, K - 1
            while True:
                j = best[j, k]
                all_last.append(j)
                if k == 0:
                    break
                k -= 1
            all_last = np.asarray(all_last)
            assert len(all_last) == K
            all_size = np.diff(np.r_[0, all_last])
            assert np.all((all_size >= min_size) & (all_size <= one_max))
            frames.append({
                "max_size": int(one_max),
                "n_block": K,
                "cost": cost,
                "cost2": float((all_size.astype(float) ** 2).sum()),
                "perc_kept": _get_perc(lower, all_last - 1),
                "all_last": all_last,
                "all_size": all_size,
            })
    if not frames:
        return None
    return pd.DataFrame(frames)


def block_num(all_size) -> np.ndarray:
    """Per-variant block ids from block sizes (reference doc R/split-LD.R:90-91)."""
    return np.repeat(np.arange(1, len(all_size) + 1), all_size)
