"""C+T polygenic risk scores.

Reference: snp_PRS (R/PRS.R:36-76): scores at decreasing p-value
thresholds built incrementally — each threshold adds its group's
contribution to the previous score; allele reversals handled by sign
flip + constant (prodVecRev, R/PRS.R:3-7). Winner's-curse correction
snp_thr_correct (R/PRS.R:112-136).
"""

from __future__ import annotations

import numpy as np
from scipy import stats as scipy_stats

from bigsnpr_tpu.ops.matvec import snp_prodVec
from bigsnpr_tpu.utils.assertions import check_args


def _prod_vec_rev(pack, betas, same, ind_keep):
    """X[:, keep] @ ((2*same-1)*betas) + 2*sum(betas[~same])
    (reference prodVecRev, R/PRS.R:3-7).

    Column-subsets the pack first (a cheap packed-row gather) so each
    threshold group touches only its own columns — the incremental C+T
    loop stays O(n*m) total across all thresholds. The subset is padded
    to power-of-two sizes (pad betas are zero, contributing nothing):
    grid-PRS calls this once per (cell, threshold) with ever-different
    group sizes, and an unpadded jit would recompile per size (measured
    hang: 28 cells x 50 thresholds = 1,400 XLA compiles)."""
    betas_mod = (2 * same.astype(np.float64) - 1) * betas
    ind_keep = np.asarray(ind_keep)
    k = len(ind_keep)
    kp = max(64, 1 << (k - 1).bit_length())
    if kp > k:
        ind_keep = np.concatenate([ind_keep, np.full(kp - k, ind_keep[0])])
        betas_mod = np.concatenate([betas_mod, np.zeros(kp - k)])
    sub = pack.subset(ind_col=ind_keep)
    score = np.asarray(snp_prodVec(sub, betas_mod), dtype=np.float64)
    return score + 2 * betas[~same].sum()


@check_args()
def snp_PRS(pack, betas_keep, ind_test=None, ind_keep=None, same_keep=None,
            lpS_keep=None, thr_list=0):
    """Returns (len(ind_test), len(thr_list)) score matrix."""
    sub = pack if ind_test is None else pack.subset(ind_row=np.asarray(ind_test))
    if ind_keep is None:
        ind_keep = np.arange(sub.m)
    ind_keep = np.asarray(ind_keep)
    betas_keep = np.asarray(betas_keep, dtype=np.float64)
    assert len(betas_keep) == len(ind_keep)
    if same_keep is None:
        same_keep = np.ones(len(ind_keep), dtype=bool)
    same_keep = np.asarray(same_keep, dtype=bool)

    thr_arr = np.atleast_1d(np.asarray(thr_list, dtype=np.float64))
    if lpS_keep is None or (np.isscalar(thr_list) and thr_list == 0):
        print("'lpS_keep' or 'thr_list' was not specified. Thresholding disabled.")
        return _prod_vec_rev(sub, betas_keep, same_keep, ind_keep)[:, None]

    lpS_keep = np.asarray(lpS_keep, dtype=np.float64)
    assert np.all(lpS_keep >= 0)

    # ONE GEMM for all thresholds: column i scores the betas passing
    # thr_arr[i] (column j of the kept subset contributes
    # betas_mod[j] * [lpS[j] > thr_i]) plus the reversal constant.
    # The reference's incremental per-threshold loop (R/PRS.R:57-71)
    # becomes a (n, k) x (k, n_thr) product — grid-PRS over 28 cells x
    # 50 thresholds was 1,400 separate dispatches/compiles before.
    betas_mod = (2 * same_keep.astype(np.float64) - 1) * betas_keep
    mask = lpS_keep[:, None] > thr_arr[None, :]          # (k, n_thr)
    # fold the kept set into a full-width (m, n_thr) B and run ONE
    # fused decode+GEMM against the pack's (cached) device copy —
    # subsetting the pack per call repacked AND re-uploaded GBs per
    # grid cell through the ~20 MB/s tunnel, and 28 live device
    # subsets OOMed HBM at biobank n (round-5 SCT run)
    B = np.zeros((sub.m, len(thr_arr)))
    B[np.asarray(ind_keep)] = betas_mod[:, None] * mask
    scores = np.asarray(snp_prodVec(sub, B), dtype=np.float64)
    consts = 2.0 * (((~same_keep) * betas_keep) @ mask)
    return scores + consts[None, :]


def snp_thr_correct(beta, beta_se=None, lpS=None, thr_lpS=0.0):
    """Winner's-curse bias reduction (Zhong & Prentice 2008),
    reference snp_thr_correct (R/PRS.R:112-136)."""
    beta = np.asarray(beta, dtype=np.float64)
    if thr_lpS < 0:
        raise ValueError("'thr_lpS' must be positive (or 0).")
    if thr_lpS == 0:
        return beta.copy()

    if beta_se is not None:
        z = np.abs(beta / np.asarray(beta_se, dtype=np.float64))
    elif lpS is not None:
        lpS = np.asarray(lpS, dtype=np.float64)
        z = np.sqrt(scipy_stats.chi2.isf(
            np.exp(np.minimum(-lpS / np.log10(np.e), 0)), df=1))
    else:
        raise ValueError("'beta_se' and 'lpS' cannot be both missing.")

    thr_Z = np.sqrt(scipy_stats.chi2.isf(10.0**-thr_lpS, df=1))
    Z = np.linspace(0, 10 * z.max(), 1_000_000)
    Z2 = Z + (scipy_stats.norm.pdf(Z - thr_Z) - scipy_stats.norm.pdf(-Z - thr_Z)) / (
        scipy_stats.norm.cdf(Z - thr_Z) + scipy_stats.norm.cdf(-Z - thr_Z))
    # nearest-neighbor inversion of the shrinkage map (reference uses knn)
    idx = np.searchsorted(Z2, z)
    idx = np.clip(idx, 1, len(Z) - 1)
    left_closer = np.abs(Z2[idx - 1] - z) <= np.abs(Z2[idx] - z)
    new_z = Z[np.where(left_closer, idx - 1, idx)]

    with np.errstate(invalid="ignore", divide="ignore"):
        shrink = np.minimum(new_z / z, 1.0)
    return np.where(z >= thr_Z, beta * shrink, 0.0)
