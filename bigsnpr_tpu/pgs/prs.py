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
    loop stays O(n*m) total across all thresholds."""
    betas_mod = (2 * same.astype(np.float64) - 1) * betas
    sub = pack.subset(ind_col=np.asarray(ind_keep))
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

    scores = np.empty((sub.n, len(thr_arr)))
    ind_rem = np.arange(len(ind_keep))
    last = np.zeros(sub.n)
    for i in np.argsort(-thr_arr, kind="stable"):
        pass_thr = lpS_keep[ind_rem] > thr_arr[i]
        ind = ind_rem[pass_thr]
        if len(ind):
            last = last + _prod_vec_rev(sub, betas_keep[ind], same_keep[ind],
                                        ind_keep[ind])
        scores[:, i] = last
        ind_rem = ind_rem[~pass_thr]
    return scores


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
