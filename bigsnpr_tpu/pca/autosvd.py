"""autoSVD: truncated SVD with iterative long-range-LD removal.

Reference: snp_autoSVD / bed_autoSVD (R/autoSVD.R:67-186, 226-339):
MAF/MAC filter -> initial clumping -> loop { randomSVD -> robust outlier
statistic sqrt(dist_ogk(V)) -> per-chromosome rolling-mean smoothing ->
medcouple-adjusted Tukey threshold -> drop outliers, record contiguous
intervals as LRLD regions } until convergence or max_iter.
"""

from __future__ import annotations

import numpy as np
from bigsnpr_tpu.utils.assertions import check_args
import pandas as pd

from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD, BigSVD
from bigsnpr_tpu.ops.clumping import snp_clumping
from bigsnpr_tpu.ops.stats import bed_MAF, bed_scaleBinom
from bigsnpr_tpu.pca.robust import dist_ogk, rollmean, tukey_mc_up


def get_intervals(x: np.ndarray, n: int = 2) -> np.ndarray:
    """Regroup consecutive integers into [start, stop] intervals with at
    least n members (reference getIntervals, R/autoSVD.R:4-12)."""
    x = np.asarray(x)
    if len(x) == 0:
        return np.empty((0, 2), dtype=x.dtype)
    breaks = np.nonzero(np.diff(x) != 1)[0]
    starts = np.r_[0, breaks + 1]
    stops = np.r_[breaks, len(x) - 1]
    keep = (stops - starts + 1) >= n
    return np.stack([x[starts[keep]], x[stops[keep]]], axis=1)


@check_args()
def snp_autoSVD(
    pack,
    infos_chr=None,
    infos_pos=None,
    ind_row=None,
    ind_col=None,
    fun_scaling=bed_scaleBinom,
    thr_r2: float | None = 0.2,
    size: float | None = None,
    k: int = 10,
    roll_size: int = 50,
    int_min_size: int = 20,
    alpha_tukey: float = 0.05,
    min_mac: int = 10,
    min_maf: float = 0.02,
    max_iter: int = 5,
    verbose: bool = False,
    svd_kwargs: dict | None = None,
    timer=None,
) -> BigSVD:
    """Reference snp_autoSVD (R/autoSVD.R:67-186).

    timer: an optional utils.profiling.StageTimer accumulating per-stage
    wall times (maf / clumping / svd / outliers); also attached to the
    result as .stage_times."""
    from bigsnpr_tpu.utils.profiling import StageTimer

    if timer is None:
        timer = StageTimer()
    m_all = pack.m
    if infos_chr is None:
        infos_chr = (pack.map["chromosome"].to_numpy()
                     if pack.map is not None else np.ones(m_all, dtype=int))
    infos_chr = np.asarray(infos_chr)
    if infos_pos is not None:
        infos_pos = np.asarray(infos_pos)
    if ind_col is None:
        ind_col = np.arange(m_all)
    else:
        ind_col = np.asarray(ind_col)
    if size is None:
        size = 100 / thr_r2 if thr_r2 and not np.isnan(thr_r2) else 500

    def log(msg):
        if verbose:
            print(msg)

    # MAF/MAC filter (reference R/autoSVD.R:96-105 / :250-259)
    if not (min_mac > 0 and min_maf > 0):
        raise ValueError("set min_mac > 0 and min_maf > 0 "
                         "(cannot use variants with no variation)")
    with timer.stage("maf"):
        info = bed_MAF(pack, ind_row=ind_row)
    info = info.iloc[ind_col]
    maf_nok = (info["mac"].to_numpy() < min_mac) | (info["maf"].to_numpy() < min_maf)
    log(f"Discarding {maf_nok.sum()} variants with MAC < {min_mac} or MAF < {min_maf}.")
    ind_keep = ind_col[~maf_nok]

    # initial clumping on MAF (reference R/autoSVD.R:107-120)
    if thr_r2 is not None and not np.isnan(thr_r2):
        log(f"Clumping (on MAF) at r^2 > {thr_r2}..")
        exclude = np.setdiff1d(np.arange(m_all), ind_keep)
        with timer.stage("clumping"):
            ind_keep = snp_clumping(
                pack, infos_chr=infos_chr, ind_row=ind_row, thr_r2=thr_r2,
                size=size, infos_pos=infos_pos, exclude=exclude)
        log(f"keep {len(ind_keep)} variants.")

    lrldr_rows = []
    it = 0
    while True:
        it += 1
        log(f"Iteration {it}: computing SVD..")
        with timer.stage("svd"):
            obj_svd = snp_randomSVD(pack, fun_scaling=fun_scaling,
                                    ind_row=ind_row, ind_col=ind_keep, k=k,
                                    **(svd_kwargs or {}))
        if it > max_iter:
            log("Maximum number of iterations reached.")
            break

        # outlier variants (reference R/autoSVD.R:142-151)
        with timer.stage("outliers"):
            S_col = np.sqrt(dist_ogk(obj_svd.v))
            S2_col = np.empty_like(S_col)
            for chrom in np.unique(infos_chr[ind_keep]):
                ind = np.nonzero(infos_chr[ind_keep] == chrom)[0]
                S2_col[ind] = rollmean(S_col[ind], roll_size)
            thr = tukey_mc_up(S2_col, alpha=alpha_tukey)
            ind_excl = np.nonzero(S2_col > thr)[0]
        log(f"{len(ind_excl)} outlier variants detected..")

        if len(ind_excl) == 0:
            log("Converged!")
            break

        if infos_pos is not None:
            for start, stop in get_intervals(ind_excl, n=int_min_size):
                seq_range = np.arange(start, stop + 1)
                chrs = infos_chr[ind_keep[seq_range]]
                vals, cnt = np.unique(chrs, return_counts=True)
                mode_chr = vals[np.argmax(cnt)]
                in_chr = chrs == mode_chr
                rng = infos_pos[ind_keep[seq_range[in_chr]]]
                lrldr_rows.append((mode_chr, rng.min(), rng.max(), it))
        ind_keep = np.delete(ind_keep, ind_excl)

    obj_svd.subset = ind_keep
    obj_svd.stage_times = timer.times
    obj_svd.lrldr = pd.DataFrame(
        lrldr_rows, columns=["Chr", "Start", "Stop", "Iter"]
    ).sort_values(["Chr", "Start", "Stop"]).reset_index(drop=True)
    return obj_svd


def bed_autoSVD(pack, **kw) -> BigSVD:
    """Reference bed_autoSVD (R/autoSVD.R:226-339); same engine here."""
    return snp_autoSVD(pack, **kw)
