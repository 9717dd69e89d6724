"""Genotype imputation.

Reference: snp_fastImputeSimple (src/impute-simple.cpp:11-75): per-column
mode / rounded-mean / binomial-sample fill of missing hard calls; and
snp_fastImpute (R/impute.R:29-160): per-SNP local model on correlated
neighbors with a validation-error estimate and resumable progress.

TPU re-design: simple modes are masked reductions + a repack; the
model-based imputation replaces the reference's XGBoost trees (not
TPU-native, and xgboost is not in this environment) with a per-SNP ridge
regression on the same correlation-selected neighbor set — batched on
device. A `info` array (2, m) mirrors the reference's resumable
infos FBM (NA-rate, validation error).
"""

from __future__ import annotations

import numpy as np

from bigsnpr_tpu.core import unpack
from bigsnpr_tpu.core.genotypes import GenoPack
from bigsnpr_tpu.ops.corr import snp_cor
from bigsnpr_tpu.ops.stats import snp_counts


def snp_fastImputeSimple(pack: GenoPack, method: str = "mode",
                         seed: int | None = None) -> GenoPack:
    """method in {mode, mean0, random}. Returns a new GenoPack with missing
    values filled (the reference rewrites bytes into an imputed code range;
    our 2-bit format stores the imputed hard call directly).

    NOTE: the reference's "mean2" (2-decimal dosages) needs byte codes and
    is provided by snp_fastImputeSimple_dosage (returns float dosages).
    """
    if method == "mean2":
        return snp_fastImputeSimple_mean2(pack)
    codes = unpack.np_unpack_codes(np.asarray(pack.packed), pack.n)
    counts = snp_counts(pack)
    c0, c1, c2, cna = (counts[k].astype(np.int64) for k in range(4))
    c = np.maximum(c0 + c1 + c2, 1)

    if method == "mode":
        # reference order: start 0; 1 if c1>c0; 2 if c2>max-so-far
        imput = np.zeros(pack.m, dtype=np.int64)
        imput[c1 > c0] = 1
        imput = np.where((imput == 0) & (c2 > c0), 2, imput)
        imput = np.where((imput == 1) & (c2 > c1), 2, imput)
    elif method == "mean0":
        imput = np.rint((c1 + 2.0 * c2) / c).astype(np.int64)
    elif method == "random":
        rng = np.random.default_rng(seed)
        af = (0.5 * c1 + c2) / c
        # per-entry draws below
        imput = None
    else:
        raise ValueError("method should be 'mode', 'mean0' or 'random'.")

    na = codes == 1
    if method == "random":
        rng = np.random.default_rng(seed)
        draws = rng.binomial(2, np.broadcast_to(((0.5 * c1 + c2) / c)[:, None],
                                                codes.shape))
        fill_codes = unpack.np_dosage_to_codes(draws.astype(float))
        new_codes = np.where(na, fill_codes, codes)
    else:
        fill = unpack.np_dosage_to_codes(
            np.broadcast_to(imput[:, None], codes.shape).astype(float))
        new_codes = np.where(na, fill, codes)
    return GenoPack(packed=unpack.np_pack_codes(new_codes), n=pack.n,
                    fam=pack.fam, map=pack.map)


def snp_fastImputeSimple_dosage(pack: GenoPack) -> np.ndarray:
    """'mean2' mode: (n, m) float dosages with NA filled by the column mean
    rounded to 2 decimals (reference method 3, src/impute-simple.cpp:62-64)."""
    X = pack.to_dosage()
    counts = snp_counts(pack)
    c = np.maximum(counts[:3].sum(0), 1)
    mean2 = np.round((counts[1] + 2.0 * counts[2]) / c, 2)
    na = np.isnan(X)
    return np.where(na, mean2[None, :], X)


def snp_fastImputeSimple_mean2(pack: GenoPack):
    """'mean2' as a DosagePack (byte codes; hard calls stay exact, NA
    becomes the 2-decimal mean dosage code — the reference's +7-offset
    imputed code range, src/impute-simple.cpp:62-64)."""
    from bigsnpr_tpu.core.dosage import DosagePack

    codes = unpack.np_unpack_codes(np.asarray(pack.packed), pack.n)
    counts = snp_counts(pack)
    c = np.maximum(counts[:3].sum(0), 1)
    mean2 = np.round((counts[1] + 2.0 * counts[2]) / c, 2)
    # CODE_DOSAGE: hard calls at 0..2; dosage codes 7..207 map (code-7)/100
    dose_codes = (7 + np.round(100 * mean2)).astype(np.uint8)
    out = np.empty_like(codes)
    # map 2-bit codes to byte codes 0/1/2 and 3 (missing)
    lut = np.array([2, 3, 1, 0], dtype=np.uint8)  # bed code -> CODE_DOSAGE idx
    out = lut[codes]
    na = codes == 1
    out = np.where(na, dose_codes[:, None], out)
    return DosagePack(codes=out, n=pack.n, fam=pack.fam, map=pack.map)


def snp_fastImpute(pack: GenoPack, infos_chr=None, alpha: float = 1e-4,
                   size: int = 200, p_train: float = 0.8,
                   n_cor: int | None = None, seed: int | None = None,
                   info: np.ndarray | None = None,
                   ridge: float = 1e-3):
    """Model-based imputation: per-SNP regression on correlated neighbors.

    Returns (imputed GenoPack, info (2, m): [NA rate, validation error]).
    `info` can be passed back in to resume (reference's resumable infos FBM,
    R/impute.R:13-25).
    """
    rng = np.random.default_rng(seed)
    n, m = pack.n, pack.m
    if infos_chr is None:
        infos_chr = (pack.map["chromosome"].to_numpy()
                     if pack.map is not None else np.ones(m, dtype=int))
    infos_chr = np.asarray(infos_chr)
    if n_cor is None:
        n_cor = min(n, 5000)
    if info is None:
        info = np.full((2, m), np.nan)

    codes = unpack.np_unpack_codes(np.asarray(pack.packed), pack.n)
    X = pack.to_dosage()  # (n, m) with NaN
    new_codes = codes.copy()

    for chrom in np.unique(infos_chr):
        ind_chr = np.nonzero(infos_chr == chrom)[0]
        if not np.isnan(info[0, ind_chr]).any():
            continue
        ind_rows_cor = np.sort(rng.choice(n, size=n_cor, replace=False))
        corr = snp_cor(pack, ind_row=ind_rows_cor, ind_col=ind_chr,
                       size=size, alpha=alpha, fill_diag=False)
        csc = corr.sym().tocsc()

        for i, snp in enumerate(ind_chr):
            if not np.isnan(info[0, snp]):
                continue
            x = X[:, snp]
            ind_na = np.nonzero(np.isnan(x))[0]
            nbna = len(ind_na)
            if nbna > 0:
                neigh_local = csc.indices[csc.indptr[i]:csc.indptr[i + 1]]
                ind_col = ind_chr[neigh_local]
                if len(ind_col) < 5:
                    lo, hi = max(0, i - size), min(len(ind_chr), i + size + 1)
                    ind_col = np.setdiff1d(ind_chr[lo:hi], [snp])
                ind_nona = np.nonzero(~np.isnan(x))[0]
                ntr = int(p_train * len(ind_nona))
                perm = rng.permutation(len(ind_nona))
                ind_train = np.sort(ind_nona[perm[:ntr]])
                ind_val = np.sort(ind_nona[perm[ntr:]])

                # features: neighbor dosages, mean-imputed
                F = X[:, ind_col]
                col_mean = np.nanmean(F, axis=0)
                col_mean = np.nan_to_num(col_mean)
                F = np.where(np.isnan(F), col_mean[None, :], F)
                A = np.column_stack([np.ones(len(F)), F])

                At = A[ind_train]
                yt = x[ind_train]
                G = At.T @ At + ridge * len(ind_train) * np.eye(A.shape[1])
                w = np.linalg.solve(G, At.T @ yt)

                if len(ind_val):
                    pred_val = np.clip(A[ind_val] @ w, 0, 2)
                    info[1, snp] = np.mean(np.rint(pred_val) != x[ind_val])
                pred = np.clip(A[ind_na] @ w, 0, 2)
                filled = np.rint(pred)
                new_codes[snp, ind_na] = unpack.np_dosage_to_codes(
                    filled[None, :])[0]
            info[0, snp] = nbna / n

    out = GenoPack(packed=unpack.np_pack_codes(new_codes), n=pack.n,
                   fam=pack.fam, map=pack.map)
    return out, info
