"""Remaining small API-surface pieces of the reference NAMESPACE."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import pandas as pd
import scipy.sparse as sp

from bigsnpr_tpu.ops.corr import SparseLD


def sub_bed(bedfile, replacement: str = "", stop_if_not_ext: bool = True) -> str:
    """Replace the '.bed' extension (reference bigsnpr::sub_bed)."""
    s = str(bedfile)
    if s.endswith(".bed"):
        return s[:-4] + replacement
    if stop_if_not_ext:
        raise ValueError(f"Path '{s}' must have 'bed' extension.")
    return s + replacement


def as_SFBM(corr) -> SparseLD:
    """Convert a (scipy) sparse symmetric correlation matrix to the
    framework's SparseLD (the reference's SFBM analog)."""
    if isinstance(corr, SparseLD):
        return corr
    S = sp.csc_matrix(corr)
    return SparseLD(upper=sp.triu(S).tocsc())


def snp_getSampleInfos(pack, df_or_files, col_family_ID: int = 0,
                       col_sample_ID: int = 1, col_infos=None,
                       pair_sep: str = "-_-", **read_kw) -> pd.DataFrame:
    """Match external per-sample info to the pack's fam
    (reference snp_getSampleInfos, R/get-save-infos.R:26-86)."""
    if isinstance(df_or_files, pd.DataFrame):
        data = df_or_files
    else:
        files = ([df_or_files] if isinstance(df_or_files, (str, Path))
                 else list(df_or_files))
        read_kw.setdefault("sep", r"\s+")
        frames = [pd.read_csv(f, **read_kw) for f in files]
        data = pd.concat(frames, ignore_index=True)
    fam = pack.fam
    to_match = [f"{a}{pair_sep}{b}" for a, b in
                zip(fam["family.ID"], fam["sample.ID"])]
    from_match = [f"{a}{pair_sep}{b}" for a, b in
                  zip(data.iloc[:, col_family_ID], data.iloc[:, col_sample_ID])]
    lookup = {}
    for i, s in enumerate(from_match):
        lookup.setdefault(s, i)
    num = [lookup.get(s, -1) for s in to_match]
    n_miss = sum(i < 0 for i in num)
    if n_miss:
        import warnings

        warnings.warn(f"There are {n_miss} individuals which have not "
                      "been matched")
    if col_infos is None:
        cols = [c for k, c in enumerate(data.columns)
                if k not in (col_family_ID, col_sample_ID)]
    else:
        cols = data.columns[np.asarray(col_infos)]
    out = data.iloc[[i if i >= 0 else 0 for i in num]][cols].reset_index(drop=True)
    out[np.asarray(num) < 0] = np.nan
    return out


def snp_split(infos_chr, FUN, combine=None, ncores: int | None = None, **kw):
    """Per-chromosome split-apply, longest chromosome first
    (reference snp_split, R/apply-parallelize.R:35-57)."""
    infos_chr = np.asarray(infos_chr)
    chrs, inv = np.unique(infos_chr, return_inverse=True)
    ind_chrs = [np.nonzero(inv == k)[0] for k in range(len(chrs))]
    order = np.argsort([-len(ix) for ix in ind_chrs])

    def run(k):
        return FUN(ind_chr=ind_chrs[k], chr=chrs[k], **kw)

    if ncores and ncores > 1:
        with ThreadPoolExecutor(max_workers=ncores) as ex:
            res = list(ex.map(run, order))
    else:
        res = [run(k) for k in order]
    # reorder back
    res_ordered = [None] * len(chrs)
    for pos, k in enumerate(order):
        res_ordered[k] = res[pos]
    if combine is None:
        return res_ordered
    if combine == "c":
        return np.concatenate(res_ordered)
    if combine == "rbind":
        return pd.concat([pd.DataFrame(r) for r in res_ordered],
                         ignore_index=True)
    out = res_ordered[0]
    for r in res_ordered[1:]:
        out = combine(out, r)
    return out


def snp_pruning(*args, **kw):
    """Deprecated in the reference (R/clumping.R:143-155)."""
    raise RuntimeError("Pruning is deprecated; please use clumping "
                       "(on MAF) instead.")


def download_1000G(dir=None, overwrite=False):
    raise RuntimeError(
        "No network egress in this environment; place the 1000G phase-3 "
        "bed/bim/fam (reference R/bed-projectPCA.R:21-41) in `dir` "
        "manually and use read_bed().")


def download_genetic_map(type="hg19_OMNI", dir=None, ncores=1):
    raise RuntimeError(
        "No network egress in this environment; provide a genetic map "
        "DataFrame (pos, pos_cM) to snp_asGeneticPos() directly.")
