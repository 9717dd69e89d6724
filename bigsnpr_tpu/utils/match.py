"""Allele matching between summary statistics and variant info.

Reference: snp_match / same_ref (R/match-alleles.R:50-200): join by
(chr, pos|rsid, a0, a1) after augmenting with strand flips (A<->T, C<->G;
ambiguous pairs removed) and allele reversals (beta -> -beta); duplicate
removal; min-match guard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_FLIP = {"A": "T", "T": "A", "C": "G", "G": "C"}
_AMBIGUOUS = {("A", "T"), ("T", "A"), ("C", "G"), ("G", "C")}


def flip_strand(alleles):
    return pd.Series(alleles).map(_FLIP)


def snp_match(sumstats: pd.DataFrame, info_snp: pd.DataFrame,
              strand_flip: bool = True, join_by_pos: bool = True,
              remove_dups: bool = True, match_min_prop: float = 0.2,
              return_flip_and_rev: bool = False, verbose: bool = True) -> pd.DataFrame:
    """Returns matched frame with beta sign-corrected, plus `_NUM_ID_.ss`
    (row in sumstats) and `_NUM_ID_` (row in info_snp), both 1-based as in
    the reference."""
    sumstats = pd.DataFrame(sumstats).copy()
    info_snp = pd.DataFrame(info_snp).copy()
    sumstats["_NUM_ID_"] = np.arange(1, len(sumstats) + 1)
    info_snp["_NUM_ID_"] = np.arange(1, len(info_snp) + 1)
    min_match = match_min_prop * min(len(sumstats), len(info_snp))

    key2 = "pos" if join_by_pos else "rsid"
    join_by = ["chr", key2, "a0", "a1"]
    missing = [c for c in join_by + ["beta"] if c not in sumstats.columns]
    if missing:
        raise ValueError(f"sumstats must have columns {join_by + ['beta']}")
    missing = [c for c in set(join_by + ["pos"]) if c not in info_snp.columns]
    if missing:
        raise ValueError(f"info_snp must have columns {join_by + ['pos']}")

    if verbose:
        print(f"{len(sumstats):,} variants to be matched.")

    # pre-filter on (chr, pos|rsid)
    keys_info = set(zip(info_snp["chr"], info_snp[key2]))
    pre = [k in keys_info for k in zip(sumstats["chr"], sumstats[key2])]
    sumstats = sumstats[np.asarray(pre)]
    if len(sumstats) == 0:
        raise ValueError("No variant has been matched.")

    if strand_flip:
        amb = [
            (a0, a1) in _AMBIGUOUS
            for a0, a1 in zip(sumstats["a0"], sumstats["a1"])
        ]
        amb = np.asarray(amb)
        if verbose:
            print(f"{amb.sum():,} ambiguous SNPs have been removed.")
        s2 = sumstats[~amb].copy()
        s2["_FLIP_"] = False
        s3 = s2.copy()
        s3["_FLIP_"] = True
        s3["a0"] = flip_strand(s2["a0"].to_numpy()).to_numpy()
        s3["a1"] = flip_strand(s2["a1"].to_numpy()).to_numpy()
        s3 = pd.concat([s2, s3], ignore_index=True)
    else:
        s3 = sumstats.copy()
        s3["_FLIP_"] = False

    s4 = s3.copy()
    s3 = s3.copy()
    s3["_REV_"] = False
    s4["_REV_"] = True
    s4[["a0", "a1"]] = s3[["a1", "a0"]].to_numpy()
    s4["beta"] = -s3["beta"].to_numpy()
    s4 = pd.concat([s3, s4], ignore_index=True)

    matched = s4.merge(info_snp, on=join_by, how="inner",
                       suffixes=(".ss", ""))

    if remove_dups:
        dup = matched.duplicated(subset=["chr", "pos"], keep=False)
        if dup.any():
            matched = matched[~dup]
            if verbose:
                print("Some duplicates were removed.")

    if verbose:
        print(f"{len(matched):,} variants have been matched; "
              f"{int(matched['_FLIP_'].sum()):,} were flipped and "
              f"{int(matched['_REV_'].sum()):,} were reversed.")
    if len(matched) < min_match:
        raise ValueError("Not enough variants have been matched.")

    if not return_flip_and_rev:
        matched = matched.drop(columns=["_FLIP_", "_REV_"])
    return matched.sort_values(["chr", "pos"]).reset_index(drop=True)


def same_ref(ref1, alt1, ref2, alt2):
    """Whether reference alleles are the same, strand-flip-aware
    (reference same_ref, R/match-alleles.R:156-200). Returns float array
    with NaN for ambiguous/invalid."""
    rev = _FLIP

    def decide(r1, a1, r2, a2):
        vals = (r1, a1, r2, a2)
        if any(v not in "ACTG" for v in map(str, vals)):
            return np.nan
        if r1 == a1 or r2 == a2:
            return np.nan
        # priority order of the reference's case_when (R/match-alleles.R:162-175)
        if (r1 == r2) and (a1 == a2):
            return 1.0
        if (r1 == a2) and (a1 == r2):
            return 0.0
        if (rev[r1] == r2) and (rev[a1] == a2):
            return 1.0
        if (rev[r1] == a2) and (rev[a1] == r2):
            return 0.0
        return np.nan

    out = [decide(str(r1), str(a1), str(r2), str(a2))
           for r1, a1, r2, a2 in zip(ref1, alt1, ref2, alt2)]
    return np.asarray(out, dtype=np.float64)


def snp_asGeneticPos(infos_chr, infos_pos, genetic_map: pd.DataFrame | None = None,
                     rsid=None, method: str = "nn") -> np.ndarray:
    """Interpolate genetic positions (cM) from a genetic map.

    Reference: snp_asGeneticPos (R/modify-positions.R:115-160): nearest-
    neighbor position lookup by default; when `rsid` is provided, exact
    rsid matches take the map value and the rest are interpolated with a
    monotone (Hyman) spline — we use PCHIP, also monotone. method="linear"
    gives snp_asGeneticPos2 semantics (R/modify-positions.R:246-267).

    genetic_map: DataFrame with columns pos, pos_cM (+ optional chr, rsid).
    Without a map, returns pos / 1e6 (1 cM/Mb approximation).
    """
    infos_chr = np.asarray(infos_chr)
    infos_pos = np.asarray(infos_pos, dtype=np.float64)
    if genetic_map is None:
        return infos_pos / 1e6
    out = np.empty(len(infos_pos))
    gm_chr = (np.asarray(genetic_map["chr"]) if "chr" in genetic_map
              else np.ones(len(genetic_map)))
    for chrom in np.unique(infos_chr):
        sel = infos_chr == chrom
        gsel = gm_chr == chrom
        xp = np.asarray(genetic_map["pos"], dtype=np.float64)[gsel]
        fp = np.asarray(genetic_map["pos_cM"], dtype=np.float64)[gsel]
        ord_ = np.argsort(xp)
        xp, fp = xp[ord_], fp[ord_]
        q = infos_pos[sel]
        if rsid is not None and "rsid" in genetic_map:
            pos_cm = np.full(sel.sum(), np.nan)
            map_rsid = pd.Series(np.asarray(genetic_map["rsid"])[gsel][ord_])
            lookup = dict(zip(map_rsid, fp))
            qr = np.asarray(rsid)[sel]
            for i, rs in enumerate(qr):
                if rs in lookup:
                    pos_cm[i] = lookup[rs]
            todo = np.isnan(pos_cm)
            if todo.any():
                from scipy.interpolate import PchipInterpolator

                uniq, iu = np.unique(xp, return_index=True)
                spl = PchipInterpolator(uniq, fp[iu], extrapolate=True)
                pos_cm[todo] = spl(q[todo])
            out[sel] = pos_cm
        elif method == "nn":
            idx = np.searchsorted(xp, q)
            idx = np.clip(idx, 1, len(xp) - 1)
            left_closer = np.abs(xp[idx - 1] - q) <= np.abs(xp[idx] - q)
            out[sel] = fp[np.where(left_closer, idx - 1, idx)]
        else:
            out[sel] = np.interp(q, xp, fp)
    return out


def snp_asGeneticPos2(infos_chr, infos_pos, genetic_map=None):
    """Linear-interpolation variant (reference snp_asGeneticPos2,
    R/modify-positions.R:246-267)."""
    return snp_asGeneticPos(infos_chr, infos_pos, genetic_map,
                            method="linear")
