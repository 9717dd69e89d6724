"""Stacked Clumping + Thresholding (SCT).

Reference: snp_grid_clumping / snp_grid_PRS / snp_grid_stacking
(R/SCT.R:32-304). TPU re-design of the grid clumping: instead of the
reference's memoized per-pair r^2 cache shared across the 28 (size x thr)
cells (src/clumping-cached.cpp), we compute the banded r^2 ONCE per
chromosome at the widest window and re-run the cheap conflict-graph fixed
point per grid cell — every cell reuses the same device GEMM output.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from bigsnpr_tpu.ops.corr import _iter_band_blocks, _pair_r, _window_geometry
from bigsnpr_tpu.ops.clumping import _greedy_fixed_point
from bigsnpr_tpu.ops.matvec import snp_prodVec
from bigsnpr_tpu.pgs.prs import snp_PRS
from bigsnpr_tpu.pgs.lassosum2 import seq_log
from bigsnpr_tpu.linalg.penalized import big_spReg


def _chrom_key(c):
    """Canonical all_keep key: int when the label parses as one,
    otherwise the string ('X', 'MT', ...)."""
    try:
        return int(c)
    except (TypeError, ValueError):
        return str(c)


def _banded_r2(sub, pos, max_size, block=512, thr_r2_floor=0.0):
    """All window pairs (i < j, |pos_i - pos_j| <= max_size) with their
    r^2 (> thr_r2_floor when given — pairs below the smallest grid
    threshold are used by no cell)."""
    import jax

    n, m = sub.n, sub.m
    left_start = _window_geometry(pos, max_size)
    if not hasattr(sub, "code256") and jax.default_backend() == "tpu":
        # device-compacted pairs: only kept edges cross the host link,
        # and wide SCT windows (base_size/thr.r2 spans a chromosome)
        # stay HBM-bounded via band chunking — the host-finalize path
        # below ships six dense f64 sum planes per block, which at
        # biobank n is both tunnel-bound and an HBM OOM
        from bigsnpr_tpu.ops.corr import (_iter_kept_pairs_device,
                                          cor_thresholds)

        THR = cor_thresholds(n, 1.0)            # alpha=1: keep-all
        ei, ej, r2 = [], [], []
        for jj, ii, vals in _iter_kept_pairs_device(
                sub.packed, n, m, left_start,
                THR, float(np.sqrt(thr_r2_floor)), block, pack=sub):
            ok = np.isfinite(vals)
            v2 = vals.astype(np.float64) ** 2
            keep = ok & (v2 > thr_r2_floor)
            if keep.any():
                ej.append(jj[keep])
                ei.append(ii[keep])
                r2.append(v2[keep])
        if not ei:
            z = np.array([], dtype=np.int64)
            return z, z, np.array([])
        return np.concatenate(ei), np.concatenate(ej), np.concatenate(r2)
    ei, ej, r2 = [], [], []
    for t0, t1, b0, sums in _iter_band_blocks(sub.packed, n, m, left_start,
                                              block, pack=sub):
        r, _ = _pair_r(sums)
        jj0 = np.arange(t0, t1)[:, None]
        jj = np.arange(b0, t1)[None, :]
        in_window = (jj < jj0) & (jj >= left_start[jj0])
        a, b = np.nonzero(in_window)
        if a.size:
            ej.append(jj0[a, 0])
            ei.append(jj[0, b])
            with np.errstate(invalid="ignore"):
                r2.append((r * r)[a, b])
    if not ei:
        z = np.array([], dtype=np.int64)
        return z, z, np.array([])
    return np.concatenate(ei), np.concatenate(ej), np.concatenate(r2)


def snp_grid_clumping(
    pack, infos_chr, infos_pos, lpS,
    ind_row=None,
    grid_thr_r2=(0.01, 0.05, 0.1, 0.2, 0.5, 0.8, 0.95),
    grid_base_size=(50, 100, 200, 500),
    infos_imp=None, grid_thr_imp=(1,),
    groups=None, exclude=None, block=512,
):
    """Grid of clumpings (reference snp_grid_clumping, R/SCT.R:32-151).

    Returns (all_keep: {chr: [kept index arrays, grid-ordered]}, grid df).
    """
    m_all = pack.m
    infos_chr = np.asarray(infos_chr)
    infos_pos = np.asarray(infos_pos, dtype=np.float64)
    lpS = np.asarray(lpS, dtype=np.float64)
    infos_imp = (np.ones(m_all) if infos_imp is None
                 else np.asarray(infos_imp, dtype=np.float64))
    groups = [np.arange(m_all)] if groups is None else [np.asarray(g) for g in groups]

    THR_IMP = np.sort(np.unique(grid_thr_imp))
    THR_CLMP = np.sort(np.unique(grid_thr_r2))
    BASE_SIZE = np.sort(np.unique(grid_base_size))

    # grid rows: size fastest, then thr.r2, then group, then thr.imp
    rows = []
    for thr_imp in THR_IMP:
        for g in range(len(groups)):
            for thr in THR_CLMP:
                for base in BASE_SIZE:
                    rows.append((int(base / thr), thr, g + 1, thr_imp))
    grid = pd.DataFrame(rows, columns=["size", "thr.r2", "grp.num", "thr.imp"])

    ind_noexcl = np.arange(m_all)
    if exclude is not None:
        ind_noexcl = np.setdiff1d(ind_noexcl, np.asarray(exclude))

    max_size = 1000.0 * BASE_SIZE.max() / THR_CLMP.min()

    all_keep = {}
    for chrom in np.unique(infos_chr[ind_noexcl]):
        ind_chr0 = ind_noexcl[infos_chr[ind_noexcl] == chrom]
        keep_list = []
        sub0 = pack.subset(ind_row=ind_row, ind_col=ind_chr0)
        pos0 = infos_pos[ind_chr0]
        assert np.all(np.diff(pos0) >= 0), "positions must be sorted"
        # one banded r^2 at the widest window for the whole grid
        ei0, ej0, r20 = _banded_r2(sub0, pos0, max_size, block=block,
                                   thr_r2_floor=float(THR_CLMP.min()))

        for thr_imp in THR_IMP:
            sel_imp = infos_imp[ind_chr0] >= thr_imp
            for group in groups:
                in_grp = sel_imp & np.isin(ind_chr0, group)
                idx = np.nonzero(in_grp)[0]       # local indices in chr
                if len(idx) == 0:
                    for thr in THR_CLMP:
                        for base in BASE_SIZE:
                            keep_list.append(np.array([], dtype=np.int64))
                    continue
                remap = np.full(len(ind_chr0), -1, dtype=np.int64)
                remap[idx] = np.arange(len(idx))
                emask = in_grp[ei0] & in_grp[ej0]
                ei, ej, r2 = remap[ei0[emask]], remap[ej0[emask]], r20[emask]
                pos_g = pos0[idx]
                S_g = lpS[ind_chr0[idx]]
                ord_ = np.argsort(-S_g, kind="stable")
                rank = np.empty(len(idx), dtype=np.int64)
                rank[ord_] = np.arange(len(idx))
                dist = np.abs(pos_g[ej] - pos_g[ei])

                for thr in THR_CLMP:
                    for base in BASE_SIZE:
                        size_bp = 1000.0 * base / thr
                        sel = (dist <= size_bp) & (r2 > thr)
                        keep = _greedy_fixed_point(
                            len(idx), rank, ei[sel], ej[sel])
                        keep_list.append(ind_chr0[idx[keep]])
        all_keep[_chrom_key(chrom)] = keep_list
    return all_keep, grid


@dataclass
class GridPRS:
    """C+T scores for the whole grid (the reference's multi_PRS FBM +
    attributes, R/SCT.R:236-245). `scores` may be an on-disk float32
    memmap (see snp_grid_PRS backingfile=) — the FBM analog: biobank
    n x thousands of grid cells never has to fit in RAM."""

    scores: np.ndarray          # (n, n_keep_sets * n_thr)
    lpS: np.ndarray
    grid_lpS_thr: np.ndarray
    betas: np.ndarray
    all_keep: dict
    backingfile: str | None = None

    def save(self, path) -> str:
        """Persist metadata next to the backing store so a later session
        can re-attach (reference saves the RDS immediately after filling
        the FBM, R/SCT.R:244). Returns the metadata path."""
        path = str(path)
        if not path.endswith(".meta.npz"):
            path = path + ".meta.npz"
        chroms = sorted(self.all_keep)
        keep_flat = [k for c in chroms for k in self.all_keep[c]]
        np.savez_compressed(
            path,
            lpS=self.lpS, grid_lpS_thr=self.grid_lpS_thr, betas=self.betas,
            chroms=np.asarray(chroms),
            keep_counts=np.asarray([len(self.all_keep[c]) for c in chroms]),
            keep_lens=np.asarray([len(k) for k in keep_flat]),
            keep_cat=(np.concatenate(keep_flat) if keep_flat
                      else np.array([], dtype=np.int64)),
            backingfile=np.asarray(self.backingfile or ""),
            scores_inline=(self.scores if self.backingfile is None
                           else np.array([])),
        )
        if self.backingfile is not None and hasattr(self.scores, "flush"):
            self.scores.flush()
        return path

    @classmethod
    def load(cls, path, writable: bool = False) -> "GridPRS":
        path = str(path)
        if not path.endswith(".meta.npz"):
            path = path + ".meta.npz"
        z = np.load(path, allow_pickle=False)
        keep_flat = []
        off = 0
        for ln in z["keep_lens"]:
            keep_flat.append(z["keep_cat"][off:off + ln])
            off += ln

        all_keep = {}
        i = 0
        for c, cnt in zip(z["chroms"], z["keep_counts"]):
            # preserve non-integer chromosome labels ('X', 'MT', ...)
            all_keep[_chrom_key(c)] = keep_flat[i:i + cnt]
            i += cnt
        bf = str(z["backingfile"])
        if bf:
            import os

            if not os.path.exists(bf):
                # relocatable fix-up: look next to the metadata file
                # (reference R/read-plink.R:135-137 attach semantics)
                cand = os.path.join(os.path.dirname(path),
                                    os.path.basename(bf))
                if os.path.exists(cand):
                    bf = cand
        # read-only attach by default: works on read-only mounts and
        # cannot mutate the persisted scores (writable=True for 'r+')
        scores = (np.load(bf, mmap_mode="r+" if writable else "r") if bf
                  else z["scores_inline"])
        return cls(scores=scores, lpS=z["lpS"],
                   grid_lpS_thr=z["grid_lpS_thr"], betas=z["betas"],
                   all_keep=all_keep, backingfile=bf or None)


def snp_grid_PRS(pack, all_keep, betas, lpS, n_thr_lpS=50, grid_lpS_thr=None,
                 ind_row=None, backingfile=None) -> GridPRS:
    """Reference snp_grid_PRS (R/SCT.R:201-246).

    backingfile: path for an on-disk float32 score store (the
    reference's FBM at R/SCT.R:244). Scores are written chunk-by-chunk
    (one grid cell's threshold block at a time), so peak RAM is
    O(n * n_thr) regardless of grid size. A half-written store is
    deleted on failure."""
    import os

    betas = np.asarray(betas, dtype=np.float64)
    lpS = np.asarray(lpS, dtype=np.float64)
    if grid_lpS_thr is None:
        grid_lpS_thr = 0.9999 * seq_log(
            max(0.1, np.nanmin(lpS)), np.nanmax(lpS), n_thr_lpS)
    grid_lpS_thr = np.asarray(grid_lpS_thr)
    n_thr = len(grid_lpS_thr)

    keep_sets = [k for chrom in sorted(all_keep) for k in all_keep[chrom]]
    sub = pack if ind_row is None else pack.subset(ind_row=np.asarray(ind_row))
    shape = (sub.n, len(keep_sets) * n_thr)
    if backingfile is not None:
        backingfile = str(backingfile)
        if not backingfile.endswith(".npy"):
            backingfile = backingfile + ".npy"
        if os.path.exists(backingfile):
            raise FileExistsError(backingfile)
        scores = np.lib.format.open_memmap(
            backingfile, mode="w+", dtype=np.float32, shape=shape)
    else:
        scores = np.zeros(shape, dtype=np.float32)
    try:
        # batch grid cells into grouped full-width GEMMs: one fused
        # decode+GEMM per ~512 MB of B columns against the pack's
        # cached device copy (per-cell launches paid ~20 s each of
        # dispatch+fetch overhead on the tunnel at biobank n; the
        # threshold masks fold into B like in snp_PRS, same_keep=True)
        group = max(1, int((512 << 20) // max(1, sub.m * 8 * n_thr)))
        for g0 in range(0, len(keep_sets), group):
            cells = keep_sets[g0:g0 + group]
            B = np.zeros((sub.m, len(cells) * n_thr))
            any_nz = False
            for ci, ind_keep in enumerate(cells):
                if len(ind_keep) == 0:
                    continue
                any_nz = True
                mask = lpS[ind_keep, None] > grid_lpS_thr[None, :]
                B[ind_keep, ci * n_thr:(ci + 1) * n_thr] = \
                    betas[ind_keep, None] * mask
            if not any_nz:
                continue
            prs = np.asarray(snp_prodVec(sub, B), dtype=np.float32)
            scores[:, g0 * n_thr:(g0 + len(cells)) * n_thr] = prs
    except BaseException:
        if backingfile is not None:
            del scores
            os.unlink(backingfile)  # half-written cleanup (R/read-bgen.R:191)
        raise
    if backingfile is not None:
        scores.flush()
    return GridPRS(scores=scores, lpS=lpS, grid_lpS_thr=grid_lpS_thr,
                   betas=betas, all_keep=all_keep, backingfile=backingfile)


def snp_grid_stacking(multi_PRS: GridPRS, y_train,
                      alphas=(1.0, 0.01, 0.0001), **kw):
    """Reference snp_grid_stacking (R/SCT.R:266-304): penalized stacking
    over all grid scores, then unroll stacking weights back to per-variant
    effects via the cumulative-sum trick (R/SCT.R:287-295)."""
    y_train = np.asarray(y_train, dtype=np.float64)
    lpS = multi_PRS.lpS
    lpS_thr = multi_PRS.grid_lpS_thr
    beta_gwas = multi_PRS.betas
    all_keep = multi_PRS.all_keep

    # nested C+T threshold columns are near-collinear: bigstatsr-class
    # eps (1e-5 on standardized scale) instead of the 1e-7 default,
    # which can burn the full sweep budget on every lambda
    kw.setdefault("tol", 1e-5)
    mod = big_spReg(multi_PRS.scores, y_train, alphas=alphas, **kw)
    beta_stacking = mod.beta

    # unroll: a variant contributes to every threshold column with
    # thr < its lpS, so its unrolled weight is the cumsum of the
    # stacking weights over the thresholds it passes
    ind_last_thr = 1 + np.array([(lp > lpS_thr).sum() for lp in lpS])
    coef = np.zeros(len(beta_gwas))
    n_thr = len(lpS_thr)
    offset = 0
    for chrom in sorted(all_keep):
        for ind_keep in all_keep[chrom]:
            b = beta_stacking[offset:offset + n_thr]
            b2 = np.r_[0, np.cumsum(b)]
            if len(ind_keep):
                coef[ind_keep] += b2[ind_last_thr[ind_keep] - 1]
            offset += n_thr
    return {
        "intercept": mod.intercept,
        "beta.G": coef * beta_gwas,
        "beta.covar": np.array([]),
        "mod": mod,
    }
