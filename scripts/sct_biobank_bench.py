"""SCT at biobank n through the disk store (round-3 verdict #6).

n=500K samples x (28 clumping cells x 50 thresholds) grid-PRS written
chunk-by-chunk into the float32 memmap store, stacking via the native
active-set CD — wall time per stage + peak RSS recorded. Reference:
snp_grid_PRS/snp_grid_stacking (R/SCT.R:201-304) at UKBB scale.

Usage: python scripts/sct_biobank_bench.py [--n 500000] [--m 20000]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def build_pack(n, m, rng):
    """LD-structured pack in row chunks (bounded build memory), cached
    on disk — the byte-op generator (one gaussian per group + 20%
    per-entry mutation decorrelation) still costs ~6 min single-core
    at 500K x 20K."""
    from scipy.stats import norm

    from bigsnpr_tpu.core import unpack as up
    from bigsnpr_tpu.core.genotypes import GenoPack

    cache = f"/tmp/sct_pack_{m}x{n}.npy"
    t0 = time.perf_counter()
    if os.path.exists(cache):
        packed = np.load(cache)
        print(f"pack {m}x{n} loaded from {cache} "
              f"({packed.nbytes/1e9:.1f} GB packed)", flush=True)
        return GenoPack(packed=packed, n=n)
    packed = np.empty((m, (n + 3) // 4), np.uint8)
    group = 10
    for b0 in range(0, m, 2000):
        b1 = min(b0 + 2000, m)
        mloc = b1 - b0
        z = rng.standard_normal((mloc // group + 2, n)).astype(np.float32)
        idx = np.arange(mloc) // group
        p = rng.uniform(0.1, 0.5, (mloc, 1)).astype(np.float32)
        base = z[idx]
        c = ((base > norm.ppf((1 - p) ** 2)).astype(np.uint8)
             + (base > norm.ppf(1 - p ** 2)))
        mask = rng.integers(0, 1 << 16, (mloc, n), dtype=np.uint16) < 13107
        c = np.where(mask, np.roll(c, 7, axis=0), c)
        codes = np.array([0, 2, 3], np.uint8)[c]
        pad = (-n) % 4
        if pad:
            codes = np.concatenate(
                [codes, np.ones((mloc, pad), np.uint8)], axis=1)
        packed[b0:b1] = up.np_pack_codes(codes)
    np.save(cache, packed)
    print(f"pack {m}x{n} built in {time.perf_counter()-t0:.0f}s "
          f"({packed.nbytes/1e9:.1f} GB packed, rss {rss_gb():.1f} GB, "
          f"cached -> {cache})", flush=True)
    return GenoPack(packed=packed, n=n)


def run_stages(pack, n, m, rng):
    from bigsnpr_tpu.ops.matvec import snp_cprodVec, snp_prodVec
    from bigsnpr_tpu.ops.stats import snp_colstats
    from bigsnpr_tpu.pgs.sct import (snp_grid_clumping, snp_grid_PRS,
                                     snp_grid_stacking)

    # synthetic phenotype + GWAS on a training split — both through the
    # fused decode+GEMM device ops (host to_dosage decodes run at only
    # ~8M entries/s/core: 30+ min of the first draft's wall at 500K)
    t0 = time.perf_counter()
    beta_true = rng.normal(0, 1, m) * (rng.uniform(size=m) < 0.02)
    st = snp_colstats(pack)
    nona = np.maximum(np.asarray(st["nona"], float), 1)
    ctr = np.asarray(st["sumX"]) / nona
    sc = np.sqrt(np.maximum(np.asarray(st["denoX"]) / nona, 1e-9))

    g = np.asarray(snp_prodVec(pack, beta_true, center=ctr, scale=sc),
                   np.float64)
    g = (g - g.mean()) / g.std()
    y = np.sqrt(0.3) * g + np.sqrt(0.7) * rng.standard_normal(n).astype(
        np.float32)
    train = rng.permutation(n)[:n // 2]
    # GWAS z on train: X-std[train]' yt == X-std' y_pad (zeros off-train)
    yt = y[train] - y[train].mean()
    y_pad = np.zeros(n, np.float64)
    y_pad[train] = yt
    z = np.asarray(snp_cprodVec(pack, y_pad, center=ctr, scale=sc),
                   np.float64) / (np.std(yt) * np.sqrt(len(train)))
    from scipy import stats as ss

    pvals = 2 * ss.norm.sf(np.abs(z))
    lpS = -np.log10(np.maximum(pvals, 1e-300))
    betas = z
    print(f"pheno + GWAS: {time.perf_counter()-t0:.0f}s "
          f"(rss {rss_gb():.1f} GB)", flush=True)

    # 28-cell clumping grid (7 thr_r2 x 4 base sizes)
    t0 = time.perf_counter()
    # 10 kb spacing = genotyping-array density (UKBB-class ~36K
    # variants/chromosome over ~250 Mbp); at 1 kb the grid's widest
    # window (base 500 kb / thr.r2 0.01 = 50 Mbp) spans the WHOLE
    # synthetic chromosome and the r^2 stage degenerates to a full
    # m x m correlation
    all_keep, grid = snp_grid_clumping(
        pack, infos_chr=np.ones(m, int), infos_pos=np.arange(m) * 10_000.0,
        lpS=lpS, ind_row=train)
    n_cells = sum(len(v) for v in all_keep.values())
    dt_clump = time.perf_counter() - t0
    print(f"grid clumping ({n_cells} cells): {dt_clump:.0f}s "
          f"(rss {rss_gb():.1f} GB)", flush=True)

    # grid-PRS into the disk store, 50 thresholds
    t0 = time.perf_counter()
    store = "/tmp/sct_scores.npy"
    if os.path.exists(store):
        os.unlink(store)
    multi = snp_grid_PRS(pack, all_keep, betas, lpS, n_thr_lpS=50,
                         backingfile=store)
    dt_prs = time.perf_counter() - t0
    sz = os.path.getsize(store) / 1e9
    print(f"grid-PRS -> disk store: {dt_prs:.0f}s "
          f"({multi.scores.shape} = {sz:.1f} GB on disk, "
          f"rss {rss_gb():.1f} GB)", flush=True)

    # stacking on the train half via the native CD (covariance mode)
    t0 = time.perf_counter()
    sub_scores = np.asarray(multi.scores[train])
    from bigsnpr_tpu.pgs.sct import GridPRS

    sub = GridPRS(scores=sub_scores, lpS=multi.lpS,
                  grid_lpS_thr=multi.grid_lpS_thr, betas=multi.betas,
                  all_keep=multi.all_keep, backingfile=None)
    res = snp_grid_stacking(sub, y[train], alphas=(1.0, 0.01),
                            K=4, nlambda=30)
    dt_stack = time.perf_counter() - t0
    print(f"stacking (native CD): {dt_stack:.0f}s (rss {rss_gb():.1f} GB)",
          flush=True)

    # evaluate on the held-out half with the unrolled per-variant effects
    t0 = time.perf_counter()
    test = np.setdiff1d(np.arange(n), train)
    coef = res["beta.G"]
    prs = np.asarray(snp_prodVec(pack, coef), np.float32)[test]
    r = np.corrcoef(prs, y[test])[0, 1]
    print(f"test-half scoring: {time.perf_counter()-t0:.0f}s; "
          f"cor(PRS, y) = {r:.3f} (h2=0.3 cap ~{np.sqrt(0.3):.2f}); "
          f"peak rss {rss_gb():.1f} GB", flush=True)
    os.unlink(store)


def main():
    def arg(flag, default, cast=int):
        if flag in sys.argv:
            return cast(sys.argv[sys.argv.index(flag) + 1])
        return default

    n = arg("--n", 500_000)
    m = arg("--m", 20_000)
    rng = np.random.default_rng(0)
    pack = build_pack(n, m, rng)
    run_stages(pack, n, m, rng)


if __name__ == "__main__":
    main()
