"""End-to-end demo: the LDpred2 tutorial flow at synthetic scale.

genotypes -> QC -> autoSVD PCA -> simulated trait -> GWAS -> windowed LD
-> LD splitting -> LDSC h2 -> LDpred2-auto (block-parallel) + lassosum2
-> polygenic scores, with per-stage timing.

Run: python examples/full_pipeline.py [n_samples] [m_variants]
(defaults 2000 x 8000; forced CPU unless BIGSNPR_DEMO_TPU=1)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("BIGSNPR_DEMO_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import bigsnpr_tpu as bt
from bigsnpr_tpu.assoc.gwas import big_univLinReg, gwas_pvalues
from bigsnpr_tpu.utils.profiling import StageTimer


def make_cohort(n, m, seed=0):
    """LD-structured synthetic cohort (haplotype copying)."""
    rng = np.random.default_rng(seed)
    p = rng.uniform(0.05, 0.5, m)
    hap = np.empty((2 * n, m), dtype=np.int8)
    hap[:, 0] = rng.random(2 * n) < p[0]
    for j in range(1, m):
        copy = rng.random(2 * n) < 0.85
        hap[:, j] = np.where(copy, hap[:, j - 1], rng.random(2 * n) < p[j])
    X = (hap[:n] + hap[n:]).astype(float)
    from bigsnpr_tpu.core import unpack
    from bigsnpr_tpu.core.genotypes import GenoPack
    import pandas as pd

    pack = GenoPack(
        packed=unpack.np_pack_codes(unpack.np_dosage_to_codes(X.T)), n=n,
        map=pd.DataFrame({
            "chromosome": 1 + (np.arange(m) * 4 // m),  # 4 chromosomes
            "marker.ID": [f"SNP{j}" for j in range(m)],
            "genetic.dist": 0.0,
            "physical.pos": np.arange(1, m + 1) * 1000,
            "allele1": "A", "allele2": "C",
        }))
    return pack, X


def main(n=2000, m=8000):
    t = StageTimer()
    print(f"cohort: {n} samples x {m} variants")

    with t.stage("simulate cohort"):
        pack, X = make_cohort(n, m)
    chrs = pack.map["chromosome"].to_numpy()
    pos = pack.map["physical.pos"].to_numpy()

    with t.stage("autoSVD PCA"):
        svd = bt.snp_autoSVD(pack, infos_chr=chrs, infos_pos=pos, k=10)
    print(f"  PCA: kept {len(svd.subset)} variants, d[0]={svd.d[0]:.1f}")

    with t.stage("simulate trait + GWAS"):
        simu = bt.snp_simuPheno(pack, h2=0.4, M=m // 50, seed=2)
        y = simu["pheno"]
        gwas = big_univLinReg(pack, y, covar=svd.u)
        df_beta = {"beta": gwas["estim"].to_numpy(),
                   "beta_se": gwas["std.err"].to_numpy(),
                   "n_eff": np.full(m, float(n))}

    with t.stage("windowed LD"):
        corr = bt.snp_cor(pack, size=250, infos_pos=pos)
    print(f"  LD: nnz={corr.upper.nnz:,} "
          f"({corr.upper.nnz / m**2:.2%} dense)")

    with t.stage("LD splitting"):
        split = bt.snp_ldsplit(corr, thr_r2=0.02, min_size=50,
                               max_size=m // 8, max_K=100, max_r2=np.inf,
                               max_cost=np.inf)
        best = split.iloc[-1]
        blocks = best["all_size"]
    print(f"  split: {best['n_block']} blocks, cost {best['cost']:.2f}, "
          f"{best['perc_kept']:.1%} of LD kept")

    with t.stage("LDSC"):
        h2_est = bt.snp_ldsc2(corr, df_beta)["h2"]
    print(f"  LDSC h2 = {h2_est:.3f} (true 0.4)")

    with t.stage("LDpred2-auto (block-parallel)"):
        auto = bt.snp_ldpred2_auto(
            corr, df_beta, h2_init=max(h2_est, 0.05),
            vec_p_init=[0.05, 0.2], burn_in=300, num_iter=200,
            blocks=blocks)
    beta_auto = np.mean([r["beta_est"] for r in auto
                         if np.isfinite(r["beta_est"]).all()], axis=0)

    with t.stage("lassosum2 (block-parallel)"):
        bl, grid = bt.snp_lassosum2(corr, df_beta, blocks=blocks, maxiter=300)

    with t.stage("scoring"):
        pred_auto = np.asarray(bt.snp_prodVec(pack, beta_auto))
        rs = []
        for j in range(bl.shape[1]):
            col = bl[:, j]
            if np.isfinite(col).all():
                rs.append(np.corrcoef(X @ col, y)[0, 1])
        r_auto = np.corrcoef(pred_auto, y)[0, 1]
    print(f"  r(pred, y): LDpred2-auto {r_auto:.3f}, "
          f"lassosum2 best {max(rs):.3f}")
    print(f"  auto h2_est={auto[0]['h2_est']:.3f} p_est={auto[0]['p_est']:.4f}")

    print("\nstage timings:")
    print(t.report())


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    main(n, m)
