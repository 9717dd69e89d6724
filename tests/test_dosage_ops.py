"""DosagePack flows through stats/matvec/GWAS like GenoPack."""

import numpy as np
import pytest

from bigsnpr_tpu.core.dosage import DosagePack
from bigsnpr_tpu.core.codes import CODE_DOSAGE
from bigsnpr_tpu.ops.stats import snp_colstats, snp_scaleBinom
from bigsnpr_tpu.ops.matvec import snp_prodVec, snp_cprodVec


@pytest.fixture(scope="module")
def dpack():
    rng = np.random.default_rng(81)
    m, n = 60, 150
    # dosage codes 7..207 (2-decimal dosages) + some missing (code 3)
    codes = rng.integers(7, 208, size=(m, n)).astype(np.uint8)
    codes[rng.random((m, n)) < 0.05] = 3
    return DosagePack(codes=codes, n=n)


def test_dosage_colstats(dpack):
    X = dpack.to_dosage()
    s = snp_colstats(dpack)
    np.testing.assert_allclose(s["sumX"], np.nansum(X, 0), rtol=1e-10)
    np.testing.assert_array_equal(s["nona"], (~np.isnan(X)).sum(0))


def test_dosage_matvec(dpack):
    X = dpack.to_dosage()
    sc = snp_scaleBinom(2)(dpack)
    Xt = np.nan_to_num((X - sc["center"]) / sc["scale"])
    rng = np.random.default_rng(0)
    v = rng.standard_normal(dpack.n)
    out = np.asarray(snp_cprodVec(dpack, v, sc["center"], sc["scale"]))
    np.testing.assert_allclose(out, Xt.T @ v, rtol=3e-4, atol=3e-4)
    u = rng.standard_normal(dpack.m)
    out2 = np.asarray(snp_prodVec(dpack, u, sc["center"], sc["scale"]))
    np.testing.assert_allclose(out2, Xt @ u, rtol=3e-4, atol=3e-4)


def test_round_to_hardcalls(dpack):
    hard = dpack.round_to_hardcalls()
    Xd = dpack.to_dosage()
    Xh = hard.to_dosage()
    ok = ~np.isnan(Xd)
    np.testing.assert_array_equal(Xh[ok], np.rint(Xd[ok]))
    np.testing.assert_array_equal(np.isnan(Xh), np.isnan(Xd))


def test_dosage_svd(dpack):
    from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD

    res = snp_randomSVD(dpack, fun_scaling=snp_scaleBinom(2), k=3, tol=1e-6)
    X = dpack.to_dosage()
    sc = snp_scaleBinom(2)(dpack)
    Xt = np.nan_to_num((X - sc["center"]) / sc["scale"])
    _, s, _ = np.linalg.svd(Xt, full_matrices=False)
    np.testing.assert_allclose(res.d, s[:3], rtol=1e-3)


def test_dosage_ld_ops(dpack):
    """snp_cor / clumping / ld_scores on DosagePack vs f64 oracle."""
    from bigsnpr_tpu.ops.corr import snp_cor
    from bigsnpr_tpu.ops.ldscores import snp_ld_scores
    from bigsnpr_tpu.ops.clumping import snp_clumping
    from tests.test_corr import naive_pair_r

    X = dpack.to_dosage()
    corr = snp_cor(dpack, size=12, fill_diag=False)
    D = corr.to_dense()
    m = dpack.m
    for j0 in range(0, m, 7):
        for j in range(max(0, j0 - 12), j0):
            r, _ = naive_pair_r(X[:, j0], X[:, j])
            if D[j, j0] != 0:
                np.testing.assert_allclose(D[j, j0], np.clip(r, -1, 1),
                                           atol=1e-4)
    keep = snp_clumping(dpack, infos_chr=np.ones(m, dtype=int), thr_r2=0.9)
    assert 0 < len(keep) <= m
    ld = snp_ld_scores(dpack, size=12)
    assert np.isfinite(ld).all() and (ld >= 1 - 1e-9).all()
