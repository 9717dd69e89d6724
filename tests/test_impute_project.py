"""Imputation + PCA projection (OADP) tests."""

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake, bed_scaleBinom
from bigsnpr_tpu.utils.impute import (
    snp_fastImputeSimple, snp_fastImputeSimple_dosage, snp_fastImpute,
)
from bigsnpr_tpu.pca.project import (
    prod_and_row_sums_sq, pca_OADP_proj, bed_projectSelfPCA, bed_projectPCA,
)
from bigsnpr_tpu.linalg.randomsvd import snp_randomSVD


def test_impute_simple_modes():
    pack = snp_fake(200, 60, seed=41, na_prob=0.15)
    X = pack.to_dosage()
    na = np.isnan(X)

    out = snp_fastImputeSimple(pack, "mode")
    Xo = out.to_dosage()
    assert not np.isnan(Xo).any()
    np.testing.assert_array_equal(Xo[~na], X[~na])
    for j in range(60):
        vals, cnt = np.unique(X[~na[:, j], j], return_counts=True)
        # reference mode rule is a specific chain of comparisons; the filled
        # value must be one of the modes
        assert Xo[na[:, j], j][0] in vals[cnt == cnt.max()] if na[:, j].any() else True

    out2 = snp_fastImputeSimple(pack, "mean0")
    X2 = out2.to_dosage()
    for j in range(60):
        if na[:, j].any():
            exp = np.rint(np.nanmean(X[:, j]))
            assert np.all(X2[na[:, j], j] == exp)

    out3 = snp_fastImputeSimple(pack, "random", seed=0)
    X3 = out3.to_dosage()
    assert not np.isnan(X3).any()
    np.testing.assert_array_equal(X3[~na], X[~na])

    X4 = snp_fastImputeSimple_dosage(pack)
    for j in range(60):
        if na[:, j].any():
            assert np.allclose(X4[na[:, j], j], np.round(np.nanmean(X[:, j]), 2))


def test_fast_impute_model():
    """Model-based imputation beats column-mean on LD-structured data."""
    rng = np.random.default_rng(7)
    n, m = 600, 60
    hap = np.empty((2 * n, m), dtype=np.int8)
    hap[:, 0] = rng.random(2 * n) < 0.4
    for j in range(1, m):
        copy = rng.random(2 * n) < 0.9
        hap[:, j] = np.where(copy, hap[:, j - 1], rng.random(2 * n) < 0.4)
    X_true = (hap[:n] + hap[n:]).astype(float)
    X_obs = X_true.copy()
    na_mask = rng.random((n, m)) < 0.1
    X_obs[na_mask] = np.nan

    from bigsnpr_tpu.core import unpack
    from bigsnpr_tpu.core.genotypes import GenoPack

    pack = GenoPack(packed=unpack.np_pack_codes(
        unpack.np_dosage_to_codes(X_obs.T)), n=n)
    out, info = snp_fastImpute(pack, seed=1)
    Xi = out.to_dosage()
    assert not np.isnan(Xi).any()
    err_model = np.mean(Xi[na_mask] != X_true[na_mask])
    # mean-impute baseline error
    mode = snp_fastImputeSimple(pack, "mode").to_dosage()
    err_mode = np.mean(mode[na_mask] != X_true[na_mask])
    assert err_model < err_mode * 0.7, (err_model, err_mode)
    # info: row 0 records NA rates
    np.testing.assert_allclose(info[0], na_mask.mean(axis=0), atol=1e-12)
    # resumable: second call with info does nothing (already done)
    out2, info2 = snp_fastImpute(out, info=info, seed=2)
    np.testing.assert_array_equal(out2.to_dosage(), Xi)


def test_prod_and_row_sums_sq():
    pack = snp_fake(80, 40, seed=42, na_prob=0.05)
    sc = bed_scaleBinom(pack)
    V = np.random.default_rng(0).standard_normal((40, 4))
    XV, X_norm = prod_and_row_sums_sq(pack, V, sc["center"], sc["scale"])
    from tests.conftest import dense_standardized

    Xt = dense_standardized(pack, sc["center"], sc["scale"])
    np.testing.assert_allclose(XV, Xt @ V, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(X_norm, (Xt**2).sum(1), rtol=2e-4)


def test_oadp_corrects_shrinkage():
    """Spiked model: simple projection shrinks held-out scores; OADP does not."""
    rng = np.random.default_rng(9)
    n, p, n_new = 300, 2000, 100
    # one strong spike
    u_dir = rng.standard_normal(p)
    u_dir /= np.linalg.norm(u_dir)
    lam = 6.0
    X = rng.standard_normal((n, p)) + np.outer(
        rng.standard_normal(n) * lam, u_dir)
    Xnew = rng.standard_normal((n_new, p)) + np.outer(
        rng.standard_normal(n_new) * lam, u_dir)

    U, s, Vt = np.linalg.svd(X, full_matrices=False)
    K = 4
    V = Vt[:K].T
    XV = Xnew @ V
    X_norm = (Xnew**2).sum(1)
    oadp = pca_OADP_proj(XV, X_norm, s[:K])

    ref_sd = np.std(U[:, 0] * s[0])
    simple_sd = np.std(XV[:, 0])
    oadp_sd = np.std(oadp[:, 0])
    assert simple_sd < 0.9 * ref_sd           # shrinkage is real
    assert abs(oadp_sd - ref_sd) < abs(simple_sd - ref_sd)  # corrected
    assert oadp_sd > simple_sd * 1.02


def test_project_self_pca():
    pack = snp_fake(250, 300, seed=43)
    train = np.arange(0, 200)
    test = np.arange(200, 250)
    sub = pack.subset(ind_row=train)
    svd = snp_randomSVD(sub, k=4, tol=1e-6)
    svd.subset = np.arange(300)
    res = bed_projectSelfPCA(svd, pack, ind_row=test)
    assert res["simple_proj"].shape == (50, 4)
    assert res["OADP_proj"].shape == (50, 4)
    # same-distribution check: projected scores within ref score range scale
    ref_scores = svd.scores()
    for k in range(2):
        assert np.std(res["OADP_proj"][:, k]) < 3 * np.std(ref_scores[:, k])


def test_project_pca_cross_dataset():
    """bed_projectPCA end-to-end with allele flips between datasets."""
    pack = snp_fake(300, 260, seed=44)
    ref = pack.subset(ind_row=np.arange(0, 200))
    new = pack.subset(ind_row=np.arange(200, 300))
    # reverse alleles of some variants in the target map + genotypes
    from bigsnpr_tpu.core import unpack as up
    from bigsnpr_tpu.core.genotypes import GenoPack

    codes = up.np_unpack_codes(np.asarray(new.packed), new.n)
    X = new.to_dosage()
    rev = np.zeros(260, dtype=bool)
    rev[::5] = True
    Xr = np.where(rev[None, :], 2 - X, X)
    new_map = new.map.copy()
    a1 = new_map["allele1"].to_numpy().copy()
    a2 = new_map["allele2"].to_numpy().copy()
    a1[rev], a2[rev] = a2[rev], a1[rev]
    new_map["allele1"], new_map["allele2"] = a1, a2
    new_rev = GenoPack(packed=up.np_pack_codes(up.np_dosage_to_codes(Xr.T)),
                       n=new.n, fam=new.fam, map=new_map)

    res = bed_projectPCA(ref, new_rev, k=4, thr_r2=0.95, min_mac=2,
                         min_maf=0.01, max_iter=1)
    res0 = bed_projectPCA(ref, new, k=4, thr_r2=0.95, min_mac=2,
                          min_maf=0.01, max_iter=1)
    # reversal-corrected projection must match the unreversed one
    np.testing.assert_allclose(res["simple_proj"], res0["simple_proj"],
                               rtol=1e-3, atol=1e-3)


def test_project_training_rows_recovers_scores(example_pack):
    """Projecting the training rows reproduces the SVD scores (reference
    test-2-pca-project.R: simple_proj[ind.row] == predict(obj.svd), 1e-4),
    and OADP moves held-out group medians toward the reference medians."""
    rng = np.random.default_rng(3)
    train = np.sort(rng.choice(example_pack.n, 400, replace=False))
    test = np.setdiff1d(np.arange(example_pack.n), train)
    sub = example_pack.subset(ind_row=train)
    svd = snp_randomSVD(sub, k=10, tol=1e-6)
    svd.subset = np.arange(example_pack.m)

    res = bed_projectSelfPCA(svd, example_pack)
    scores = svd.scores()
    # sign alignment is already fixed by shared v
    np.testing.assert_allclose(res["simple_proj"][train], scores,
                               rtol=2e-3, atol=2e-3)

    # population-median property (fam families act as populations)
    pop = np.repeat([1, 2, 3], [143, 167, 207])
    ref_med = np.array([np.median(scores[pop[train] == k][:, 1:3], axis=0)
                        for k in (1, 2, 3)])
    p1 = np.array([np.median(res["simple_proj"][test][pop[test] == k][:, 1:3],
                             axis=0) for k in (1, 2, 3)])
    p2 = np.array([np.median(res["OADP_proj"][test][pop[test] == k][:, 1:3],
                             axis=0) for k in (1, 2, 3)])
    assert (ref_med**2).sum() > (p1**2).sum()          # simple proj shrinks
    assert ((ref_med - p2)**2).sum() < ((ref_med - p1)**2).sum()  # OADP closer


def test_fastimpute_boost_captures_nonadditive():
    """method='boost' (gradient-boosted stumps on dosage classes — the
    reference's tree-class xgboost path, R/impute.R:80-92) captures
    heterozygote-dependent patterns a linear ridge cannot."""
    rng = np.random.default_rng(0)
    n, m = 1500, 400
    X = rng.binomial(2, 0.4, size=(n, m)).astype(float)
    # every 4th SNP: dosage 1 iff left neighbor heterozygous, else 2 —
    # a V-shaped (dominance-like) map, non-representable linearly
    for j in range(1, m, 4):
        X[:, j] = (X[:, j - 1] == 1) * 1.0 + (X[:, j - 1] != 1) * 2.0
    na = rng.random((n, m)) < 0.15
    Xo = X.copy()
    Xo[na] = np.nan

    from bigsnpr_tpu.core import unpack
    from bigsnpr_tpu.core.genotypes import GenoPack

    pack = GenoPack(packed=unpack.np_pack_codes(
        unpack.np_dosage_to_codes(Xo.T)), n=n)
    struct = np.zeros(m, bool)
    struct[1::4] = True

    errs = {}
    for method in ("ridge", "boost"):
        out, _ = snp_fastImpute(pack, seed=1, method=method)
        Xi = out.to_dosage()
        assert not np.isnan(Xi).any()
        sel = na & struct[None, :]
        errs[method] = np.mean(Xi[sel] != X[sel])
    # measured: boost ~0.075 vs ridge ~0.38 on the non-additive SNPs
    assert errs["boost"] < 0.15, errs
    assert errs["boost"] < 0.5 * errs["ridge"], errs
