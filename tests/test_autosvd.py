"""autoSVD + robust stats tests."""

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake
from bigsnpr_tpu.pca.autosvd import snp_autoSVD, get_intervals
from bigsnpr_tpu.pca.robust import (
    dist_ogk, rollmean, medcouple, tukey_mc_up, tau_scale_location,
)


def test_rollmean():
    x = np.arange(10, dtype=float)
    out = rollmean(x, 2)
    # middle: mean of 5 values = center
    np.testing.assert_allclose(out[2:8], x[2:8])
    # edges truncate
    assert out[0] == np.mean(x[:3])
    assert out[9] == np.mean(x[7:])
    np.testing.assert_array_equal(rollmean(x, 0), x)


def test_tau_scale_normal():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(100000) * 3.0 + 5.0
    mu, sig = tau_scale_location(x)
    assert abs(mu - 5.0) < 0.05
    assert abs(sig - 3.0) < 0.05


def test_medcouple():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(2001)
    assert abs(medcouple(x)) < 0.05          # symmetric -> ~0
    y = np.exp(rng.standard_normal(2001))
    assert medcouple(y) > 0.2                # right-skewed -> positive


def test_tukey_mc_up_outliers():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(5000)
    thr = tukey_mc_up(x, alpha=0.05)
    # under normality, threshold ~ max-calibrated: few/no exceedances
    assert (x > thr).sum() <= 5
    x2 = np.r_[x, [15.0, 16.0, 20.0]]
    thr2 = tukey_mc_up(x2, alpha=0.05)
    assert ((x2 > thr2).sum() >= 3) and (thr2 < 15)


def test_dist_ogk_identifies_outliers():
    rng = np.random.default_rng(3)
    n, p = 500, 5
    X = rng.standard_normal((n, p))
    X[:10] += 8.0  # planted outliers
    d = dist_ogk(X)
    assert d[:10].min() > np.quantile(d[10:], 0.99)
    # clean data: distances ~ chi2_p up to the (harmless) truncation
    # constant of the hard-rejection reweighting — scale-free downstream
    d2 = dist_ogk(rng.standard_normal((2000, 4)))
    assert 0.8 < np.median(d2) / 3.357 < 1.4  # chi2_4 median ~ 3.357


def test_get_intervals():
    x = np.array([1, 2, 3, 7, 9, 10, 11, 12, 20])
    out = get_intervals(x, n=2)
    np.testing.assert_array_equal(out, [[1, 3], [9, 12]])
    out3 = get_intervals(x, n=4)
    np.testing.assert_array_equal(out3, [[9, 12]])


def test_autosvd_fake_runs():
    pack = snp_fake(150, 300, seed=13)
    res = snp_autoSVD(pack, thr_r2=0.99, k=4, min_mac=2, min_maf=0.01,
                      roll_size=5, max_iter=2,
                      infos_pos=pack.map["physical.pos"].to_numpy())
    assert res.d.shape == (4,)
    assert res.subset is not None and len(res.subset) > 100
    assert res.u.shape[0] == 150


def test_autosvd_example(example_pack):
    """configs[0]: autoSVD on example.bed converges and keeps most variants
    (simulated low-LD data, reference example 'keep most of them')."""
    res = snp_autoSVD(
        example_pack,
        infos_chr=example_pack.map["chromosome"].to_numpy(),
        infos_pos=example_pack.map["physical.pos"].to_numpy(),
        k=10,
    )
    assert res.d.shape == (10,)
    assert len(res.subset) > 0.5 * example_pack.m
    # PC scores: population structure should be visible in top PCs
    assert res.d[0] > res.d[1] > res.d[9]


def test_medcouple_exact_bruteforce_oracle():
    """Exact parity with the definitional O(n^2) medcouple kernel
    (Brys-Hubert-Struyf 2004): h(xi,xj) = ((xj-med)+(xi-med))/(xj-xi)
    over xi <= med <= xj (quantifies DEVIATIONS #4 for no-ties data)."""
    rng = np.random.default_rng(5)
    for trial in range(5):
        x = rng.standard_normal(201) + 0.3 * rng.standard_normal() ** 2
        med = np.median(x)
        lo = x[x <= med]
        hi = x[x >= med]
        with np.errstate(invalid="ignore"):
            H = ((hi[:, None] - med) + (lo[None, :] - med)) / (
                hi[:, None] - lo[None, :])
        H[(hi[:, None] - lo[None, :]) == 0] = 0.0   # single tie at median
        expect = np.median(H)
        np.testing.assert_allclose(medcouple(x), expect, atol=1e-12)


def test_ogk_consistency_and_robustness():
    """Quantified dist_ogk behavior (VERDICT weak #10): on clean
    elliptical data the OGK scatter approximates the true covariance
    and distances match true Mahalanobis; 10% gross outliers barely
    move it while the classical estimate breaks."""
    from bigsnpr_tpu.pca.robust import covrob_ogk

    rng = np.random.default_rng(2)
    n, p = 20000, 4
    A = np.array([[2.0, 0.5, 0, 0], [0, 1.0, 0.3, 0],
                  [0, 0, 0.5, 0.2], [0, 0, 0, 1.5]])
    Sigma = A @ A.T
    X = rng.standard_normal((n, p)) @ A.T
    center, cov = covrob_ogk(X)
    # hard-rejection reweighting trims the tail -> a scalar shrink of
    # the scatter; the SHAPE (what Mahalanobis ordering depends on)
    # must match
    cov_n = cov / np.trace(cov)
    Sigma_n = Sigma / np.trace(Sigma)
    rel = np.linalg.norm(cov_n - Sigma_n) / np.linalg.norm(Sigma_n)
    assert rel < 0.03, rel

    d2 = dist_ogk(X)
    inv = np.linalg.inv(Sigma)
    d2_true = np.einsum("ij,jk,ik->i", X, inv, X)
    r = np.corrcoef(d2, d2_true)[0, 1]
    assert r > 0.999, r

    # contaminate 10% with gross outliers at 50 sigma
    Xc = X.copy()
    out = rng.choice(n, n // 10, replace=False)
    Xc[out] = 50.0 * rng.standard_normal((len(out), p))
    _, cov_rob = covrob_ogk(Xc)
    rel_rob = np.linalg.norm(cov_rob / np.trace(cov_rob) - Sigma_n) \
        / np.linalg.norm(Sigma_n)
    cov_classical = np.cov(Xc.T)
    rel_cls = np.linalg.norm(cov_classical - Sigma) / np.linalg.norm(Sigma)
    assert rel_rob < 0.1, rel_rob
    assert rel_cls > 5.0, rel_cls  # classical blown up ~50x


def test_tau_scale_contamination():
    from bigsnpr_tpu.pca.robust import tau_scale_location

    rng = np.random.default_rng(7)
    x = rng.standard_normal(50000) * 2.0
    x[:10000] = 200.0 + rng.standard_normal(10000)  # 20% far outliers
    mu, sig = tau_scale_location(x)
    assert abs(mu) < 0.5 and sig < 3.5, (mu, sig)
    assert np.std(x) > 50  # classical scale destroyed


def test_tukey_mc_up_symmetric_formula():
    """Symmetric data: mc ~ 0 so the fence reduces to Q3 + coef*IQR with
    the alpha-calibrated coef (checks the calibration formula)."""
    from scipy import stats as ss

    rng = np.random.default_rng(11)
    x = rng.standard_normal(100001)
    thr = tukey_mc_up(x, alpha=0.05)
    q1, q3 = np.quantile(x, [0.25, 0.75])
    n = len(x)
    coef = (ss.norm.isf(0.05 / (2 * n)) - ss.norm.ppf(0.75)) / (
        2 * ss.norm.ppf(0.75))
    expect = q3 + coef * (q3 - q1)
    np.testing.assert_allclose(thr, expect, rtol=0.03)
