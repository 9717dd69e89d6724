"""Plot smoke tests + penalized-regression recovery checks."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake
from bigsnpr_tpu.assoc.mhtest import MHTest, snp_qq, snp_manhattan, chisq_log10_predictor
from bigsnpr_tpu.linalg.penalized import big_spLinReg, big_spLogReg


def test_qq_manhattan_axes():
    rng = np.random.default_rng(0)
    m = 500
    gwas = MHTest(score=rng.chisquare(1, m), predict=chisq_log10_predictor(1))
    ax = snp_qq(gwas)
    assert ax.get_title().startswith("Q-Q")
    chrs = np.repeat([1, 2, 3, 4, 5], m // 5)
    pos = np.tile(np.arange(m // 5) * 1e4, 5)
    ax2 = snp_manhattan(gwas, chrs, pos, ind_highlight=[3, 7],
                        npoints=300)
    assert len(ax2.collections) == 1
    import matplotlib.pyplot as plt

    plt.close("all")


def test_sp_linreg_recovers_sparse_signal():
    rng = np.random.default_rng(1)
    n, p = 400, 120
    X = rng.standard_normal((n, p))
    beta_true = np.zeros(p)
    beta_true[:6] = [2, -1.5, 1, 1, -2, 0.8]
    y = X @ beta_true + rng.standard_normal(n)
    mod = big_spLinReg(X, y, alphas=(1.0,), K=5, nlambda=80)
    assert mod.family == "gaussian"
    # signal recovered, noise mostly zeroed
    assert np.corrcoef(mod.beta, beta_true)[0, 1] > 0.95
    assert np.abs(mod.beta[6:]).max() < 0.5
    pred = mod.predict(X)
    assert np.corrcoef(pred, y)[0, 1] > 0.85


def test_sp_logreg_recovers_signal():
    rng = np.random.default_rng(2)
    n, p = 600, 60
    X = rng.standard_normal((n, p))
    eta = 1.5 * X[:, 0] - 1.0 * X[:, 1] + 0.5
    y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    mod = big_spLogReg(X, y, alphas=(1.0, 0.01), K=4, nlambda=60)
    assert mod.family == "binomial"
    assert mod.beta[0] > 0.3 and mod.beta[1] < -0.2
    auc_pred = mod.predict(X)
    # crude AUC check
    from scipy import stats

    assert stats.mannwhitneyu(auc_pred[y == 1], auc_pred[y == 0])[0] / (
        (y == 1).sum() * (y == 0).sum()) > 0.75


def test_cd_gram_path_matches_residual_path():
    """Covariance-mode (Gram) CD == residual-mode CD on the same fold
    (glmnet covariance updating; used by stacking at biobank n)."""
    from bigsnpr_tpu import native

    if native.get_lib() is None or not hasattr(
            native.get_lib(), "cd_gaussian_gram_path"):
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    n, p = 1200, 50
    X = np.cumsum(rng.standard_normal((n, p)), axis=1)  # collinear cols
    X = (X - X.mean(0)) / X.std(0)
    beta_true = np.zeros(p)
    beta_true[::9] = rng.normal(size=len(beta_true[::9]))
    y = X @ beta_true + rng.standard_normal(n)
    ntr = 900
    Xtr, Xva, ytr, yva = X[:ntr], X[ntr:], y[:ntr], y[ntr:]
    nv = n - ntr
    lam_max = np.max(np.abs(Xtr.T @ (ytr - ytr.mean()))) / ntr
    lambdas = np.exp(np.linspace(np.log(lam_max), np.log(lam_max * 1e-4),
                                 25))
    for alpha in (1.0, 0.01):
        res = native.cd_path(Xtr, ytr, lambdas, alpha, Xva, yva,
                             10, 1e-7, 200)
        gram = native.cd_gram_path(
            Xtr.T @ Xtr / ntr, Xtr.T @ ytr / ntr, Xtr.mean(0), ytr.mean(),
            lambdas, alpha, Xva.T @ Xva / nv, Xva.T @ yva / nv,
            Xva.mean(0), yva.mean(), float(yva @ yva) / nv, 10, 1e-7, 200)
        assert res[3] == gram[3]  # same selected lambda
        np.testing.assert_allclose(gram[1], res[1], atol=1e-9)
        assert abs(res[0] - gram[0]) < 1e-9
        assert abs(res[2] - gram[2]) < 1e-12
