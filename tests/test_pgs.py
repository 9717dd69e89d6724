"""PGS stack: LDSC, LDpred2 (inf/grid/auto), lassosum2 — end-to-end on
simulated data, with exactness oracles where the reference is deterministic
and statistical assertions where it uses MC sampling (the reference's own
test style, tests/testthat/test-8-LDpred2.R:49-97)."""

import numpy as np
import pytest

from bigsnpr_tpu import snp_fake
from bigsnpr_tpu.ops.corr import snp_cor
from bigsnpr_tpu.assoc.gwas import big_univLinReg
from bigsnpr_tpu.assoc.simu import snp_simuPheno
from bigsnpr_tpu.pgs.ldsc import snp_ldsc, snp_ldsc2, coef_to_liab, _wlm, _wlm_no_int
from bigsnpr_tpu.pgs.ldpred2 import (
    snp_ldpred2_inf, snp_ldpred2_grid, snp_ldpred2_auto, _df_beta_arrays,
)
from bigsnpr_tpu.pgs.lassosum2 import snp_lassosum2, seq_log


# --------------------------------------------------------------------------
# pipeline fixture: correlated genotypes, simulated trait, GWAS sumstats
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pipeline():
    rng = np.random.default_rng(42)
    n, m = 2000, 300
    # LD-structured genotypes via autoregressive haplotype copying
    p = rng.uniform(0.1, 0.5, m)
    hap = np.empty((2 * n, m), dtype=np.int8)
    hap[:, 0] = rng.random(2 * n) < p[0]
    for j in range(1, m):
        copy = rng.random(2 * n) < 0.8
        hap[:, j] = np.where(copy, hap[:, j - 1], rng.random(2 * n) < p[j])
    X = (hap[:n] + hap[n:]).astype(float)

    from bigsnpr_tpu.core import unpack
    from bigsnpr_tpu.core.genotypes import GenoPack

    pack = GenoPack(packed=unpack.np_pack_codes(
        unpack.np_dosage_to_codes(X.T)), n=n)

    simu = snp_simuPheno(pack, h2=0.5, M=30, seed=7)
    y = simu["pheno"]
    gwas = big_univLinReg(pack, y)
    df_beta = {
        "beta": gwas["estim"].to_numpy(),
        "beta_se": gwas["std.err"].to_numpy(),
        "n_eff": np.full(m, n, dtype=float),
    }
    corr = snp_cor(pack, size=50, fill_diag=True)
    return dict(pack=pack, X=X, y=y, simu=simu, df_beta=df_beta, corr=corr)


def test_wlm_matches_lstsq():
    rng = np.random.default_rng(0)
    x, y, w = rng.normal(size=50), rng.normal(size=50), rng.uniform(0.5, 2, 50)
    a, b, _ = _wlm(x, y, w)
    A = np.column_stack([np.ones(50), x]) * np.sqrt(w)[:, None]
    coef, *_ = np.linalg.lstsq(A, y * np.sqrt(w), rcond=None)
    np.testing.assert_allclose([a, b], coef, rtol=1e-10)
    b2, _ = _wlm_no_int(x, y, w)
    coef2, *_ = np.linalg.lstsq((x * np.sqrt(w))[:, None], y * np.sqrt(w),
                                rcond=None)
    np.testing.assert_allclose(b2, coef2[0], rtol=1e-10)


def test_ldsc_recovers_h2():
    """Simulate the LDSC model: E[chi2] = 1 + N h2 l_j / M."""
    rng = np.random.default_rng(1)
    M, N, h2 = 50000, 10000, 0.4
    ld = rng.uniform(1, 50, M)
    ncp = N * h2 * ld / M
    chi2 = (rng.standard_normal(M) + np.sqrt(ncp)) ** 2
    res = snp_ldsc(ld, M, chi2, N, blocks=None, intercept=None)
    assert abs(res["h2"] - h2) < 0.05
    assert abs(res["int"] - 1.0) < 0.1
    res_b = snp_ldsc(ld, M, chi2, N, blocks=50, intercept=None)
    assert abs(res_b["h2"] - res["h2"]) < 0.02
    assert 0 < res_b["h2_se"] < 0.1


def test_ldsc2_on_pipeline(pipeline):
    res = snp_ldsc2(pipeline["corr"], pipeline["df_beta"])
    assert 0.1 < res["h2"] < 1.2  # true 0.5, small-m estimate is noisy


def test_coef_to_liab():
    assert abs(coef_to_liab(0.5) - np.pi / 2) < 1e-10  # known value at K=0.5


def test_ldpred2_inf_exact(pipeline):
    """Deterministic oracle: the returned betas satisfy the linear system."""
    corr, df = pipeline["corr"], pipeline["df_beta"]
    h2 = 0.4
    beta_inf = snp_ldpred2_inf(corr, df, h2)
    beta_hat, N, scale = _df_beta_arrays(df)
    m = corr.shape[0]
    A = corr.to_dense() + np.diag(m / (h2 * N))
    np.testing.assert_allclose(A @ (beta_inf / scale), beta_hat,
                               rtol=1e-8, atol=1e-10)
    # predictive sanity
    pred = pipeline["X"] @ beta_inf
    assert np.corrcoef(pred, pipeline["y"])[0, 1] > 0.5


def test_ldpred2_grid(pipeline):
    corr, df, X, y = (pipeline["corr"], pipeline["df_beta"], pipeline["X"],
                      pipeline["y"])
    grid = {"p": [0.1, 0.1, 1.0], "h2": [0.5, 0.5, 0.5],
            "sparse": [False, True, False]}
    betas = snp_ldpred2_grid(corr, df, grid, burn_in=100, num_iter=200)
    assert betas.shape == (300, 3)
    assert np.isfinite(betas).all()
    for j in range(3):
        r = np.corrcoef(X @ betas[:, j], y)[0, 1]
        assert r > 0.5, f"grid col {j}: r={r}"
    # sparse model actually sparse
    assert np.mean(betas[:, 1] == 0) > 0.2
    assert np.mean(betas[:, 0] == 0) == 0.0


def test_ldpred2_grid_sampling_betas(pipeline):
    corr, df = pipeline["corr"], pipeline["df_beta"]
    grid = {"p": [0.2], "h2": [0.5], "sparse": [False]}
    samp = snp_ldpred2_grid(corr, df, grid, burn_in=50, num_iter=40,
                            return_sampling_betas=True)
    assert samp.shape == (300, 40)
    # mean of samples ~ grid average behavior: predictive
    pred = pipeline["X"] @ samp.mean(axis=1)
    assert np.corrcoef(pred, pipeline["y"])[0, 1] > 0.4


def test_ldpred2_auto(pipeline):
    corr, df, X, y = (pipeline["corr"], pipeline["df_beta"], pipeline["X"],
                      pipeline["y"])
    res = snp_ldpred2_auto(corr, df, h2_init=0.3, vec_p_init=[0.1, 0.5],
                           burn_in=200, num_iter=200, report_step=50)
    assert len(res) == 2
    for r in res:
        assert np.isfinite(r["beta_est"]).all()
        pred = X @ r["beta_est"]
        assert np.corrcoef(pred, y)[0, 1] > 0.5
        assert 0.05 < r["h2_est"] < 1.5
        assert 0 < r["p_est"] < 1
        # self-consistency: estimate == mean of path tail (reference
        # test-8-LDpred2.R:83-88)
        np.testing.assert_allclose(
            r["h2_est"], np.mean(r["path_h2_est"][-200:]), rtol=1e-6)
        assert r["sample_beta"].shape == (4, 300)
        assert -1.5 <= r["alpha_est"] <= 0.5


def test_ldpred2_ind_corr_subset(pipeline):
    """ind_corr masking == physical subsetting (reference
    test-8-LDpred2.R:228-308) — bitwise thanks to global-index RNG."""
    corr, df = pipeline["corr"], pipeline["df_beta"]
    ind = np.arange(0, 300, 2)
    df_sub = {k: np.asarray(v)[ind] for k, v in df.items()}
    out_masked = snp_ldpred2_grid(corr, df_sub,
                                  {"p": [0.3], "h2": [0.4], "sparse": [False]},
                                  burn_in=30, num_iter=30, ind_corr=ind)
    corr_sub = corr.subset(ind)
    out_phys = snp_ldpred2_grid(corr_sub, df_sub,
                                {"p": [0.3], "h2": [0.4], "sparse": [False]},
                                burn_in=30, num_iter=30)
    # same band width not guaranteed -> values equal to fp tolerance
    np.testing.assert_allclose(out_masked, out_phys, rtol=2e-4, atol=1e-8)


def test_lassosum2(pipeline):
    corr, df, X, y = (pipeline["corr"], pipeline["df_beta"], pipeline["X"],
                      pipeline["y"])
    betas, grid = snp_lassosum2(corr, df, maxiter=500)
    assert betas.shape == (300, 120)
    assert list(grid.columns) == ["lambda", "delta", "num_iter", "sparsity"]
    # small lambda (end of each delta block): dense, predictive
    best = np.nanargmax([np.corrcoef(X @ betas[:, j], y)[0, 1]
                         if np.isfinite(betas[:, j]).all() else -1
                         for j in range(betas.shape[1])])
    assert np.corrcoef(X @ betas[:, best], y)[0, 1] > 0.5
    # sparsity increases with lambda within a delta block
    s = grid["sparsity"].to_numpy()[:30]
    assert s[0] >= s[-1]


def test_seq_log():
    out = seq_log(1.0, 0.01, 3)
    np.testing.assert_allclose(out, [1.0, 0.1, 0.01], rtol=1e-12)


def test_mle_profile_matches_lbfgsb():
    """Profile MLE == scipy L-BFGS-B on the reference objective
    (reference test-8-LDpred2.R:173-224 analog)."""
    import jax.numpy as jnp
    from scipy.optimize import minimize
    from bigsnpr_tpu.pgs.gibbs import _mle_alpha_profile

    rng = np.random.default_rng(3)
    m = 500
    log_var = rng.normal(-8, 1.5, m)
    beta = rng.normal(0, np.exp(0.3 * log_var))
    wts = np.ones(m)
    par0 = np.array([0.0, np.mean(beta**2)])

    def obj(par):
        a, s = par
        c = beta**2 * np.exp(-a * log_var)
        return a * log_var.sum() + m * np.log(s) + c.sum() / s

    ref = minimize(obj, par0, method="L-BFGS-B",
                   bounds=[(-0.5, 1.5), (par0[1] / 2, par0[1] * 2)])
    a_got, s_got = _mle_alpha_profile(
        jnp.float32(par0[0]), jnp.float32(par0[1]), jnp.asarray(wts, jnp.float32),
        jnp.asarray(log_var, jnp.float32), jnp.asarray(beta**2, jnp.float32),
        (jnp.float32(-0.5), jnp.float32(1.5)))
    assert abs(float(a_got) - ref.x[0]) < 1e-2
    assert abs(float(s_got) - ref.x[1]) / ref.x[1] < 0.05


def test_auto_h2_path_consistent_with_sample_betas(pipeline):
    """path_h2_est at report iterations == beta' R beta of the reported
    sampling betas (reference test-8-LDpred2.R:105-106 analog; exact
    identity of the incremental cur_h2_est tracking when shrink_corr=1)."""
    corr, df = pipeline["corr"], pipeline["df_beta"]
    burn_in, num_iter, step = 100, 100, 20
    res = snp_ldpred2_auto(corr, df, h2_init=0.4, vec_p_init=[0.2],
                           burn_in=burn_in, num_iter=num_iter,
                           report_step=step, use_MLE=False)[0]
    R = corr.to_dense()
    n_rep = res["sample_beta"].shape[0]
    assert n_rep == num_iter // step
    for t in range(n_rep):
        k = burn_in + (t + 1) * step - 1
        s = res["sample_beta"][t]
        h2_direct = s @ R @ s
        np.testing.assert_allclose(res["path_h2_est"][k], h2_direct,
                                   rtol=5e-3, atol=1e-4)


def test_f64_sampler_option():
    """dtype="float64" (scoped x64): samplers run in double like the
    reference's C++ accumulation; results agree with f32 at MC level and
    lassosum2 (deterministic) agrees tightly."""
    pack = snp_fake(400, 120, seed=5)
    sim = snp_simuPheno(pack, h2=0.5, M=20, seed=3)
    gwas = big_univLinReg(pack, sim["pheno"])
    df_beta = {"beta": gwas["estim"].to_numpy(),
               "beta_se": gwas["std.err"].to_numpy(),
               "n_eff": np.full(pack.m, 400.0)}
    corr = snp_cor(pack, size=30)

    grid = {"p": [0.2], "h2": [0.5], "sparse": [False]}
    b32 = snp_ldpred2_grid(corr, df_beta, grid, burn_in=30, num_iter=60,
                           seed=7)
    b64 = snp_ldpred2_grid(corr, df_beta, grid, burn_in=30, num_iter=60,
                           seed=7, dtype="float64")
    assert np.isfinite(b64).all()
    r = np.corrcoef(b32.ravel(), b64.ravel())[0, 1]
    assert r > 0.95

    auto64 = snp_ldpred2_auto(corr, df_beta, h2_init=0.5, vec_p_init=0.2,
                              burn_in=40, num_iter=60, dtype="float64")[0]
    assert np.isfinite(auto64["beta_est"]).all()
    assert 0.0 < auto64["h2_est"] < 2.0

    from bigsnpr_tpu.pgs.lassosum2 import snp_lassosum2 as las
    g32, _ = las(corr, df_beta, delta=(0.1,), nlambda=5)
    g64, _ = las(corr, df_beta, delta=(0.1,), nlambda=5, dtype="float64")
    np.testing.assert_allclose(g32, g64, rtol=2e-3, atol=2e-5)

    import jax.numpy as jnp
    assert jnp.asarray(1.0).dtype == jnp.float32  # session default intact
